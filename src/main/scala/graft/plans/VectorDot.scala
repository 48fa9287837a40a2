package graft.plans

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/**
 * Native dot product of two `array<double>` columns.
 *
 * Why a custom expression: the composable forms — `aggregate(zip_with(…))`
 * (interpreted higher-order functions) or 64 unrolled
 * `element_at(a,i)*element_at(b,i)` nodes (64 codegen'd GetArrayItem
 * expressions with per-element bounds checks) — both pay per-element
 * expression overhead in the pairwise-scan hot path (|corpus|² pairs for
 * near-dup detection). This emits ONE tight loop over both ArrayData
 * buffers inside whole-stage codegen.
 *
 * Summation is strictly left-to-right, bit-identical to the `aggregate`
 * fold and to a sequential SQL `list_sum`/`list_dot_product` — the oracle
 * determinism contract holds.
 */
case class VectorDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

object VectorDot {
  /** Column API entry; inputs must be array<double>. */
  def apply(a: Column, b: Column): Column =
    GraftShims.column(VectorDot(GraftShims.expression(a), GraftShims.expression(b)))
}
