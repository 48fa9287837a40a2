package graft.plans

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/**
 * Native dot product of two `array<double>` or `array<float>` columns.
 *
 * Why a custom expression: the composable forms — `aggregate(zip_with(…))`
 * (interpreted higher-order functions) or 64 unrolled
 * `element_at(a,i)*element_at(b,i)` nodes (64 codegen'd GetArrayItem
 * expressions with per-element bounds checks) — both pay per-element
 * expression overhead in the pairwise-scan hot path (|corpus|² pairs for
 * near-dup detection). This emits ONE tight loop over both ArrayData
 * buffers inside whole-stage codegen.
 *
 * Float inputs are read directly from the parquet-at-rest representation
 * and widened per element ((double)getFloat(i) ≡ CAST(x AS DOUBLE)) — no
 * per-row array materialization to pre-cast, which is what an interpreted
 * `transform(_.cast("double"))` would cost in front of every pair.
 *
 * Summation is strictly left-to-right, bit-identical to the `aggregate`
 * fold and to a sequential SQL `list_sum`/`list_dot_product` — the oracle
 * determinism contract holds.
 */
case class VectorDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_dot"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (fx, fy) = (isFloat(left), isFloat(right))
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (fx) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (fy) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      def get(arr: String, e: Expression) =
        if (isFloat(e)) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${get(a, left)} * ${get(b, right)};
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
