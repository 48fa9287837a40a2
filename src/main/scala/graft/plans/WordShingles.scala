package graft.plans

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expression: k-word shingles of a word array.
 *
 * `word_shingles(words, k)` → array of `size(words) - k + 1` strings, each
 * the space-joined run of k consecutive words (empty array when the doc is
 * shorter than k).
 *
 * Why a custom expression: the composable formulation —
 * `transform(sequence(0, size-k), i -> concat_ws(' ', ws[i], …))` — is a
 * higher-order function, which Spark evaluates INTERPRETED (per-element
 * tree walks, ~20x slower cold and JIT-dependent). Shingling sits on the
 * hot path of every dedup/fingerprint pipeline over a 100 TB corpus, so it
 * gets `doGenCode`: a tight generated loop over the array, one
 * `UTF8String.concatWs` per shingle, fully inside whole-stage codegen.
 */
case class WordShingles(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, s"shingle size must be positive, got $k")

  // input contract: array<string> (all call sites build it via split())
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val m = if (n >= k) n - k + 1 else 0
    val out = new Array[Any](m)
    val sep = UTF8String.fromString(" ")
    val buf = new Array[UTF8String](k)
    var i = 0
    while (i < m) {
      var j = 0
      while (j < k) { buf(j) = arr.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(sep, buf: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sep = ctx.addReferenceObj("sep", UTF8String.fromString(" "), classOf[UTF8String].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val buf = ctx.freshName("buf")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      s"""
         |final int $n = $c.numElements();
         |final int $m = $n >= $k ? $n - $k + 1 : 0;
         |final Object[] $out = new Object[$m];
         |final org.apache.spark.unsafe.types.UTF8String[] $buf =
         |  new org.apache.spark.unsafe.types.UTF8String[$k];
         |for (int $i = 0; $i < $m; $i++) {
         |  for (int $j = 0; $j < $k; $j++) {
         |    $buf[$j] = $c.getUTF8String($i + $j);
         |  }
         |  $out[$i] = org.apache.spark.unsafe.types.UTF8String.concatWs($sep, $buf);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  /** Column API entry: `WordShingles(split(lower(text), " "), 3)`. */
  def apply(words: Column, k: Int): Column =
    GraftShims.column(WordShingles(GraftShims.expression(words), k))
}
