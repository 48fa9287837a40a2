package graft.plans

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expression: the 60-bit SimHash fingerprint of a text
 * column, in ONE projection pass.
 *
 * Semantics are bit-identical to the composed pipeline it replaces
 * (`Dedup.simHash`'s explode → md5 → 60 bit-vote aggregates → re-pack) and
 * to the DuckDB oracle: tokens are the single-space split of the
 * lowercased text (empties included), de-duplicated; each token hashes to
 * the top 15 hex chars of its md5 (< 2^60); fingerprint bit j is set when
 * the sum over tokens of ±1 votes (bit j of the hash) is positive.
 *
 * Why a custom expression: the composed form explodes every distinct
 * token into a row (|corpus| × avg-tokens rows through a shuffle) and
 * runs 60 separate sum aggregates per doc. Per-doc state is a fixed
 * 60-int vote array — a classic fold that needs no data movement at all.
 * This computes it where the row already is: no explode, no exchange,
 * and the banded pair join downstream is unchanged.
 */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  // input contract: string (call sites pass the raw text column)
  override protected def nullSafeEval(input: Any): Any =
    SimHash60.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.plans.SimHash60.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

object SimHash60 {

  val Bits = 60

  // MessageDigest is not thread-safe and getInstance is a registry lookup —
  // one instance per executor thread, reset per token
  private val Md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** Per-row kernel; called from generated code via the static forwarder. */
  def compute(text: UTF8String): Long = {
    val tokens = text.toLowerCase.toString.split(" ", -1)
    val seen = new java.util.HashSet[String](math.max(16, tokens.length * 2))
    val votes = new Array[Int](Bits)
    val md = Md5.get()
    var i = 0
    while (i < tokens.length) {
      val t = tokens(i)
      if (seen.add(t)) {
        md.reset()
        val d = md.digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        // top 15 hex chars = high 60 bits of the first 8 digest bytes
        // (hex char c of md5 string = nibble c of the digest, big-endian)
        var h = 0L
        var b = 0
        while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
        h = h >>> 4 // 64 digest bits → drop the lowest nibble → 15 hex chars
        var j = 0
        while (j < Bits) {
          votes(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < Bits) { if (votes(j) > 0) fp |= 1L << j; j += 1 }
    fp
  }

  /** Column API entry: `SimHash60(col("text"))`. */
  def apply(text: Column): Column =
    GraftShims.column(SimHash60(GraftShims.expression(text)))
}
