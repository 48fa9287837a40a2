package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/**
 * `SparkSessionExtensions` hook exposing graft's native expressions to
 * SQL users:
 *
 * {{{
 *   spark.sql("SELECT word_shingles(split(lower(text), ' '), 3) FROM docs")
 *   spark.sql("SELECT vector_dot(a.e, b.e) FROM ...")
 * }}}
 *
 * Register with
 * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "word_shingles(words, k) takes 2 arguments")
        val k = args(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"word_shingles: k must be an integer literal, got $other")
        }
        WordShingles(args.head, k)
      }),
    (FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "vector_dot(a, b) takes 2 arguments")
        VectorDot(args.head, args(1))
      }),
    (FunctionIdentifier("simhash60"),
      new ExpressionInfo(classOf[SimHash60].getName, "simhash60"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "simhash60(text) takes 1 argument")
        SimHash60(args.head)
      }))
}
