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
      }),
    // the tag-query language as a SQL predicate: the grammar compiles at
    // resolution time (query must be a literal) into the same Column
    // expression tree the DataFrame path uses — plain codegen'd
    // regex/map predicates, no UDF at runtime
    (FunctionIdentifier("graft_tag_match"),
      new ExpressionInfo(graft.tagquery.TagQueryParser.getClass.getName, "graft_tag_match"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_tag_match(tags, 'query') takes 2 arguments")
        val query = args(1) match {
          case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
          case other => throw new IllegalArgumentException(
            s"graft_tag_match: the query must be a string literal, got $other")
        }
        org.apache.spark.sql.GraftShims.expressionTree(
          graft.tagquery.TagQueryParser.compile(query,
            org.apache.spark.sql.GraftShims.column(args.head)))
      }))
}
