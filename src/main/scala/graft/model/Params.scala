package graft.model

import scala.concurrent.duration.{MILLISECONDS, TimeUnit}

/**
 * Query-parameter surface, matching the reference's request-param model.
 */

/** Duration grammar `<digits><ms|s|mn|h|d>`
  * (reference core/metrics-model/.../param/Duration.java:41-55). */
final case class GDuration(value: Long, unit: TimeUnit) {
  def toMillis: Long = unit.toMillis(value)
}

object GDuration {
  import scala.concurrent.duration.{SECONDS, MINUTES, HOURS, DAYS}
  private val Pattern = """(\d+)(ms|s|mn|h|d)""".r

  def parse(text: String): GDuration = text match {
    case Pattern(num, u) =>
      val unit = u match {
        case "ms" => MILLISECONDS
        case "s"  => SECONDS
        case "mn" => MINUTES
        case "h"  => HOURS
        case "d"  => DAYS
      }
      GDuration(num.toLong, unit)
    case _ => throw new IllegalArgumentException(s"Invalid duration '$text'")
  }
}

/**
 * Time range with the reference's defaulting and relative-offset rules
 * (reference core/metrics-model/.../param/TimeRange.java:31-73):
 * start defaults to now-8h, end to now; `"+<dur>"`/`"-<dur>"` are offsets
 * from now; end is exclusive and must be greater than start.
 */
final case class TimeRange(start: Long, end: Long) {
  require(end > start, s"Range end ($end) must be strictly greater than start ($start)")
}

object TimeRange {
  val EightHours: Long = 8L * 60 * 60 * 1000

  def apply(start: Option[String], end: Option[String], now: Long): TimeRange = {
    val s = start.map(resolve(_, now)).getOrElse(now - EightHours)
    val e = end.map(resolve(_, now)).getOrElse(now)
    TimeRange(s, e)
  }

  private def resolve(text: String, now: Long): Long =
    if (text.startsWith("+")) now + GDuration.parse(text.drop(1)).toMillis
    else if (text.startsWith("-")) now - GDuration.parse(text.drop(1)).toMillis
    else text.toLong
}

/** Exactly one of bucket count or bucket duration
  * (reference core/metrics-model/.../param/BucketConfig.java:37-72). */
final case class BucketConfig(range: TimeRange, bucketCount: Option[Int], bucketDuration: Option[GDuration]) {
  require(bucketCount.isDefined ^ bucketDuration.isDefined,
    "Exactly one of 'buckets' or 'bucketDuration' must be set")

  def buckets: Buckets = bucketCount match {
    case Some(n) => Buckets.fromCount(range.start, range.end, n)
    case None    => Buckets.fromStep(range.start, range.end, bucketDuration.get.toMillis)
  }
}

/** ASC|DESC with the reference's defaulting rule: DESC unless
  * (limit set ∧ start set ∧ end unset) (reference Order.java:30-74, :68-71). */
sealed abstract class Order(val text: String)
object Order {
  case object Asc  extends Order("ASC")
  case object Desc extends Order("DESC")

  def fromText(t: String): Order = t.toUpperCase match {
    case "ASC"  => Asc
    case "DESC" => Desc
    case other  => throw new IllegalArgumentException(s"Invalid order '$other'")
  }

  def defaultValue(limit: Int, start: Option[_], end: Option[_]): Order =
    if (limit > 0 && start.isDefined && end.isEmpty) Asc else Desc
}

/** `name:value,name:value` tag-map grammar
  * (reference core/metrics-model/.../param/Tags.java:31-48). The VALUE
  * part URL-decodes AFTER the comma/colon split (TagsConverter.java:
  * 76-79) — that second decode is what lets a value carry a literal
  * ',' or ':' as %2C / %3A on the wire (TagsITest
  * findWithEncodedTagsValues), and a value ending at the colon is
  * invalid (hasExpectedForm: colonIndex < token.length()). */
object Tags {
  def parse(text: String): Map[String, String] = {
    require(text != null && text.trim.nonEmpty, "empty tags")
    text.split(",").iterator.map { kv =>
      val parts = kv.split(":", 2)
      require(parts.length == 2 && parts(0).trim.nonEmpty && parts(1).nonEmpty,
        s"Invalid tags '$text'")
      parts(0).trim -> java.net.URLDecoder.decode(parts(1).trim,
        java.nio.charset.StandardCharsets.UTF_8)
    }.toMap
  }
}

/** Comma-separated `name(:value)` list of tag NAMES — the DELETE
  * /{id}/tags/{tags} grammar (reference TagNamesConverter.java:38-57,
  * TagNames.java:36-40): empty tokens, blank names, and tokens with
  * more than one colon are invalid; a supplied `:value` part is parsed
  * and DISCARDED (only names are kept). */
object TagNames {
  def parse(text: String): Set[String] = {
    require(text != null, "names is null")
    text.split(",", -1).iterator.map { token =>
      require(token.trim.nonEmpty, s"Invalid tag list: $text")
      val parts = token.split(":", -1)
      require(parts.length <= 2, s"Invalid tag list: $text")
      require(parts(0).trim.nonEmpty, s"Invalid tag list: $text")
      parts(0)
    }.toSet
  }
}

/** One requested quantile, preserving the USER'S original string form —
  * the reference echoes it back verbatim in results (a request for
  * "99.000" answers as 99.000, not 99.0; Percentile.java:22-38). */
final case class Percentile(original: String) {
  val quantile: Double = {
    val q =
      try original.toDouble
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(s"Invalid percentile '$original'") }
    // the reference's Percentile.java does no bound check and hands the
    // value to commons-math PSquarePercentile, which accepts (0, 100] —
    // so "100" is a request the reference serves; reject only what it
    // would also reject
    require(q > 0 && q <= 100, s"Percentile '$original' must be in (0, 100]")
    q
  }
  /** Result column named from the ORIGINAL text, not the parsed double. */
  def columnName: String = "p" + original.replace('.', '_')
}

/** Requested quantiles; original string form is preserved in results
  * (reference param/Percentiles.java, Percentile.java:22-38). */
final case class Percentiles(values: Seq[String]) {
  /** Routed through [[Percentile]] so both accessors enforce the SAME
    * bound — a raw `toDouble` here would accept strings the sibling
    * path rejects. */
  def quantiles: Seq[Double] = percentiles.map(_.quantile)
  def percentiles: Seq[Percentile] = values.map(Percentile(_))
}
