package graft.model

/**
 * Metric type codes, matching the reference engine's fixed enumeration
 * (reference: core/metrics-model/src/main/java/org/hawkular/metrics/model/MetricType.java:33-41).
 *
 * `COUNTER_RATE` and `GAUGE_RATE` are virtual: they are never stored, only
 * derived on read (MetricType.java:36,38 `userType=false`).
 */
sealed abstract class MetricType(val code: Byte, val text: String, val isUserType: Boolean) {
  override def toString: String = text
}

object MetricType {
  case object Gauge        extends MetricType(0, "gauge", true)
  case object Availability extends MetricType(1, "availability", true)
  case object Counter      extends MetricType(2, "counter", true)
  case object CounterRate  extends MetricType(3, "counter_rate", false)
  case object Str          extends MetricType(4, "string", true)
  case object GaugeRate    extends MetricType(5, "gauge_rate", false)

  val all: Seq[MetricType] = Seq(Gauge, Availability, Counter, CounterRate, Str, GaugeRate)
  val userTypes: Seq[MetricType] = all.filter(_.isUserType)
  val userTypeCodes: Seq[Byte] = userTypes.map(_.code)

  def fromCode(code: Byte): MetricType =
    all.find(_.code == code).getOrElse(throw new IllegalArgumentException(s"unknown metric type code $code"))

  def fromText(text: String): MetricType =
    // message text is wire-visible through the 400 errorMsg body —
    // CassandraBackendITest.findMetricsShouldFailProperly asserts it
    all.find(_.text == text).getOrElse(
      throw new IllegalArgumentException(s"$text is not a recognized metric type"))
}

/**
 * Availability states with the reference's byte codes
 * (reference: core/metrics-model/.../AvailabilityType.java:26-34; text/byte codecs :58-90).
 */
sealed abstract class AvailabilityType(val code: Byte, val text: String) {
  override def toString: String = text
}

object AvailabilityType {
  case object Up      extends AvailabilityType(0, "up")
  case object Down    extends AvailabilityType(1, "down")
  case object Unknown extends AvailabilityType(2, "unknown")
  case object Admin   extends AvailabilityType(3, "admin")

  val all: Seq[AvailabilityType] = Seq(Up, Down, Unknown, Admin)

  def fromCode(code: Byte): AvailabilityType =
    all.find(_.code == code).getOrElse(throw new IllegalArgumentException(s"unknown availability code $code"))

  def fromText(text: String): AvailabilityType =
    all.find(_.text.equalsIgnoreCase(text))
      .getOrElse(throw new IllegalArgumentException(s"unknown availability '$text'"))
}
