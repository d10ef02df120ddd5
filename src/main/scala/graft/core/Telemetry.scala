package graft.core

/** Pluggable telemetry backend. Behavior parity with the reference trait
  * (`etl4s/src/Telemetry.scala:18-34`): span wrapping plus three metric
  * kinds; the no-op instance must cost nothing on the hot path.
  */
trait GraftTelemetry {
  def withSpan[T](name: String, attributes: (String, Any)*)(block: => T): T
  def addCounter(name: String, value: Long): Unit
  def setGauge(name: String, value: Double): Unit
  def recordHistogram(name: String, value: Double): Unit

  /** Point-in-time event on the current span (reference parity:
    * `etl4s/src-2/Etl4s.scala:1831`). Concrete no-op default so existing
    * providers keep compiling.
    */
  def addEvent(name: String, attributes: (String, Any)*): Unit = ()
}

/** Default provider: everything is a no-op; `withSpan` just runs the block. */
object NoOpTelemetry extends GraftTelemetry {
  def withSpan[T](name: String, attributes: (String, Any)*)(block: => T): T = block
  def addCounter(name: String, value: Long): Unit = ()
  def setGauge(name: String, value: Double): Unit = ()
  def recordHistogram(name: String, value: Double): Unit = ()
}

/** Simple stderr-printing provider for local debugging. */
final case class ConsoleTelemetry(prefix: String = "[graft]") extends GraftTelemetry {
  def withSpan[T](name: String, attributes: (String, Any)*)(block: => T): T = {
    val t0 = System.currentTimeMillis()
    println(s"$prefix span start: $name ${attributes.toMap}")
    try {
      val out = block
      println(s"$prefix span end: $name (${System.currentTimeMillis() - t0} ms)")
      out
    } catch {
      case t: Throwable =>
        println(s"$prefix span failed: $name (${System.currentTimeMillis() - t0} ms): ${t.getMessage}")
        throw t
    }
  }
  def addCounter(name: String, value: Long): Unit = println(s"$prefix counter $name += $value")
  def setGauge(name: String, value: Double): Unit = println(s"$prefix gauge $name = $value")
  def recordHistogram(name: String, value: Double): Unit = println(s"$prefix histogram $name << $value")
  override def addEvent(name: String, attributes: (String, Any)*): Unit =
    println(s"$prefix event $name ${attributes.toMap}")
}

/** Thrown by `ensure` when one or more validation checks fail. */
final class ValidationException(message: String) extends RuntimeException(message)

/** A point-in-time event recorded on a span via `Tel.addEvent`. */
final case class TelSpanEvent(
    name: String,
    attributes: Map[String, Any],
    timestampNanos: Long
)

/** A completed span (OTLP-style identifiers). */
final case class TelSpan(
    name: String,
    traceId: String,
    spanId: String,
    parentSpanId: Option[String],
    startTimeNanos: Long,
    endTimeNanos: Long,
    durationNanos: Long,
    attributes: Map[String, Any] = Map.empty,
    status: String = "ok",
    events: List[TelSpanEvent] = Nil
)

final case class TelCounter(name: String, value: Long, timestampNanos: Long)
final case class TelGauge(name: String, value: Double, timestampNanos: Long)
final case class TelHistogram(name: String, value: Double, timestampNanos: Long)

/** Aggregated telemetry captured during one traced run. Collections are in
  * chronological (recording) order.
  */
final case class TelemetryData(
    spans: List[TelSpan] = Nil,
    counters: List[TelCounter] = Nil,
    gauges: List[TelGauge] = Nil,
    histograms: List[TelHistogram] = Nil
) {

  /** Sum of all values recorded per counter name. */
  def counterTotals: Map[String, Long] =
    counters.groupBy(_.name).map { case (n, cs) => n -> cs.map(_.value).sum }

  /** Most recently recorded value per gauge name. */
  def latestGauges: Map[String, Double] =
    gauges.groupBy(_.name).map { case (n, gs) => n -> gs.last.value }

  /** All recorded values per histogram name, in recording order. */
  def histogramValues: Map[String, List[Double]] =
    histograms.groupBy(_.name).map { case (n, hs) => n -> hs.map(_.value) }

  def isEmpty: Boolean =
    spans.isEmpty && counters.isEmpty && gauges.isEmpty && histograms.isEmpty
}

/** OTLP-shaped JSON export of a [[TelemetryData]]. */
private[core] object OtlpJson {
  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private def jstr(s: String): String = "\"" + esc(s) + "\""

  private def anyValue(v: Any): String = v match {
    case n: Int => s"""{"intValue":"$n"}"""
    case n: Long => s"""{"intValue":"$n"}"""
    case d: Double => s"""{"doubleValue":$d}"""
    case b: Boolean => s"""{"boolValue":$b}"""
    case other => s"""{"stringValue":${jstr(String.valueOf(other))}}"""
  }

  private def attrs(m: Map[String, Any]): String =
    m.map { case (k, v) => s"""{"key":${jstr(k)},"value":${anyValue(v)}}""" }
      .mkString("[", ",", "]")

  private def eventJson(e: TelSpanEvent): String =
    s"""{"timeUnixNano":"${e.timestampNanos}","name":${jstr(e.name)},""" +
      s""""attributes":${attrs(e.attributes)}}"""

  private def spanJson(s: TelSpan): String = {
    val parent = s.parentSpanId.map(p => s""","parentSpanId":${jstr(p)}""").getOrElse("")
    val events =
      if (s.events.isEmpty) ""
      else s""","events":${s.events.map(eventJson).mkString("[", ",", "]")}"""
    s"""{"traceId":${jstr(s.traceId)},"spanId":${jstr(s.spanId)}$parent,""" +
      s""""name":${jstr(s.name)},"startTimeUnixNano":"${s.startTimeNanos}",""" +
      s""""endTimeUnixNano":"${s.endTimeNanos}","attributes":${attrs(s.attributes)},""" +
      s""""status":{"code":${jstr(if (s.status == "ok") "STATUS_CODE_OK" else "STATUS_CODE_ERROR")}}$events}"""
  }

  private def counterJson(name: String, total: Long): String =
    s"""{"name":${jstr(name)},"sum":{"dataPoints":[{"asInt":"$total"}],"isMonotonic":true,"aggregationTemporality":2}}"""

  private def gaugeJson(name: String, value: Double): String =
    s"""{"name":${jstr(name)},"gauge":{"dataPoints":[{"asDouble":$value}]}}"""

  private def histogramJson(name: String, values: List[Double]): String =
    s"""{"name":${jstr(name)},"histogram":{"dataPoints":[{"count":"${values.size}","sum":${values.sum}}],"aggregationTemporality":2}}"""

  def render(t: TelemetryData): String = {
    val spans = t.spans.map(spanJson).mkString("[", ",", "]")
    val metrics =
      (t.counterTotals.map((counterJson _).tupled) ++
        t.latestGauges.map((gaugeJson _).tupled) ++
        t.histogramValues.map((histogramJson _).tupled)).mkString("[", ",", "]")
    s"""{"resourceSpans":[{"scopeSpans":[{"scope":{"name":"graft"},"spans":$spans}]}],""" +
      s""""resourceMetrics":[{"scopeMetrics":[{"scope":{"name":"graft"},"metrics":$metrics}]}]}"""
  }
}
