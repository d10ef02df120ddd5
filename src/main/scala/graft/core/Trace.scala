package graft.core

import scala.collection.mutable.ListBuffer

/** Snapshot of one traced run: its result plus everything the pipeline
  * logged while executing. Logs/errors are in chronological order.
  *
  * Behavior parity with the reference `Trace` (`etl4s/src-2/Etl4s.scala:1154-1188`).
  */
final case class Trace[A](
    result: A,
    logs: List[Any] = Nil,
    timeElapsedMillis: Long = 0L,
    errors: List[Any] = Nil,
    telemetry: TelemetryData = TelemetryData()
) {
  def hasErrors: Boolean = errors.nonEmpty
  def seconds: Double = timeElapsedMillis / 1000.0
  def logsAsStrings: List[String] = logs.map(_.toString)
  def errorsAsStrings: List[String] = errors.map(_.toString)
  def spans: List[TelSpan] = telemetry.spans
  def counterTotals: Map[String, Long] = telemetry.counterTotals
  def latestGauges: Map[String, Double] = telemetry.latestGauges
  def histogramValues: Map[String, List[Double]] = telemetry.histogramValues
  def toOtelJson: String = OtlpJson.render(telemetry)
}

/** The per-run, per-thread trace collector. Any node in a running pipeline
  * may call `Trace.log` / `Trace.error`, and downstream nodes can react via
  * `Trace.hasErrors` / `Trace.current` — this is the cross-node channel the
  * reference documents (`docs/trace.md:33-48`).
  *
  * The collector lives in a ThreadLocal: it is NOT propagated into `&>`
  * futures (matching reference behavior) nor to Spark executors — data-plane
  * metrics belong in accumulators / `df.observe`, not here.
  */
object Trace {

  /** Mutable per-run state; cheap appends, snapshot on read. */
  private[core] final class Collector(val startTime: Long) {
    val traceId: String = Ids.random()
    val logs = ListBuffer.empty[Any]
    val errors = ListBuffer.empty[Any]
    val spans = ListBuffer.empty[TelSpan]
    val counters = ListBuffer.empty[TelCounter]
    val gauges = ListBuffer.empty[TelGauge]
    val histograms = ListBuffer.empty[TelHistogram]
    // events for spans still open, tagged with the spanId they fired under;
    // withSpan drains its own tag when the span closes
    val pendingEvents = ListBuffer.empty[(String, TelSpanEvent)]
    var currentSpanId: Option[String] = None

    def telemetry: TelemetryData =
      TelemetryData(spans.toList, counters.toList, gauges.toList, histograms.toList)
  }

  private val active = new ThreadLocal[Option[Collector]] {
    override def initialValue(): Option[Collector] = None
  }

  /** Runs `block` with a fresh collector installed, restoring any enclosing
    * collector afterwards (nested runs stay isolated).
    */
  private[core] def scoped[T](block: Collector => T): T = {
    val outer = active.get()
    val c = new Collector(System.currentTimeMillis())
    active.set(Some(c))
    try block(c)
    finally active.set(outer)
  }

  private[core] def collector: Option[Collector] = active.get()

  /** Live view of the in-flight run (empty Trace when none is active). */
  def current: Trace[Any] = active.get() match {
    case Some(c) =>
      Trace(
        result = (),
        logs = c.logs.toList,
        timeElapsedMillis = System.currentTimeMillis() - c.startTime,
        errors = c.errors.toList,
        telemetry = c.telemetry
      )
    case None => Trace(result = ())
  }

  /** Record a log value (any type) into the active run; no-op outside one. */
  def log[T](message: T): Unit = active.get().foreach(_.logs += message)

  /** Record an error value (any type) into the active run. */
  def error[T](err: T): Unit = active.get().foreach(_.errors += err)

  private[core] def recordSpan(span: TelSpan): Unit =
    active.get().foreach(_.spans += span)
  private[core] def recordEvent(event: TelSpanEvent): Unit =
    active.get().foreach { c =>
      c.currentSpanId.foreach(sid => c.pendingEvents += sid -> event)
    }
  private[core] def drainEvents(spanId: String): List[TelSpanEvent] =
    active.get() match {
      case Some(c) =>
        val (mine, rest) = c.pendingEvents.toList.partition(_._1 == spanId)
        c.pendingEvents.clear()
        c.pendingEvents ++= rest
        mine.map(_._2)
      case None => Nil
    }
  private[core] def recordCounter(name: String, value: Long): Unit =
    active.get().foreach(_.counters += TelCounter(name, value, System.nanoTime()))
  private[core] def recordGauge(name: String, value: Double): Unit =
    active.get().foreach(_.gauges += TelGauge(name, value, System.nanoTime()))
  private[core] def recordHistogram(name: String, value: Double): Unit =
    active.get().foreach(_.histograms += TelHistogram(name, value, System.nanoTime()))
  private[core] def getCurrentSpanId: Option[String] =
    active.get().flatMap(_.currentSpanId)
  private[core] def setCurrentSpanId(id: Option[String]): Unit =
    active.get().foreach(_.currentSpanId = id)
  private[core] def getTraceId: Option[String] = active.get().map(_.traceId)

  // Convenience accessors (reference parity, `etl4s/src-2/Etl4s.scala:1375-1411`)
  def getCurrent: Trace[Any] = current
  def getLogs: List[Any] = current.logs
  def getErrors: List[Any] = current.errors
  def getElapsedTimeMillis: Long = current.timeElapsedMillis
  def getElapsedTimeSeconds: Double = current.seconds
  def getLogsAsStrings: List[String] = current.logsAsStrings
  def getErrorsAsStrings: List[String] = current.errorsAsStrings
  def hasErrors: Boolean = current.hasErrors
  def hasLogs: Boolean = current.logs.nonEmpty
  def getLogCount: Int = current.logs.size
  def getErrorCount: Int = current.errors.size
  def getLastLog: Option[Any] = current.logs.lastOption
  def getLastError: Option[Any] = current.errors.lastOption
}

/** Span/metric recording front-end. Always records into the active Trace;
  * additionally forwards to a [[GraftTelemetry]] provider when one is
  * installed (via the implicit on `unsafeRun*`). Zero overhead when no
  * provider is set and no run is active.
  */
object Tel {
  private val provider = new ThreadLocal[Option[GraftTelemetry]] {
    override def initialValue(): Option[GraftTelemetry] = None
  }

  private[core] def setProvider(p: GraftTelemetry): Unit = provider.set(Some(p))
  private[core] def clearProvider(): Unit = provider.set(None)

  /** Run `block` inside a named span; nesting produces parent/child links. */
  def withSpan[T](name: String, attributes: (String, Any)*)(block: => T): T = {
    val spanId = Ids.random()
    val traceId = Trace.getTraceId.getOrElse(Ids.random() + Ids.random())
    val parent = Trace.getCurrentSpanId
    val t0 = System.nanoTime()
    Trace.setCurrentSpanId(Some(spanId))
    var status = "ok"
    try {
      provider.get() match {
        case Some(p) => p.withSpan(name, attributes: _*)(block)
        case None => block
      }
    } catch {
      case t: Throwable => status = "error"; throw t
    } finally {
      val t1 = System.nanoTime()
      Trace.recordSpan(
        TelSpan(name, traceId, spanId, parent, t0, t1, t1 - t0, attributes.toMap, status,
          Trace.drainEvents(spanId))
      )
      Trace.setCurrentSpanId(parent)
    }
  }

  /** Record a point-in-time event on the innermost open span (reference
    * parity: `etl4s/src-2/Etl4s.scala:1831`). Attaches to that span's OTLP
    * `events` when it closes; no-op on the trace outside a span (still
    * forwarded to the provider either way).
    */
  def addEvent(name: String, attributes: (String, Any)*): Unit = {
    Trace.recordEvent(TelSpanEvent(name, attributes.toMap, System.nanoTime()))
    provider.get().foreach(_.addEvent(name, attributes: _*))
  }

  def addCounter(name: String, value: Long): Unit = {
    Trace.recordCounter(name, value)
    provider.get().foreach(_.addCounter(name, value))
  }

  def setGauge(name: String, value: Double): Unit = {
    Trace.recordGauge(name, value)
    provider.get().foreach(_.setGauge(name, value))
  }

  def recordHistogram(name: String, value: Double): Unit = {
    Trace.recordHistogram(name, value)
    provider.get().foreach(_.recordHistogram(name, value))
  }
}

private[core] object Ids {
  def random(): String =
    java.util.UUID.randomUUID().toString.replace("-", "").take(16)
}
