package graft.examples

import graft.core._

/** OpenTelemetry-SDK adapter example — parity with the reference's
  * telemetry guide (`/root/reference/docs/opentelemetry.md:96-110`), which
  * shows an `OpenTelemetryProvider` wrapping the SDK's tracer/meter pair.
  *
  * The adapter below targets the SDK's REAL call shapes —
  * `tracer.spanBuilder(name).startSpan()` / `span.end()`,
  * `meter.counterBuilder(name).build().add(v)`,
  * `meter.histogramBuilder(name).build().record(v)` — through the
  * minimal structural interfaces in [[OtelSdkShim]]. Against the actual
  * `io.opentelemetry.api` artifacts the adapter body is UNCHANGED: swap
  * the shim types for the SDK imports and construct it with
  * `GlobalOpenTelemetry.getTracer/getMeter`. This container has no OTel
  * jars (and the build adds no dependencies), so ExamplesSpec drives the
  * adapter against [[RecordingOtelSdk]], an in-memory shim implementation
  * that records every SDK call the adapter makes.
  */
object OtelQuickstart {

  /** Structural slice of `io.opentelemetry.api` the adapter needs: one
    * method-for-method subset of the SDK's tracer/meter surface.
    */
  object OtelSdkShim {
    trait Tracer { def spanBuilder(name: String): SpanBuilder }
    trait SpanBuilder {
      def setAttribute(key: String, value: String): SpanBuilder
      def startSpan(): Span
    }
    trait Span {
      def addEvent(name: String): Unit
      def recordException(t: Throwable): Unit
      def end(): Unit
    }
    trait Meter {
      def counterBuilder(name: String): CounterBuilder
      def gaugeBuilder(name: String): GaugeBuilder
      def histogramBuilder(name: String): HistogramBuilder
    }
    trait CounterBuilder { def build(): LongCounter }
    trait LongCounter { def add(value: Long): Unit }
    trait GaugeBuilder { def build(): DoubleGauge }
    trait DoubleGauge { def set(value: Double): Unit }
    trait HistogramBuilder { def build(): DoubleHistogram }
    trait DoubleHistogram { def record(value: Double): Unit }
  }
  import OtelSdkShim._

  /** The adapter — the reference guide's `OpenTelemetryProvider`, written
    * against the shim. With the real SDK on the classpath this class is
    * identical except for the two import lines.
    */
  final class OtelTelemetry(tracer: Tracer, meter: Meter) extends GraftTelemetry {
    // Current-span stack per thread — the shim equivalent of the real
    // SDK's Span.current()/makeCurrent() scope, so Tel.addEvent lands on
    // the enclosing span instead of vanishing.
    private val current = new ThreadLocal[List[Span]] {
      override def initialValue(): List[Span] = Nil
    }
    def withSpan[T](name: String, attributes: (String, Any)*)(block: => T): T = {
      val builder = attributes.foldLeft(tracer.spanBuilder(name)) {
        case (b, (k, v)) => b.setAttribute(k, String.valueOf(v))
      }
      val span = builder.startSpan()
      current.set(span :: current.get())
      try block
      catch { case t: Throwable => span.recordException(t); throw t }
      finally {
        current.set(current.get().tail)
        span.end()
      }
    }
    def addCounter(name: String, value: Long): Unit =
      meter.counterBuilder(name).build().add(value)
    def setGauge(name: String, value: Double): Unit =
      meter.gaugeBuilder(name).build().set(value)
    def recordHistogram(name: String, value: Double): Unit =
      meter.histogramBuilder(name).build().record(value)
    override def addEvent(name: String, attributes: (String, Any)*): Unit =
      current.get().headOption.foreach(_.addEvent(name))
  }

  /** In-memory shim SDK for the spec (and for running this example in a
    * container without OTel jars): records every call the adapter makes,
    * in order, so the test asserts the SDK-visible effect of a pipeline
    * run — spans opened/closed, counters added, gauges set.
    */
  final class RecordingOtelSdk extends Tracer with Meter {
    val calls = scala.collection.mutable.ArrayBuffer.empty[String]
    private def log(s: String): Unit = synchronized { calls += s }

    def spanBuilder(name: String): SpanBuilder = new SpanBuilder {
      private var attrs = List.empty[(String, String)]
      def setAttribute(key: String, value: String): SpanBuilder = {
        attrs = (key -> value) :: attrs; this
      }
      def startSpan(): Span = {
        log(s"span.start:$name${attrs.reverse.map { case (k, v) => s" $k=$v" }.mkString}")
        new Span {
          def addEvent(n: String): Unit = log(s"span.event:$name/$n")
          def recordException(t: Throwable): Unit =
            log(s"span.exception:$name/${t.getClass.getSimpleName}")
          def end(): Unit = log(s"span.end:$name")
        }
      }
    }
    def counterBuilder(name: String): CounterBuilder = () => (value: Long) =>
      log(s"counter:$name+=$value")
    def gaugeBuilder(name: String): GaugeBuilder = () => (value: Double) =>
      log(s"gauge:$name=$value")
    def histogramBuilder(name: String): HistogramBuilder = () => (value: Double) =>
      log(s"histogram:$name<<$value")
  }

  /** Env-based wiring (the guide's "Quick Setup" pattern): real backend
    * when `GRAFT_ENV=prod`, console in dev. Returns the provider plus the
    * recording SDK when the prod path is taken, so callers (the spec, a
    * main) can inspect what the SDK received.
    */
  def providerFor(env: String): (GraftTelemetry, Option[RecordingOtelSdk]) =
    if (env == "prod") {
      // Real deployment: GlobalOpenTelemetry.getTracer("graft") /
      // .getMeter("graft") here instead of the recording shim.
      val sdk = new RecordingOtelSdk
      (new OtelTelemetry(sdk, sdk), Some(sdk))
    } else (ConsoleTelemetry("[graft-dev]"), None)

  /** A small pipeline instrumented exactly like the reference guide's
    * `processUsers`: business counts, a quality gauge, all inside one
    * span — run with whichever provider [[providerFor]] selected.
    */
  def run(env: String): (Int, Option[RecordingOtelSdk]) = {
    val (tel, sdk) = providerFor(env)
    val process = Node[List[String], Int] { data =>
      Tel.withSpan("processing", "env" -> env) {
        Tel.addCounter("items", data.size)
        Tel.addEvent("validation.start")
        val valid = data.filter(_.nonEmpty)
        Tel.setGauge("data.quality.ratio",
          valid.size.toDouble / math.max(1, data.size))
        Tel.recordHistogram("item.length", valid.map(_.length).sum.toDouble)
        valid.map(_.length).sum
      }
    }
    val out = process.unsafeRun(List("spark", "", "graft"))(tel)
    (out, sdk)
  }

  def main(args: Array[String]): Unit = {
    val env = args.headOption.getOrElse(sys.env.getOrElse("GRAFT_ENV", "dev"))
    val (out, sdk) = run(env)
    println(s"result=$out")
    sdk.foreach(s => s.calls.foreach(c => println(s"otel> $c")))
  }
}
