package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral port of reference Trace/Tel specs
  * (`/root/reference/etl4s/test/src/Etl4sSpec.scala:630-1148`, `:1490-1646`).
  */
class TraceTelSpec extends AnyFunSuite {

  test("Trace.log collects logs readable downstream") {
    val logger = Node[Int, Int] { n => Trace.log(s"got $n"); n * 2 }
    val reader = Node[Int, Int] { n =>
      assert(Trace.getLogs == List("got 5"))
      n
    }
    val trace = (logger ~> reader).unsafeRunTrace(5)
    assert(trace.result == 10)
    assert(trace.logs == List("got 5"))
  }

  test("Trace.error sets hasErrors; downstream nodes can react") {
    val failing = Node[Int, Int] { n => Trace.error("bad input"); n }
    val reactive = Node[Int, String] { n =>
      if (Trace.hasErrors) "degraded" else "normal"
    }
    val out = (failing ~> reactive).unsafeRunTrace(1)
    assert(out.result == "degraded")
    assert(out.errors == List("bad input"))
    assert(out.hasErrors)
  }

  test("logs outside a run are dropped, not crashing") {
    Trace.log("nobody listening")
    assert(Trace.getLogs.isEmpty)
  }

  test("&> branches DROP Trace logs (documented ThreadLocal caveat, " +
      "parity with the reference's Future platform)") {
    // The reference's JVM platform runs `&>` branches on ExecutionContext
    // threads where the ThreadLocal collector is absent, so branch logs
    // are silently dropped (/root/reference/etl4s/src-jvm/Platform.scala:29-35
    // — Future branches never see the caller's collector). We match that
    // contract exactly rather than silently diverging: caller-thread logs
    // collect, branch-thread logs do not.
    import scala.concurrent.ExecutionContext.Implicits.global
    val left = Node[Int, Int] { n => Trace.log("left-branch"); n + 1 }
    val right = Node[Int, Int] { n => Trace.log("right-branch"); n + 2 }
    val pipeline = Node[Int, Int] { n => Trace.log("caller"); n } ~> (left &> right)
    val t = pipeline.unsafeRunTrace(1)
    assert(t.result == (2, 3))
    assert(t.logs == List("caller"),
      s"branch logs must be dropped like the reference's, got ${t.logs}")
  }

  test("nested runs are isolated") {
    val inner = Node[Unit, Unit](_ => Trace.log("inner"))
    val outer = Node[Unit, List[Any]] { _ =>
      Trace.log("outer-before")
      inner.unsafeRunTrace(())
      Trace.log("outer-after")
      Trace.getLogs
    }
    val t = outer.unsafeRunTrace(())
    assert(t.result == List("outer-before", "outer-after"))
    assert(t.logs == List("outer-before", "outer-after"))
  }

  test("unsafeRunTrace measures elapsed time with low overhead") {
    val sleepy = Node[Unit, Int] { _ => Thread.sleep(100); 1 }
    val t = sleepy.unsafeRunTrace(())
    assert(t.timeElapsedMillis >= 100 && t.timeElapsedMillis < 150,
      s"elapsed=${t.timeElapsedMillis}")
    assert(t.seconds >= 0.1)
  }

  test("safeRunTrace keeps partial telemetry on failure") {
    val n = Node[Unit, Int] { _ =>
      Trace.log("step 1")
      Tel.addCounter("rows", 10)
      throw new RuntimeException("die")
    }
    val t = n.safeRunTrace(())
    assert(t.result.isFailure)
    assert(t.logs == List("step 1"))
    assert(t.counterTotals == Map("rows" -> 10L))
  }

  test("spans nest with parent/child and share a traceId") {
    val n = Node[Unit, Int] { _ =>
      Tel.withSpan("outer") {
        Tel.withSpan("inner") { 1 } + 1
      }
    }
    val t = n.unsafeRunTrace(())
    assert(t.result == 2)
    val spans = t.spans
    assert(spans.map(_.name).toSet == Set("outer", "inner"))
    val outer = spans.find(_.name == "outer").get
    val inner = spans.find(_.name == "inner").get
    assert(inner.parentSpanId.contains(outer.spanId))
    assert(outer.parentSpanId.isEmpty)
    assert(outer.traceId == inner.traceId)
  }

  test("counters accumulate, gauges keep latest, histograms keep all") {
    val n = Node[Unit, Unit] { _ =>
      Tel.addCounter("c", 1); Tel.addCounter("c", 2)
      Tel.setGauge("g", 1.0); Tel.setGauge("g", 9.0)
      Tel.recordHistogram("h", 1.0); Tel.recordHistogram("h", 2.0)
    }
    val t = n.unsafeRunTrace(())
    assert(t.counterTotals == Map("c" -> 3L))
    assert(t.latestGauges == Map("g" -> 9.0))
    assert(t.histogramValues == Map("h" -> List(1.0, 2.0)))
  }

  test("custom provider receives forwarded metrics") {
    val seen = scala.collection.mutable.ListBuffer.empty[String]
    implicit val tel: GraftTelemetry = new GraftTelemetry {
      def withSpan[T](name: String, attributes: (String, Any)*)(block: => T): T = {
        seen += s"span:$name"; block
      }
      def addCounter(name: String, value: Long): Unit = seen += s"counter:$name=$value"
      def setGauge(name: String, value: Double): Unit = seen += s"gauge:$name=$value"
      def recordHistogram(name: String, value: Double): Unit = seen += s"hist:$name=$value"
    }
    val n = Node[Unit, Int] { _ =>
      Tel.withSpan("work") { Tel.addCounter("n", 5); 1 }
    }
    assert(n.unsafeRun(()) == 1)
    assert(seen.toList == List("span:work", "counter:n=5"))
  }

  test("toOtelJson exports OTLP-shaped spans and metrics") {
    val n = Node[Unit, Unit] { _ =>
      Tel.withSpan("phase", "k" -> "v") { Tel.addCounter("rows", 42) }
    }
    val json = n.unsafeRunTrace(()).toOtelJson
    assert(json.contains("\"resourceSpans\""))
    assert(json.contains("\"resourceMetrics\""))
    assert(json.contains("\"name\":\"phase\""))
    assert(json.contains("\"rows\""))
    assert(json.contains("STATUS_CODE_OK"))
    assert(json.contains("\"key\":\"k\""))
  }

  test("addEvent attaches to the innermost open span and exports as OTLP events") {
    val seen = scala.collection.mutable.ListBuffer.empty[String]
    implicit val tel: GraftTelemetry = new GraftTelemetry {
      def withSpan[T](name: String, attributes: (String, Any)*)(block: => T): T = block
      def addCounter(name: String, value: Long): Unit = ()
      def setGauge(name: String, value: Double): Unit = ()
      def recordHistogram(name: String, value: Double): Unit = ()
      override def addEvent(name: String, attributes: (String, Any)*): Unit =
        seen += s"event:$name"
    }
    val n = Node[Unit, Int] { _ =>
      Tel.addEvent("orphan")                       // outside any span: trace no-op
      Tel.withSpan("outer") {
        Tel.addEvent("o1", "k" -> 1)
        Tel.withSpan("inner") { Tel.addEvent("i1"); 1 } + 1
      }
    }
    val t = n.unsafeRunTrace(())
    assert(t.result == 2)
    val outer = t.spans.find(_.name == "outer").get
    val inner = t.spans.find(_.name == "inner").get
    assert(outer.events.map(_.name) == List("o1"))
    assert(outer.events.head.attributes == Map("k" -> 1))
    assert(inner.events.map(_.name) == List("i1"))
    assert(inner.events.head.timestampNanos >= inner.startTimeNanos &&
      inner.events.head.timestampNanos <= inner.endTimeNanos)
    // provider sees every event, including the orphan
    assert(seen.toList == List("event:orphan", "event:o1", "event:i1"))
    val json = t.toOtelJson
    assert(json.contains("\"events\":[{\"timeUnixNano\""))
    assert(json.contains("\"name\":\"o1\""))
    assert(json.contains("\"key\":\"k\""))
  }

  test("&> branches do not see the trace collector (documented reference parity)") {
    import scala.concurrent.ExecutionContext.Implicits.global
    // The ThreadLocal trace state deliberately does NOT propagate into the
    // futures `&>` spawns (matching the reference's behavior/caveat,
    // `/root/reference/docs/examples-spark.md:100-101` advises `&` for
    // Spark work). Logs from inside &> branches are lost to the collector.
    val branch1 = Node[Unit, Int] { _ => Trace.log("from-branch-1"); 1 }
    val branch2 = Node[Unit, Int] { _ => Trace.log("from-branch-2"); 2 }
    val t = (branch1 &> branch2).unsafeRunTrace(())
    assert(t.result == ((1, 2)))
    assert(t.logs.isEmpty, "branch logs must not reach the collector")
    // while the sequential form keeps them:
    val seq = (branch1 & branch2).unsafeRunTrace(())
    assert(seq.logs == List("from-branch-1", "from-branch-2"))
  }

  test("Trace counts and last accessors") {
    val n = Node[Unit, Unit] { _ =>
      Trace.log("a"); Trace.log("b"); Trace.error("e1")
      assert(Trace.getLogCount == 2)
      assert(Trace.getErrorCount == 1)
      assert(Trace.getLastLog.contains("b"))
      assert(Trace.getLastError.contains("e1"))
      assert(Trace.hasLogs)
    }
    n.unsafeRun(())
  }
}
