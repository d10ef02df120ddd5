package graft.core

import java.util.concurrent.ConcurrentLinkedQueue

import org.scalatest.funsuite.AnyFunSuite
import scala.concurrent.ExecutionContext.Implicits.global

/** Port of the reference's JVM TimingSpecs invariants
  * (`/root/reference/etl4s/test/src-jvm/TimingSpecs.scala:8-68`, tabled in
  * BASELINE.md): `&>` concurrency skew, trace timing overhead, retry
  * backoff floors.
  */
class TimingSpec extends AnyFunSuite {

  test("&> branches start within 50ms of each other") {
    val starts = new ConcurrentLinkedQueue[Long]()
    val b1 = Node[Unit, Int] { _ => starts.add(System.currentTimeMillis()); Thread.sleep(100); 1 }
    val b2 = Node[Unit, Int] { _ => starts.add(System.currentTimeMillis()); Thread.sleep(100); 2 }
    (b1 &> b2).unsafeRun(())
    val times = starts.toArray(Array.empty[java.lang.Long]).map(_.longValue()).sorted
    assert(times.length == 2)
    assert(times(1) - times(0) < 50, s"branch start skew ${times(1) - times(0)}ms")
  }

  test("unsafeRunTrace overhead under 50ms for a 100ms stage") {
    val sleepy = Node[Unit, Int] { _ => Thread.sleep(100); 1 }
    val t = sleepy.unsafeRunTrace(())
    assert(t.timeElapsedMillis >= 100 && t.timeElapsedMillis < 150,
      s"elapsed ${t.timeElapsedMillis}ms")
  }

  test("retry backoff delays respect initial delay and factor 2.0") {
    val stamps = scala.collection.mutable.ListBuffer.empty[Long]
    val dead = Node[Unit, Int] { _ =>
      stamps += System.currentTimeMillis(); throw new RuntimeException("x")
    }
    intercept[RuntimeException] {
      dead.withRetry(maxAttempts = 3, initialDelayMs = 50, backoffFactor = 2.0)
        .unsafeRun(())
    }
    val gaps = stamps.toList.sliding(2).map { case List(a, b) => b - a }.toList
    assert(gaps.head >= 50, s"first delay ${gaps.head}ms < 50ms")
    assert(gaps(1) >= 100, s"second delay ${gaps(1)}ms < 100ms")
  }
}
