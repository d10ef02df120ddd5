package graft.core

import org.scalatest.funsuite.AnyFunSuite
import java.util.concurrent.atomic.AtomicInteger
import scala.concurrent.ExecutionContext.Implicits.global

/** Behavioral port of the reference BasicSpecs
  * (`/root/reference/etl4s/test/src/Etl4sSpec.scala:6-271`).
  */
class NodeSpec extends AnyFunSuite {

  test("node wraps a function and runs like one") {
    val len = Node[String, Int](_.length)
    assert(len("hello") == 5)
    assert(len.unsafeRun("hello!") == 6)
  }

  test("~> composes sequentially") {
    val extract = Extract[Unit, String](_ => "Hello world!")
    val length = Transform[String, Int](_.length)
    val report = Load[Int, String](n => s"len=$n")
    val pipeline = extract ~> length ~> report
    assert(pipeline.unsafeRun(()) == "len=12")
  }

  test("~> is associative") {
    val a = Node[Int, Int](_ + 1)
    val b = Node[Int, Int](_ * 2)
    val c = Node[Int, Int](_ - 3)
    val left = (a ~> b) ~> c
    val right = a ~> (b ~> c)
    for (x <- -10 to 10) assert(left(x) == right(x))
  }

  test("andThen is an alias of ~>") {
    val p = Node[Int, Int](_ + 1).andThen(Node[Int, Int](_ * 2))
    assert(p(3) == 8)
  }

  test(">> runs both on the same input, keeps second result") {
    val seen = scala.collection.mutable.ListBuffer.empty[String]
    val first = Node[Int, Unit](n => seen += s"first:$n")
    val second = Node[Int, String] { n => seen += s"second:$n"; s"done:$n" }
    val both = first >> second
    assert(both.unsafeRun(7) == "done:7")
    assert(seen.toList == List("first:7", "second:7"))
  }

  test("& fans out one input to a flat tuple") {
    val n1 = Node[Int, Int](_ + 1)
    val n2 = Node[Int, String](_.toString)
    val n3 = Node[Int, Double](_ / 2.0)
    val three = n1 & n2 & n3
    assert(three.unsafeRun(4) == ((5, "4", 2.0)))
  }

  test("& flattens out to arity 10") {
    val id = Node[Int, Int](identity)
    val ten = id & id & id & id & id & id & id & id & id & id
    assert(ten.unsafeRun(1) == ((1, 1, 1, 1, 1, 1, 1, 1, 1, 1)))
  }

  test("&> runs branches concurrently") {
    val t0 = System.currentTimeMillis()
    val slow1 = Node[Unit, Int] { _ => Thread.sleep(100); 1 }
    val slow2 = Node[Unit, Int] { _ => Thread.sleep(100); 2 }
    val slow3 = Node[Unit, Int] { _ => Thread.sleep(100); 3 }
    val par = slow1 &> slow2 &> slow3
    assert(par.unsafeRun(()) == ((1, 2, 3)))
    val elapsed = System.currentTimeMillis() - t0
    assert(elapsed < 280, s"expected ~100ms concurrent fan-out, got ${elapsed}ms")
  }

  test("& runs branches sequentially (~sum of branch times)") {
    val t0 = System.currentTimeMillis()
    val slow1 = Node[Unit, Int] { _ => Thread.sleep(60); 1 }
    val slow2 = Node[Unit, Int] { _ => Thread.sleep(60); 2 }
    assert((slow1 & slow2).unsafeRun(()) == ((1, 2)))
    assert(System.currentTimeMillis() - t0 >= 120)
  }

  test("map post-transforms the output") {
    val n = Node[Int, Int](_ + 1).map(_.toString)
    assert(n(1) == "2")
  }

  test("flatMap selects the next node from the output, re-applies input") {
    val route = Node[Int, Boolean](_ % 2 == 0).flatMap { even =>
      if (even) Node[Int, String](n => s"even:$n") else Node[Int, String](n => s"odd:$n")
    }
    assert(route(4) == "even:4")
    assert(route(5) == "odd:5")
  }

  test("tap peeks without changing the value") {
    var seen = -1
    val n = Node[Int, Int](_ * 2).tap(seen = _)
    assert(n(21) == 42)
    assert(seen == 42)
  }

  test("standalone tap util is a passthrough node") {
    var seen = ""
    val p = Node[Int, String](_.toString) ~> tap[String](seen = _) ~> Node[String, Int](_.toInt)
    assert(p(5) == 5)
    assert(seen == "5")
  }

  test("onFailure recovers with a fallback") {
    val parse = Node[String, Int](_.toInt).onFailure(_ => 0)
    assert(parse("123") == 123)
    assert(parse("abc") == 0)
  }

  test("withRetry retries to success and counts attempts") {
    val attempts = new AtomicInteger(0)
    val flaky = Node[Unit, Int] { _ =>
      if (attempts.incrementAndGet() < 3) throw new RuntimeException("boom")
      else 42
    }
    assert(flaky.withRetry(maxAttempts = 3, initialDelayMs = 10).unsafeRun(()) == 42)
    assert(attempts.get() == 3)
  }

  test("withRetry exhausts attempts then throws; backoff delays grow") {
    val attempts = new AtomicInteger(0)
    val stamps = scala.collection.mutable.ListBuffer.empty[Long]
    val dead = Node[Unit, Int] { _ =>
      stamps += System.currentTimeMillis()
      attempts.incrementAndGet()
      throw new RuntimeException("always")
    }
    val ex = intercept[RuntimeException] {
      dead.withRetry(maxAttempts = 3, initialDelayMs = 50, backoffFactor = 2.0).unsafeRun(())
    }
    assert(ex.getMessage == "always")
    assert(attempts.get() == 3)
    val gaps = stamps.toList.sliding(2).map { case List(a, b) => b - a }.toList
    assert(gaps(0) >= 45, s"first backoff gap too small: $gaps")
    assert(gaps(1) >= 90, s"second backoff gap too small: $gaps")
  }

  test("zip flattens nested tuple outputs") {
    val nested = Node[Int, ((Int, Int), Int)](n => ((n, n + 1), n + 2))
    assert(nested.zip.unsafeRun(1) == ((1, 2, 3)))
  }

  test("runAsync returns a Future of the result") {
    import scala.concurrent.Await
    import scala.concurrent.duration._
    val n = Node[Int, Int](_ + 1)
    assert(Await.result(n.runAsync.apply(1), 2.seconds) == 2)
  }

  test("factories: identity, unit, effect, pure, by-name") {
    assert(Node.identity[Int].apply(3) == 3)
    assert(Node.unit(42).apply(()) == 42)
    var ran = false
    Node.effect { ran = true }.apply(())
    assert(ran)
    assert(Node.pure[String, Int](7).apply("x") == 7)
    var evaluated = false
    val lazyNode = Node { evaluated = true; 5 }
    assert(!evaluated, "by-name node must stay lazy until run")
    assert(lazyNode.unsafeRun() == 5)
    assert(evaluated)
  }

  test("bare lambdas lift into nodes via implicit conversion") {
    val doubler: Int => Int = _ * 2
    val p = Node[Int, Int](_ + 1) ~> doubler
    assert(p(3) == 8)
  }

  test("safeRun wraps failures in Try") {
    val bad = Node[Int, Int](_ => throw new IllegalStateException("nope"))
    assert(bad.safeRun(1).isFailure)
    assert(Node[Int, Int](_ + 1).safeRun(1).get == 2)
  }

  test("unsafeRun with no input works for Node[Any, B]") {
    val n = Node("const")
    assert(n.unsafeRun() == "const")
  }

  test("metadata attaches and survives withMetadata") {
    val n = Node[Int, Int](identity).withMetadata("my stage")
    assert(n.metadata == "my stage")
  }
}
