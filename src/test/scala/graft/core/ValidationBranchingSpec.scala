package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral port of reference ValidationSpecs + ConditionalBranchingSpecs
  * (`/root/reference/etl4s/test/src/Etl4sSpec.scala:1151-1488`, `:1648-2140`).
  */
class ValidationBranchingSpec extends AnyFunSuite {

  // ------------------------------------------------------------ validation

  test("ensure passes valid input/output through") {
    val n = Node[Int, String](n => s"v$n").ensure(
      input = Seq((x: Int) => if (x > 0) None else Some("must be positive")),
      output = Seq((s: String) => if (s.nonEmpty) None else Some("empty"))
    )
    assert(n.unsafeRun(5) == "v5")
  }

  test("ensure accumulates ALL failing checks in one exception") {
    val n = Node[Int, Int](identity).ensure(
      input = Seq(
        (x: Int) => if (x > 0) None else Some("must be positive"),
        (x: Int) => if (x % 2 == 0) None else Some("must be even")
      )
    )
    val ex = intercept[ValidationException](n.unsafeRun(-3))
    assert(ex.getMessage.contains("must be positive"))
    assert(ex.getMessage.contains("must be even"))
    assert(ex.getMessage.startsWith("Input validation failed"))
  }

  test("ensure change checks see input and output") {
    val n = Node[Int, Int](_ * 2).ensure(
      change = Seq((p: (Int, Int)) => if (p._2 > p._1) None else Some("did not grow"))
    )
    assert(n.unsafeRun(3) == 6)
    intercept[ValidationException](n.unsafeRun(-3))
  }

  test("ensure failure is recorded to the Trace") {
    val n = Node[Int, Int](identity)
      .ensure(input = Seq((x: Int) => Some("always bad")))
    val t = n.safeRunTrace(0)
    assert(t.result.isFailure)
    assert(t.errors.exists(_.toString.contains("always bad")))
  }

  test("ensureWarn logs instead of throwing") {
    val n = Node[Int, Int](identity)
      .ensureWarn(input = Seq((x: Int) => Some("suspicious")))
    val t = n.unsafeRunTrace(1)
    assert(t.result == 1)
    assert(t.logs.exists(_.toString.contains("suspicious")))
    assert(!t.hasErrors)
  }

  test("ensurePar evaluates checks concurrently and still accumulates") {
    import scala.concurrent.ExecutionContext.Implicits.global
    val t0 = System.currentTimeMillis()
    val slowCheck: Int => Option[String] = _ => { Thread.sleep(80); Some("slow fail") }
    val n = Node[Int, Int](identity).ensurePar(
      input = Seq(slowCheck, slowCheck, slowCheck)
    )
    val ex = intercept[ValidationException](n.unsafeRun(1))
    assert(System.currentTimeMillis() - t0 < 240, "checks should run in parallel")
    assert("slow fail".r.findAllIn(ex.getMessage).size == 3)
  }

  test("empty ensure is the identity (no-op elision)") {
    val n = Node[Int, Int](_ + 1)
    assert((n.ensure() eq n) || n.ensure().apply(1) == 2)
  }

  test("reader ensure mixes curried and plain checks") {
    case class Cfg(min: Int)
    val r = Transform.requires[Cfg, Int, Int](_ => x => x * 2)
      .ensure(
        input = Seq[ValidationCheck[Cfg, Int]](
          (cfg: Cfg) => (x: Int) => if (x >= cfg.min) None else Some("too small"),
          (x: Int) => if (x < 1000) None else Some("too big")
        )
      )
    assert(r.provide(Cfg(3)).unsafeRun(5) == 10)
    val ex = intercept[ValidationException](r.provide(Cfg(3)).unsafeRun(1))
    assert(ex.getMessage.contains("too small"))
    intercept[ValidationException](r.provide(Cfg(3)).unsafeRun(5000))
  }

  test("reader ensureWarn logs with config-aware message") {
    case class Cfg(max: Int)
    val r = Transform.requires[Cfg, Int, Int](_ => identity)
      .ensureWarn(
        output = Seq[ValidationCheck[Cfg, Int]](
          (cfg: Cfg) => (x: Int) => if (x <= cfg.max) None else Some(s"over ${cfg.max}")
        )
      )
    val t = r.provide(Cfg(10)).unsafeRunTrace(11)
    assert(t.result == 11)
    assert(t.logs.exists(_.toString.contains("over 10")))
  }

  // ------------------------------------------------------------- branching

  test("If/ElseIf/Else picks the first matching branch") {
    val classify = Node[Int, Int](identity)
      .If(_ < 0)(Node[Int, String](_ => "negative"))
      .ElseIf(_ == 0)(Node[Int, String](_ => "zero"))
      .Else(Node[Int, String](_ => "positive"))
    assert(classify.unsafeRun(-5) == "negative")
    assert(classify.unsafeRun(0) == "zero")
    assert(classify.unsafeRun(10) == "positive")
  }

  test("branches are lazy: only the selected branch runs") {
    var ran = List.empty[String]
    val a = Node[Int, String] { _ => ran ::= "a"; "a" }
    val b = Node[Int, String] { _ => ran ::= "b"; "b" }
    val n = Node[Int, Int](identity).If(_ > 0)(a).Else(b)
    assert(n.unsafeRun(1) == "a")
    assert(ran == List("a"))
  }

  test("conditions are checked in order; first match wins") {
    val n = Node[Int, Int](identity)
      .If(_ >= 90)(Node[Int, String](_ => "A"))
      .ElseIf(_ >= 80)(Node[Int, String](_ => "B"))
      .ElseIf(_ >= 70)(Node[Int, String](_ => "C"))
      .Else(Node[Int, String](_ => "F"))
    assert(n.unsafeRun(95) == "A")
    assert(n.unsafeRun(85) == "B")
    assert(n.unsafeRun(75) == "C")
    assert(n.unsafeRun(10) == "F")
  }

  test("conditional composes inside pipelines") {
    case class User(name: String, age: Int)
    val parse = Extract[String, User] { s =>
      val parts = s.split(","); User(parts(0), parts(1).toInt)
    }
    val categorize = Transform[User, User](identity)
      .If((_: User).age < 18)(Node[User, String](u => s"${u.name}:minor"))
      .Else(Node[User, String](u => s"${u.name}:adult"))
    val p = parse ~> categorize
    assert(p.unsafeRun("Alice,15") == "Alice:minor")
    assert(p.unsafeRun("Bob,30") == "Bob:adult")
  }

  test("reader conditionals: config-driven routing with IfCtx") {
    case class Cfg(backfill: Boolean)
    val incremental = Node[Int, String](n => s"incr:$n")
    val backfill = Node[Int, String](n => s"back:$n")
    val r = Transform.requires[Cfg, Int, Int](_ => identity)
      .IfCtx((cfg: Cfg) => cfg.backfill)(backfill)
      .Else(incremental)
    assert(r.provide(Cfg(backfill = true)).unsafeRun(1) == "back:1")
    assert(r.provide(Cfg(backfill = false)).unsafeRun(1) == "incr:1")
  }

  test("reader conditionals: data + config mixed conditions") {
    case class Cfg(threshold: Int)
    val big = Node[Int, String](n => s"big:$n")
    val small = Node[Int, String](n => s"small:$n")
    val r = Transform.requires[Cfg, Int, Int](_ => identity)
      .If((cfg: Cfg) => (n: Int) => n > cfg.threshold)(big)
      .Else(small)
    assert(r.provide(Cfg(10)).unsafeRun(11) == "big:11")
    assert(r.provide(Cfg(10)).unsafeRun(9) == "small:9")
  }

  test("reader conditional branches may themselves be readers") {
    case class Cfg(tag: String)
    val tagged = Transform.requires[Cfg, Int, String](cfg => n => s"${cfg.tag}:$n")
    val fallback = Node[Int, String](n => s"plain:$n")
    val r = Transform.requires[Cfg, Int, Int](_ => identity)
      .If((_: Int) > 0)(tagged)
      .Else(fallback)
    assert(r.provide(Cfg("t")).unsafeRun(5) == "t:5")
    assert(r.provide(Cfg("t")).unsafeRun(-5) == "plain:-5")
  }

  // --------------------------------------------------------------- lineage

  test("lineage merges on composition") {
    val a = Node[Int, Int](_ + 1).lineageName("stage-a").lineageInputs("s3://in")
    val b = Node[Int, Int](_ * 2).lineageName("stage-b").lineageOutputs("db.out")
    val p = a ~> b
    val lin = p.getLineage.get
    assert(lin.name == "stage-a_stage-b")
    assert(lin.inputs == List("s3://in"))
    assert(lin.outputs == List("db.out"))
  }

  test("full lineage record via lineage(...)") {
    val n = Node[Int, Int](identity).lineage(
      name = "nightly",
      inputs = List("s1"),
      outputs = List("s2"),
      schedule = "0 3 * * *",
      tags = List("prod")
    )
    val lin = n.getLineage.get
    assert(lin.name == "nightly")
    assert(lin.schedule == "0 3 * * *")
    assert(lin.tags == List("prod"))
  }
}
