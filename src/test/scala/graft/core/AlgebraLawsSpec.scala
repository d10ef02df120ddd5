package graft.core

import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Properties}

/** Property-based checks of the algebra laws the reference asserts
  * example-wise (SURVEY §5: associativity `Etl4sSpec.scala:223-232`, `>>`
  * ordering `:93-110`, first-match branching `:1765-1787`).
  */
object AlgebraLawsSpec extends Properties("graft.core algebra") {

  private val fGen: Gen[Int => Int] = Gen.oneOf[Int => Int](
    (x: Int) => x + 1,
    (x: Int) => x * 2,
    (x: Int) => x - 3,
    (x: Int) => -x,
    (x: Int) => x / 2,
    (x: Int) => x * x
  )

  property("~> associativity") = forAll(fGen, fGen, fGen, Gen.chooseNum(-1000, 1000)) {
    (f, g, h, x) =>
      val (a, b, c) = (Node(f), Node(g), Node(h))
      ((a ~> b) ~> c).apply(x) == (a ~> (b ~> c)).apply(x)
  }

  property("identity is ~>-neutral") = forAll(fGen, Gen.chooseNum(-1000, 1000)) {
    (f, x) =>
      val n = Node(f)
      (Node.identity[Int] ~> n).apply(x) == n(x) &&
      (n ~> Node.identity[Int]).apply(x) == n(x)
  }

  property("map fusion: map(f).map(g) == map(f andThen g)") =
    forAll(fGen, fGen, fGen, Gen.chooseNum(-1000, 1000)) { (f, g, h, x) =>
      Node(f).map(g).map(h).apply(x) == Node(f).map(g.andThen(h)).apply(x)
    }

  property("& preserves both branch results in order") =
    forAll(fGen, fGen, Gen.chooseNum(-1000, 1000)) { (f, g, x) =>
      (Node(f) & Node(g)).apply(x) == ((f(x), g(x)))
    }

  property(">> returns second result, runs left first") =
    forAll(fGen, fGen, Gen.chooseNum(-1000, 1000)) { (f, g, x) =>
      var order = List.empty[String]
      val l = Node { (v: Int) => order ::= "l"; f(v) }
      val r = Node { (v: Int) => order ::= "r"; g(v) }
      val res = (l >> r).apply(x)
      res == g(x) && order == List("r", "l")
    }

  property("zip flattens what & pairs") =
    forAll(fGen, fGen, fGen, Gen.chooseNum(-1000, 1000)) { (f, g, h, x) =>
      // build nested pairs manually, flatten via zip
      val nested = Node((v: Int) => ((f(v), g(v)), h(v)))
      nested.zip.apply(x) == ((f(x), g(x), h(x)))
    }

  property("onFailure recovers exactly the failing inputs") =
    forAll(Gen.chooseNum(-100, 100)) { x =>
      val partial = Node((v: Int) => if (v < 0) throw new RuntimeException("neg") else v)
      partial.onFailure(_ => -999).apply(x) == (if (x < 0) -999 else x)
    }

  property("If/ElseIf/Else picks the first matching arm") =
    forAll(Gen.chooseNum(-100, 100), Gen.chooseNum(-100, 100)) { (t1, x) =>
      val routed = Node.identity[Int]
        .If((v: Int) => v < t1)(Node((_: Int) => "lt"))
        .ElseIf((v: Int) => v == t1)(Node((_: Int) => "eq"))
        .Else(Node((_: Int) => "gt"))
        .apply(x)
      routed == (if (x < t1) "lt" else if (x == t1) "eq" else "gt")
    }

  property("withRetry(1) == plain behavior") =
    forAll(fGen, Gen.chooseNum(-1000, 1000)) { (f, x) =>
      Node(f).withRetry(maxAttempts = 1, initialDelayMs = 0).apply(x) == f(x)
    }
}
