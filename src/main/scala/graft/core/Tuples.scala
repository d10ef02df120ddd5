package graft.core

/** Appends a value to a tuple, keeping fan-out results flat:
  * `(A & B) & C` yields `(A, B, C)`, not `((A, B), C)` — up to arity 10
  * (reference parity: `etl4s/src-2/Etl4s.scala:1588-1686`, max-arity test
  * `etl4s/test/src/Etl4sSpec.scala:177-181`).
  *
  * Priority layering makes the widest tuple match first; the fallback pairs
  * two plain values.
  */
trait TupleAppend[A, B] {
  type Out
  def append(a: A, b: B): Out
}

object TupleAppend extends TupleAppendMid {
  type Aux[A, B, O] = TupleAppend[A, B] { type Out = O }

  private[core] def instance[A, B, O](f: (A, B) => O): Aux[A, B, O] =
    new TupleAppend[A, B] {
      type Out = O
      def append(a: A, b: B): O = f(a, b)
    }

  implicit def t9[A, B, C, D, E, F, G, H, I, J]
      : Aux[(A, B, C, D, E, F, G, H, I), J, (A, B, C, D, E, F, G, H, I, J)] =
    instance((t, x) => (t._1, t._2, t._3, t._4, t._5, t._6, t._7, t._8, t._9, x))
  implicit def t8[A, B, C, D, E, F, G, H, I]
      : Aux[(A, B, C, D, E, F, G, H), I, (A, B, C, D, E, F, G, H, I)] =
    instance((t, x) => (t._1, t._2, t._3, t._4, t._5, t._6, t._7, t._8, x))
  implicit def t7[A, B, C, D, E, F, G, H]
      : Aux[(A, B, C, D, E, F, G), H, (A, B, C, D, E, F, G, H)] =
    instance((t, x) => (t._1, t._2, t._3, t._4, t._5, t._6, t._7, x))
  implicit def t6[A, B, C, D, E, F, G]: Aux[(A, B, C, D, E, F), G, (A, B, C, D, E, F, G)] =
    instance((t, x) => (t._1, t._2, t._3, t._4, t._5, t._6, x))
  implicit def t5[A, B, C, D, E, F]: Aux[(A, B, C, D, E), F, (A, B, C, D, E, F)] =
    instance((t, x) => (t._1, t._2, t._3, t._4, t._5, x))
  implicit def t4[A, B, C, D, E]: Aux[(A, B, C, D), E, (A, B, C, D, E)] =
    instance((t, x) => (t._1, t._2, t._3, t._4, x))
  implicit def t3[A, B, C, D]: Aux[(A, B, C), D, (A, B, C, D)] =
    instance((t, x) => (t._1, t._2, t._3, x))
}

trait TupleAppendMid extends TupleAppendLow {
  implicit def t2[A, B, C]: TupleAppend.Aux[(A, B), C, (A, B, C)] =
    TupleAppend.instance((t, x) => (t._1, t._2, x))
}

trait TupleAppendLow {
  implicit def pair[A, B]: TupleAppend.Aux[A, B, (A, B)] =
    TupleAppend.instance((a, b) => (a, b))
}

/** Flattens left-nested tuples produced by repeated pairing into one flat
  * tuple: `((A, B), C)` → `(A, B, C)` … up to arity 10. Identity for
  * anything else. (Reference parity: `etl4s/src-2/Etl4s.scala:1425-1575`.)
  */
trait Flatten[A] {
  type Out
  def apply(a: A): Out
}

object Flatten extends FlattenLevels {
  type Aux[A, O] = Flatten[A] { type Out = O }

  private[core] def instance[A, O](f: A => O): Aux[A, O] =
    new Flatten[A] {
      type Out = O
      def apply(a: A): O = f(a)
    }

  implicit def f10[A, B, C, D, E, F, G, H, I, J]: Aux[
    (((((((((A, B), C), D), E), F), G), H), I), J),
    (A, B, C, D, E, F, G, H, I, J)
  ] =
    instance { t =>
      val (((((((((a, b), c), d), e), f), g), h), i), j) = t
      (a, b, c, d, e, f, g, h, i, j)
    }
}

trait FlattenLevels extends FlattenLevels2 {
  implicit def f9[A, B, C, D, E, F, G, H, I]
      : Flatten.Aux[((((((((A, B), C), D), E), F), G), H), I), (A, B, C, D, E, F, G, H, I)] =
    Flatten.instance { t =>
      val ((((((((a, b), c), d), e), f), g), h), i) = t
      (a, b, c, d, e, f, g, h, i)
    }
  implicit def f8[A, B, C, D, E, F, G, H]
      : Flatten.Aux[(((((((A, B), C), D), E), F), G), H), (A, B, C, D, E, F, G, H)] =
    Flatten.instance { t =>
      val (((((((a, b), c), d), e), f), g), h) = t
      (a, b, c, d, e, f, g, h)
    }
  implicit def f7[A, B, C, D, E, F, G]
      : Flatten.Aux[((((((A, B), C), D), E), F), G), (A, B, C, D, E, F, G)] =
    Flatten.instance { t =>
      val ((((((a, b), c), d), e), f), g) = t
      (a, b, c, d, e, f, g)
    }
  implicit def f6[A, B, C, D, E, F]
      : Flatten.Aux[(((((A, B), C), D), E), F), (A, B, C, D, E, F)] =
    Flatten.instance { t =>
      val (((((a, b), c), d), e), f) = t
      (a, b, c, d, e, f)
    }
  implicit def f5[A, B, C, D, E]: Flatten.Aux[((((A, B), C), D), E), (A, B, C, D, E)] =
    Flatten.instance { t =>
      val ((((a, b), c), d), e) = t
      (a, b, c, d, e)
    }
  implicit def f4[A, B, C, D]: Flatten.Aux[(((A, B), C), D), (A, B, C, D)] =
    Flatten.instance { t =>
      val (((a, b), c), d) = t
      (a, b, c, d)
    }
  implicit def f3[A, B, C]: Flatten.Aux[((A, B), C), (A, B, C)] =
    Flatten.instance { t =>
      val ((a, b), c) = t
      (a, b, c)
    }
}

trait FlattenLevels2 {
  implicit def fId[A]: Flatten.Aux[A, A] = Flatten.instance(a => a)
}
