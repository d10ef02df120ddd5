package graft.core

/** First-matching-predicate routing on a node's output.
  *
  * `node.If(p)(n1).ElseIf(q)(n2).Else(n3)` runs the source node once, tests
  * predicates in declaration order against its output, and runs ONLY the
  * first matching branch (lazy — untaken branches never execute). Scala-2
  * encoding: all branches share an output supertype `C`.
  *
  * Behavior parity: `etl4s/src-2/Etl4s.scala:2212-2423`.
  */
final case class IfBuilder[A, B, C](
    source: Node[A, B],
    arms: List[(B => Boolean, Node[B, C])]
) {
  def ElseIf(condition: B => Boolean)(branch: Node[B, C]): IfBuilder[A, B, C] =
    IfBuilder(source, arms :+ (condition -> branch))

  def Else(fallback: Node[B, C]): Node[A, C] =
    Node { a =>
      val b = source.f(a)
      arms.collectFirst { case (p, n) if p(b) => n } match {
        case Some(n) => n.f(b)
        case None => fallback.f(b)
      }
    }
}

/** Exhaustive variant (every input matches some arm); `build` finalizes. */
final case class IfElseChain[A, B, C](
    source: Node[A, B],
    arms: List[(B => Boolean, Node[B, C])],
    fallback: Node[B, C]
) {
  def ElseIf(condition: B => Boolean)(branch: Node[B, C]): IfElseChain[A, B, C] =
    IfElseChain(source, arms :+ (condition -> branch), fallback)

  def build: Node[A, C] = IfBuilder(source, arms).Else(fallback)
}

/** Lifts a branch argument — plain Node, Reader-wrapped node, or nested
  * conditional chain — into `Reader[T, Node[B, C]]`.
  */
trait BranchLift[T, B, C, Branch] {
  def lift(branch: Branch): Reader[T, Node[B, C]]
}

object BranchLift extends BranchLiftLow {
  implicit def fromNode[T, B, C]: BranchLift[T, B, C, Node[B, C]] =
    new BranchLift[T, B, C, Node[B, C]] {
      def lift(branch: Node[B, C]): Reader[T, Node[B, C]] = Reader.pure(branch)
    }

  implicit def fromReader[T, B, C]: BranchLift[T, B, C, Reader[T, Node[B, C]]] =
    new BranchLift[T, B, C, Reader[T, Node[B, C]]] {
      def lift(branch: Reader[T, Node[B, C]]): Reader[T, Node[B, C]] = branch
    }
}

trait BranchLiftLow {
  implicit def fromChain[T, B, X, C]: BranchLift[T, B, C, ReaderIfElseChain[T, B, X, C]] =
    new BranchLift[T, B, C, ReaderIfElseChain[T, B, X, C]] {
      def lift(chain: ReaderIfElseChain[T, B, X, C]): Reader[T, Node[B, C]] = chain.build
    }
}

/** Lifts a condition — plain `B => Boolean` or config-aware
  * `T => B => Boolean` — into the curried form.
  */
trait ConditionLift[T, B, Cond] {
  def lift(cond: Cond): T => B => Boolean
}

object ConditionLift extends ConditionLiftLow {
  implicit def curried[T, B]: ConditionLift[T, B, T => B => Boolean] =
    new ConditionLift[T, B, T => B => Boolean] {
      def lift(cond: T => B => Boolean): T => B => Boolean = cond
    }
}

trait ConditionLiftLow {
  implicit def plain[T, B]: ConditionLift[T, B, B => Boolean] =
    new ConditionLift[T, B, B => Boolean] {
      def lift(cond: B => Boolean): T => B => Boolean = _ => cond
    }
}

/** Non-exhaustive conditional chain over a config-dependent node. Branch
  * readers are resolved against the environment at `provide` time; branch
  * NODES still run lazily (first match only).
  */
final case class ReaderIfBuilder[T, A, B, C](
    source: Reader[T, Node[A, B]],
    arms: List[(T => B => Boolean, Reader[T, Node[B, C]])]
) {
  def ElseIf[Branch, Cond](condition: Cond)(branch: Branch)(implicit
      cl: ConditionLift[T, B, Cond],
      bl: BranchLift[T, B, C, Branch]
  ): ReaderIfBuilder[T, A, B, C] =
    ReaderIfBuilder(source, arms :+ (cl.lift(condition) -> bl.lift(branch)))

  /** Branch chosen purely by config (data ignored). */
  def ElseIfCtx[Branch](condition: T => Boolean)(branch: Branch)(implicit
      bl: BranchLift[T, B, C, Branch]
  ): ReaderIfBuilder[T, A, B, C] =
    ReaderIfBuilder(
      source,
      arms :+ (((t: T) => (_: B) => condition(t)) -> bl.lift(branch))
    )

  def Else[Branch](fallback: Branch)(implicit
      bl: BranchLift[T, B, C, Branch]
  ): Reader[T, Node[A, C]] =
    Reader { ctx =>
      val src = source.run(ctx)
      val resolved = arms.map { case (p, r) => (p(ctx), r.run(ctx)) }
      val dflt = bl.lift(fallback).run(ctx)
      Node { a =>
        val b = src.f(a)
        resolved.collectFirst { case (p, n) if p(b) => n } match {
          case Some(n) => n.f(b)
          case None => dflt.f(b)
        }
      }
    }
}

/** Exhaustive conditional chain over a config-dependent node. */
final case class ReaderIfElseChain[T, A, B, C](
    source: Reader[T, Node[A, B]],
    arms: List[(T => B => Boolean, Reader[T, Node[B, C]])],
    fallback: Reader[T, Node[B, C]]
) {
  def ElseIf[Branch, Cond](condition: Cond)(branch: Branch)(implicit
      cl: ConditionLift[T, B, Cond],
      bl: BranchLift[T, B, C, Branch]
  ): ReaderIfElseChain[T, A, B, C] =
    ReaderIfElseChain(source, arms :+ (cl.lift(condition) -> bl.lift(branch)), fallback)

  def ElseIfCtx[Branch](condition: T => Boolean)(branch: Branch)(implicit
      bl: BranchLift[T, B, C, Branch]
  ): ReaderIfElseChain[T, A, B, C] =
    ReaderIfElseChain(
      source,
      arms :+ (((t: T) => (_: B) => condition(t)) -> bl.lift(branch)),
      fallback
    )

  def build: Reader[T, Node[A, C]] =
    ReaderIfBuilder(source, arms).Else(fallback)(BranchLift.fromReader)
}
