package graft

import scala.language.implicitConversions

/** The graft pipeline algebra: import `graft.core._` to get the `Node`
  * composition operators, `Reader` config injection, `Trace`/`Tel`
  * observability, validation, branching, and lineage rendering.
  *
  * The four ETL aliases are all the same `Node` type — naming intent, not
  * different machinery (reference parity: `etl4s/src-2/Etl4s.scala:688-724`).
  */
package object core {

  type Extract[A, B] = Node[A, B]
  type Transform[A, B] = Node[A, B]
  type Load[A, B] = Node[A, B]
  type Pipeline[A, B] = Node[A, B]

  object Extract {
    def apply[A, B](func: A => B): Extract[A, B] = Node(func)
    def apply[B](value: => B): Extract[Any, B] = Node(value)
    def pure[A]: Extract[A, A] = Node.identity[A]
    def requires[T, A, B](f: T => A => B): Reader[T, Node[A, B]] = Node.requires(f)
  }

  object Transform {
    def apply[A, B](func: A => B): Transform[A, B] = Node(func)
    def apply[B](value: => B): Transform[Any, B] = Node(value)
    def pure[A]: Transform[A, A] = Node.identity[A]
    def requires[T, A, B](f: T => A => B): Reader[T, Node[A, B]] = Node.requires(f)
  }

  object Load {
    def apply[A, B](func: A => B): Load[A, B] = Node(func)
    def apply[B](value: => B): Load[Any, B] = Node(value)
    def pure[A]: Load[A, A] = Node.identity[A]
    def requires[T, A, B](f: T => A => B): Reader[T, Node[A, B]] = Node.requires(f)
  }

  object Pipeline {
    def apply[A, B](func: A => B): Pipeline[A, B] = Node(func)
    def apply[B](value: => B): Pipeline[Any, B] = Node(value)
    def pure[A]: Pipeline[A, A] = Node.identity[A]
    def requires[T, A, B](f: T => A => B): Reader[T, Node[A, B]] = Node.requires(f)
  }

  /** Standalone passthrough side-effect node. */
  def tap[A](f: A => Any): Node[A, A] = Node { (a: A) => f(a); a }

  /** Bare lambdas compose directly with `~>` / `&` / `>>`. */
  implicit def function1ToNode[A, B](f: A => B): Node[A, B] = Node(f)

  // -- operator surfaces ----------------------------------------------------
  implicit def toReaderNodeOps[T, A, B](fa: Reader[T, Node[A, B]]): ReaderNodeOps[T, A, B] =
    new ReaderNodeOps(fa)
  implicit def toNodeEnsureOps[A, B](node: Node[A, B]): NodeEnsureOps[A, B] =
    new NodeEnsureOps(node)
  implicit def toReaderEnsureOps[T, A, B](fa: Reader[T, Node[A, B]]): ReaderEnsureOps[T, A, B] =
    new ReaderEnsureOps(fa)

  implicit final class NodeIfOps[A, B](private val node: Node[A, B]) {
    def If[C](condition: B => Boolean)(branch: Node[B, C]): IfBuilder[A, B, C] =
      IfBuilder(node, List(condition -> branch))
  }

  implicit final class ReaderIfOps[T, A, B](private val reader: Reader[T, Node[A, B]]) {
    def If[C, Branch, Cond](condition: Cond)(branch: Branch)(implicit
        cl: ConditionLift[T, B, Cond],
        bl: BranchLift[T, B, C, Branch]
    ): ReaderIfBuilder[T, A, B, C] =
      ReaderIfBuilder(reader, List(cl.lift(condition) -> bl.lift(branch)))

    def IfCtx[C, Branch](condition: T => Boolean)(branch: Branch)(implicit
        bl: BranchLift[T, B, C, Branch]
    ): ReaderIfBuilder[T, A, B, C] =
      ReaderIfBuilder(
        reader,
        List((((t: T) => (_: B) => condition(t))) -> bl.lift(branch))
      )
  }

  /** A finished exhaustive conditional chain is itself a Node. */
  implicit def ifChainToNode[A, B, C](chain: IfElseChain[A, B, C]): Node[A, C] =
    chain.build

  implicit def readerIfChainToReader[T, A, B, C](
      chain: ReaderIfElseChain[T, A, B, C]
  ): Reader[T, Node[A, C]] = chain.build

  // -- lineage rendering ---------------------------------------------------
  implicit final class NodeRenderOps[A, B](private val node: Node[A, B]) {
    def toJson: String = LineageRender.toJson(Seq(node))
    def toDot: String = LineageRender.toDot(Seq(node))
    def toMermaid: String = LineageRender.toMermaid(Seq(node))
  }

  implicit final class ReaderRenderOps[R, A](private val reader: Reader[R, A]) {
    def toJson: String = LineageRender.toJson(Seq(reader))
    def toDot: String = LineageRender.toDot(Seq(reader))
    def toMermaid: String = LineageRender.toMermaid(Seq(reader))
  }

  implicit final class SeqRenderOps[T](private val items: Seq[T]) {
    def toJson: String = LineageRender.toJson(items)
    def toDot: String = LineageRender.toDot(items)
    def toMermaid: String = LineageRender.toMermaid(items)
  }

  // -- validation check lifting --------------------------------------------
  implicit def curriedToCheck[T, A](f: T => A => Option[String]): ValidationCheck[T, A] =
    CurriedCheck(f)
  implicit def plainToCheck[T, A](f: A => Option[String]): ValidationCheck[T, A] =
    PlainCheck(f)
}
