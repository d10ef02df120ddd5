package graft.core

import scala.concurrent.ExecutionContext

/** Reader monad for config injection: a deferred `R => A` with optional
  * metadata/lineage. Pipelines compose at the Reader level WITHOUT a config;
  * `provide(cfg)` materializes the concrete node graph.
  *
  * Behavior parity: `/root/reference/etl4s/src-2/Etl4s.scala:828-1150`.
  */
final case class Reader[R, A](
    run: R => A,
    metadata: Any = None,
    getLineage: Option[Lineage] = None
) {
  def map[B](g: A => B): Reader[R, B] = Reader(r => g(run(r)), metadata, getLineage)
  def flatMap[B](g: A => Reader[R, B]): Reader[R, B] =
    Reader(r => g(run(r)).run(r), metadata, getLineage)

  /** Apply the config, producing the wrapped value (usually a Node). */
  def provide(ctx: R): A = run(ctx)
  def provideContext(ctx: R): A = run(ctx)

  def withMetadata(meta: Any): Reader[R, A] = copy(metadata = meta)
  def withLineage(lin: Lineage): Reader[R, A] = copy(getLineage = Some(lin))

  def lineageName(name: String): Reader[R, A] =
    withLineage(getLineage.fold(Lineage(name))(_.copy(name = name)))

  def lineageInputs(in: String*): Reader[R, A] =
    withLineage(getLineage.fold(Lineage("", inputs = in.toList))(l =>
      l.copy(inputs = (l.inputs ++ in).distinct)
    ))

  def lineageOutputs(out: String*): Reader[R, A] =
    withLineage(getLineage.fold(Lineage("", outputs = out.toList))(l =>
      l.copy(outputs = (l.outputs ++ out).distinct)
    ))

  /** Attach a full lineage record in one call. */
  def lineage(
      inputs: List[String] = Nil,
      outputs: List[String] = Nil,
      upstreams: List[Any] = Nil,
      name: String = "",
      schedule: String = "",
      cluster: String = "",
      description: String = "",
      group: String = "",
      tags: List[String] = Nil,
      links: Map[String, String] = Map.empty
  ): Reader[R, A] = {
    val base = getLineage.getOrElse(Lineage(""))
    withLineage(
      Lineage(
        name = if (name.nonEmpty) name else base.name,
        inputs = (base.inputs ++ inputs).distinct,
        outputs = (base.outputs ++ outputs).distinct,
        upstreams = (base.upstreams ++ upstreams).distinct,
        schedule = if (schedule.nonEmpty) schedule else base.schedule,
        cluster = if (cluster.nonEmpty) cluster else base.cluster,
        description = if (description.nonEmpty) description else base.description,
        group = if (group.nonEmpty) group else base.group,
        tags = (base.tags ++ tags).distinct,
        links = base.links ++ links
      )
    )
  }
}

object Reader {
  def pure[R, A](a: A): Reader[R, A] = Reader(_ => a)
  def ask[R]: Reader[R, R] = Reader(r => r)
}

/** Evidence that two config requirements `T1`/`T2` unify into a single
  * environment `R` — Scala-2 flavor: identical types, or one a subtype of
  * the other (the reference's 2.13 encoding,
  * `etl4s/src-2/Etl4s.scala:753-791`).
  */
trait ReaderCompat[T1, T2, R] {
  def toT1(r: R): T1
  def toT2(r: R): T2
}

object ReaderCompat extends ReaderCompatSub1 {
  implicit def same[T]: ReaderCompat[T, T, T] =
    new ReaderCompat[T, T, T] {
      def toT1(r: T): T = r
      def toT2(r: T): T = r
    }
}

trait ReaderCompatSub1 extends ReaderCompatSub2 {
  implicit def leftNarrower[T1 <: T2, T2]: ReaderCompat[T1, T2, T1] =
    new ReaderCompat[T1, T2, T1] {
      def toT1(r: T1): T1 = r
      def toT2(r: T1): T2 = r
    }
}

trait ReaderCompatSub2 {
  implicit def rightNarrower[T1, T2 <: T1]: ReaderCompat[T1, T2, T2] =
    new ReaderCompat[T1, T2, T2] {
      def toT1(r: T2): T1 = r
      def toT2(r: T2): T2 = r
    }
}

/** Composition operators lifted to config-dependent nodes. */
final class ReaderNodeOps[T1, A, B](private val fa: Reader[T1, Node[A, B]]) {

  private def seqLin(other: Option[Lineage]): Option[Lineage] =
    Node.mergeLineage(fa.getLineage, other, sequential = true)
  private def parLin(other: Option[Lineage]): Option[Lineage] =
    Node.mergeLineage(fa.getLineage, other, sequential = false)

  // -- sequential ----------------------------------------------------------
  def ~>[C](fb: Reader[T1, Node[B, C]]): Reader[T1, Node[A, C]] =
    Reader((t: T1) => fa.run(t) ~> fb.run(t), getLineage = seqLin(fb.getLineage))

  def ~>[T2, C, R](fb: Reader[T2, Node[B, C]])(implicit
      compat: ReaderCompat[T1, T2, R]
  ): Reader[R, Node[A, C]] =
    Reader((r: R) => fa.run(compat.toT1(r)) ~> fb.run(compat.toT2(r)),
      getLineage = seqLin(fb.getLineage))

  def ~>[C](node: Node[B, C]): Reader[T1, Node[A, C]] =
    Reader((t: T1) => fa.run(t) ~> node, getLineage = seqLin(node.getLineage))

  // -- fan-out (sequential) ------------------------------------------------
  def &[C](fb: Reader[T1, Node[A, C]])(implicit
      ta: TupleAppend[B, C]
  ): Reader[T1, Node[A, ta.Out]] =
    Reader((t: T1) => fa.run(t).&(fb.run(t))(ta), getLineage = parLin(fb.getLineage))

  def &[T2, C, R](fb: Reader[T2, Node[A, C]])(implicit
      compat: ReaderCompat[T1, T2, R],
      ta: TupleAppend[B, C]
  ): Reader[R, Node[A, ta.Out]] =
    Reader((r: R) => fa.run(compat.toT1(r)).&(fb.run(compat.toT2(r)))(ta),
      getLineage = parLin(fb.getLineage))

  def &[C](node: Node[A, C])(implicit
      ta: TupleAppend[B, C]
  ): Reader[T1, Node[A, ta.Out]] =
    Reader((t: T1) => fa.run(t).&(node)(ta), getLineage = parLin(node.getLineage))

  // -- fan-out (concurrent) ------------------------------------------------
  def &>[C](fb: Reader[T1, Node[A, C]])(implicit
      ec: ExecutionContext,
      ta: TupleAppend[B, C]
  ): Reader[T1, Node[A, ta.Out]] =
    Reader((t: T1) => fa.run(t).&>(fb.run(t))(ec, ta), getLineage = parLin(fb.getLineage))

  def &>[T2, C, R](fb: Reader[T2, Node[A, C]])(implicit
      ec: ExecutionContext,
      compat: ReaderCompat[T1, T2, R],
      ta: TupleAppend[B, C]
  ): Reader[R, Node[A, ta.Out]] =
    Reader((r: R) => fa.run(compat.toT1(r)).&>(fb.run(compat.toT2(r)))(ec, ta),
      getLineage = parLin(fb.getLineage))

  def &>[C](node: Node[A, C])(implicit
      ec: ExecutionContext,
      ta: TupleAppend[B, C]
  ): Reader[T1, Node[A, ta.Out]] =
    Reader((t: T1) => fa.run(t).&>(node)(ec, ta), getLineage = parLin(node.getLineage))

  // -- sequencing ----------------------------------------------------------
  def >>[C](fb: Reader[T1, Node[A, C]]): Reader[T1, Node[A, C]] =
    Reader((t: T1) => fa.run(t) >> fb.run(t), getLineage = parLin(fb.getLineage))

  def >>[T2, C, R](fb: Reader[T2, Node[A, C]])(implicit
      compat: ReaderCompat[T1, T2, R]
  ): Reader[R, Node[A, C]] =
    Reader((r: R) => fa.run(compat.toT1(r)) >> fb.run(compat.toT2(r)),
      getLineage = parLin(fb.getLineage))

  def >>[C](node: Node[A, C]): Reader[T1, Node[A, C]] =
    Reader((t: T1) => fa.run(t) >> node, getLineage = parLin(node.getLineage))

  /** Context-aware side-effect peek. */
  def tap(g: T1 => B => Any): Reader[T1, Node[A, B]] =
    Reader((t: T1) => fa.run(t).tap(g(t)), fa.metadata, fa.getLineage)
}

/** Mix-in giving a module object config-scoped factories:
  * {{{
  * case class Cfg(path: String)
  * object MyJob extends graft.core.Context[Cfg] {
  *   val read = Context.Extract[Unit, DataFrame](cfg => _ => spark.read.parquet(cfg.path))
  * }
  * }}}
  */
trait Context[T] {
  object Context {
    def Extract[A, B](f: T => A => B): Reader[T, graft.core.Node[A, B]] =
      graft.core.Node.requires(f)
    def Transform[A, B](f: T => A => B): Reader[T, graft.core.Node[A, B]] =
      graft.core.Node.requires(f)
    def Load[A, B](f: T => A => B): Reader[T, graft.core.Node[A, B]] =
      graft.core.Node.requires(f)
    def Pipeline[A, B](f: T => A => B): Reader[T, graft.core.Node[A, B]] =
      graft.core.Node.requires(f)
    def Node[A, B](f: T => A => B): Reader[T, graft.core.Node[A, B]] =
      graft.core.Node.requires(f)
    def tap[A](f: T => A => Any): Reader[T, graft.core.Node[A, A]] =
      Reader(ctx => graft.core.Node { (a: A) => f(ctx)(a); a })
  }
}
