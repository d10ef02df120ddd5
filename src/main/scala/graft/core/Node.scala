package graft.core

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import scala.util.Try

/** A reified function `A => B` — the unit of pipeline composition.
  *
  * Everything else in the algebra (`~>`, `&`, `&>`, `>>`, branching,
  * validation, retry) builds new `Node`s out of old ones; nothing executes
  * until one of the run methods is called. When the payload is a Spark
  * `DataFrame`/`Dataset`, composition assembles a logical plan and the run
  * methods are where actions fire.
  *
  * Behavior parity with the reference `Node` trait
  * (`/root/reference/etl4s/src-2/Etl4s.scala:33-645`); re-designed here as an
  * immutable case class over a mutable-collector Trace runtime.
  */
final class Node[A, B](
    val f: A => B,
    val metadata: Any = None,
    val getLineage: Option[Lineage] = None
) {

  /** Run as a plain function — no trace, no telemetry scope. */
  def apply(a: A): B = f(a)

  // ---------------------------------------------------------------- running

  private def traced[T](tel: GraftTelemetry)(block: Trace.Collector => T): T = {
    val install = tel ne NoOpTelemetry
    if (install) Tel.setProvider(tel)
    try Trace.scoped(block)
    finally if (install) Tel.clearProvider()
  }

  /** Run inside a fresh trace scope; throws whatever `f` throws. */
  def unsafeRun(a: A)(implicit tel: GraftTelemetry = NoOpTelemetry): B =
    traced(tel)(_ => f(a))

  /** Run a `Node[Any, B]` with no input. */
  def unsafeRun()(implicit ev: A =:= Any): B =
    unsafeRun(().asInstanceOf[A])(NoOpTelemetry)

  /** Run inside a fresh trace scope, capturing failure as `Failure`. */
  def safeRun(a: A)(implicit tel: GraftTelemetry = NoOpTelemetry): Try[B] =
    traced(tel)(_ => Try(f(a)))

  def safeRun()(implicit ev: A =:= Any): Try[B] =
    safeRun(().asInstanceOf[A])(NoOpTelemetry)

  /** Run and return the full [[Trace]]: result + logs + errors + timing +
    * telemetry collected by any node in the pipeline.
    */
  def unsafeRunTrace(a: A)(implicit tel: GraftTelemetry = NoOpTelemetry): Trace[B] =
    traced(tel) { c =>
      val result = f(a)
      Trace(
        result = result,
        logs = c.logs.toList,
        timeElapsedMillis = System.currentTimeMillis() - c.startTime,
        errors = c.errors.toList,
        telemetry = c.telemetry
      )
    }

  def unsafeRunTrace()(implicit ev: A =:= Any): Trace[B] =
    unsafeRunTrace(().asInstanceOf[A])(NoOpTelemetry)

  /** Like [[unsafeRunTrace]] but failure-safe: telemetry collected up to the
    * failure point is still returned.
    */
  def safeRunTrace(a: A)(implicit tel: GraftTelemetry = NoOpTelemetry): Trace[Try[B]] =
    traced(tel) { c =>
      val result = Try(f(a))
      Trace(
        result = result,
        logs = c.logs.toList,
        timeElapsedMillis = System.currentTimeMillis() - c.startTime,
        errors = c.errors.toList,
        telemetry = c.telemetry
      )
    }

  def safeRunTrace()(implicit ev: A =:= Any): Trace[Try[B]] =
    safeRunTrace(().asInstanceOf[A])(NoOpTelemetry)

  // ------------------------------------------------------------ composition

  private def seqLineage(other: Option[Lineage]): Option[Lineage] =
    Node.mergeLineage(getLineage, other, sequential = true)
  private def parLineage(other: Option[Lineage]): Option[Lineage] =
    Node.mergeLineage(getLineage, other, sequential = false)

  /** Sequential composition: feed this node's output into `next`. */
  def ~>[C](next: Node[B, C]): Node[A, C] =
    new Node[A, C](a => next.f(f(a)), None, seqLineage(next.getLineage))

  /** Alias for `~>`. */
  def andThen[C](next: Node[B, C]): Node[A, C] = this ~> next

  /** Sequential composition into a config-dependent node. */
  def ~>[T, C](next: Reader[T, Node[B, C]]): Reader[T, Node[A, C]] =
    next.map(n => this ~> n).copy(getLineage = seqLineage(next.getLineage))

  /** Sequencing: run this node for its effect, then run `next` on the SAME
    * input; keep the second result.
    */
  def >>[C](next: Node[A, C]): Node[A, C] =
    new Node[A, C]({ a => f(a); next.f(a) }, None, parLineage(next.getLineage))

  def >>[T, C](next: Reader[T, Node[A, C]]): Reader[T, Node[A, C]] =
    next.map(n => this >> n).copy(getLineage = parLineage(next.getLineage))

  /** Fan-out: run both nodes on the same input (sequentially, left first)
    * and return the flat tuple of results.
    */
  def &[C](that: Node[A, C])(implicit ta: TupleAppend[B, C]): Node[A, ta.Out] =
    new Node[A, ta.Out](
      a => ta.append(f(a), that.f(a)),
      None,
      parLineage(that.getLineage)
    )

  def &[T, C](that: Reader[T, Node[A, C]])(implicit
      ta: TupleAppend[B, C]
  ): Reader[T, Node[A, ta.Out]] =
    that.map(n => this.&(n)(ta)).copy(getLineage = parLineage(that.getLineage))

  /** Concurrent fan-out: both nodes run on `Future`s, result tuple is flat.
    * Note: the Trace ThreadLocal does NOT follow into the futures (reference
    * parity); prefer `&` for Spark stages — Spark already parallelizes.
    */
  def &>[C](that: Node[A, C])(implicit
      ec: ExecutionContext,
      ta: TupleAppend[B, C]
  ): Node[A, ta.Out] =
    new Node[A, ta.Out](
      { a =>
        // blocking{}: node bodies are typically blocking Spark actions —
        // mark them so a bounded shared pool (the usual global EC) grows
        // instead of deadlocking/serializing nested fan-outs (ADVICE r15).
        val fb = Future(scala.concurrent.blocking(f(a)))
        val fc = Future(scala.concurrent.blocking(that.f(a)))
        val (b, c) = Await.result(fb.zip(fc), Duration.Inf)
        ta.append(b, c)
      },
      None,
      parLineage(that.getLineage)
    )

  def &>[T, C](that: Reader[T, Node[A, C]])(implicit
      ec: ExecutionContext,
      ta: TupleAppend[B, C]
  ): Reader[T, Node[A, ta.Out]] =
    that.map(n => this.&>(n)(ec, ta)).copy(getLineage = parLineage(that.getLineage))

  /** Post-transform the output with a plain function. */
  def map[C](g: B => C): Node[A, C] = Node(a => g(f(a)))

  /** Data-dependent continuation: pick the next node from this node's
    * output, then run it on the ORIGINAL input.
    */
  def flatMap[C](g: B => Node[A, C]): Node[A, C] =
    Node(a => g(f(a)).f(a))

  /** Side-effect peek on the output; passes it through unchanged. */
  def tap(g: B => Any): Node[A, B] =
    Node { a =>
      val b = f(a)
      g(b)
      b
    }

  /** Recover from any `Throwable` with a fallback. */
  def onFailure[BB >: B](handler: Throwable => BB): Node[A, BB] =
    Node { a =>
      try f(a)
      catch { case t: Throwable => handler(t) }
    }

  /** Retry with exponential backoff (defaults: 3 attempts, 100 ms, ×2). */
  def withRetry(
      maxAttempts: Int = 3,
      initialDelayMs: Long = 100,
      backoffFactor: Double = 2.0
  ): Node[A, B] =
    Node { a =>
      @annotation.tailrec
      def go(left: Int, delayMs: Long): B =
        Try(f(a)) match {
          case scala.util.Success(b) => b
          case scala.util.Failure(_) if left > 1 =>
            Thread.sleep(delayMs)
            go(left - 1, (delayMs * backoffFactor).toLong)
          case scala.util.Failure(t) => throw t
        }
      go(maxAttempts, initialDelayMs)
    }

  /** Run on a `Future`. */
  def runAsync(implicit ec: ExecutionContext): A => Future[B] =
    a => Future(f(a))

  /** Flatten a left-nested tuple output into one flat tuple. */
  def zip[BB >: B, Out](implicit fl: Flatten.Aux[BB, Out]): Node[A, Out] =
    Node(a => fl(f(a)))

  // ---------------------------------------------------- config / metadata

  /** Lift into a config-dependent node, replacing the wrapped function with
    * one built from the config.
    */
  def requires[T](g: T => A => B): Reader[T, Node[A, B]] =
    Reader(t => Node(g(t)))

  def withMetadata(meta: Any): Node[A, B] = new Node(f, meta, getLineage)

  def withLineage(lin: Lineage): Node[A, B] = new Node(f, metadata, Some(lin))

  def lineageName(name: String): Node[A, B] =
    withLineage(getLineage.fold(Lineage(name))(_.copy(name = name)))

  def lineageInputs(in: String*): Node[A, B] =
    withLineage(getLineage.fold(Lineage("", inputs = in.toList))(l =>
      l.copy(inputs = (l.inputs ++ in).distinct)
    ))

  def lineageOutputs(out: String*): Node[A, B] =
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
  ): Node[A, B] = {
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

object Node {

  /** Wrap a function. */
  def apply[A, B](func: A => B): Node[A, B] = new Node[A, B](func)

  /** Lazy by-name value node; nothing happens until run. */
  def apply[B](value: => B): Node[Any, B] = new Node[Any, B](_ => value)

  def identity[A]: Node[A, A] = Node((a: A) => a)
  def unit[B](value: => B): Node[Unit, B] = Node((_: Unit) => value)
  def effect(action: => Unit): Node[Unit, Unit] = Node((_: Unit) => action)
  def pure[A, B](b: B): Node[A, B] = Node((_: A) => b)

  def requires[T, A, B](f: T => A => B): Reader[T, Node[A, B]] =
    Reader(t => Node(f(t)))

  private[core] def mergeLineage(
      a: Option[Lineage],
      b: Option[Lineage],
      sequential: Boolean
  ): Option[Lineage] = (a, b) match {
    case (Some(x), Some(y)) => Some(if (sequential) x.chain(y) else x.combine(y))
    case (Some(x), None) => Some(x)
    case (None, Some(y)) => Some(y)
    case _ => None
  }
}
