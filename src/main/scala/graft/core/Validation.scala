package graft.core

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** A validation check usable in `Reader.ensure`: either config-aware
  * (curried) or plain. (Reference parity: `etl4s/src/Core.scala:17-33`.)
  */
sealed trait ValidationCheck[T, A] {
  def toCurried: T => A => Option[String]
}

final case class CurriedCheck[T, A](f: T => A => Option[String]) extends ValidationCheck[T, A] {
  def toCurried: T => A => Option[String] = f
}

final case class PlainCheck[T, A](f: A => Option[String]) extends ValidationCheck[T, A] {
  def toCurried: T => A => Option[String] = _ => f
}

/** Runtime data-quality assertions on nodes. All checks for a stage are
  * evaluated (errors accumulate); on failure the aggregated message is
  * recorded to the Trace and a [[ValidationException]] thrown. `*Warn`
  * variants log to the Trace instead of throwing. `*Par` variants evaluate
  * each stage's checks concurrently — for Spark payloads that means
  * concurrent driver actions (use a FAIR pool).
  *
  * Behavior parity: `etl4s/src-2/Etl4s.scala:2017-2210`.
  */
object Validation {

  private[core] def collect[V](
      checks: Seq[V => Option[String]],
      value: V,
      parallel: Boolean
  )(implicit ec: ExecutionContext): Seq[String] =
    if (parallel)
      Await
        .result(Future.sequence(checks.map(c => Future(c(value)))), Duration.Inf)
        .flatten
    else checks.flatMap(_(value))

  private[core] def failed(stage: String, errors: Seq[String]): Nothing = {
    val msg = s"$stage validation failed:\n${errors.map(e => s"  - $e").mkString("\n")}"
    Trace.error(msg)
    throw new ValidationException(msg)
  }

  private[core] def warned(stage: String, errors: Seq[String]): Unit =
    Trace.log(s"$stage validation warning:\n${errors.map(e => s"  - $e").mkString("\n")}")
}

/** `ensure*` combinators on plain nodes. */
final class NodeEnsureOps[A, B](private val node: Node[A, B]) {
  import Validation._

  private def guarded(
      input: Seq[A => Option[String]],
      output: Seq[B => Option[String]],
      change: Seq[((A, B)) => Option[String]],
      parallel: Boolean,
      warnOnly: Boolean
  )(implicit ec: ExecutionContext): Node[A, B] =
    if (input.isEmpty && output.isEmpty && change.isEmpty) node
    else
      Node { a =>
        def stage[V](checks: Seq[V => Option[String]], v: V, label: String): Unit =
          if (checks.nonEmpty) {
            val errors = collect(checks, v, parallel)
            if (errors.nonEmpty) {
              if (warnOnly) warned(label, errors) else failed(label, errors)
            }
          }
        stage(input, a, "Input")
        val b = node.f(a)
        stage(output, b, "Output")
        stage(change, (a, b), "Change")
        b
      }

  def ensure(
      input: Seq[A => Option[String]] = Nil,
      output: Seq[B => Option[String]] = Nil,
      change: Seq[((A, B)) => Option[String]] = Nil
  ): Node[A, B] =
    guarded(input, output, change, parallel = false, warnOnly = false)(
      ExecutionContext.global
    )

  def ensurePar(
      input: Seq[A => Option[String]] = Nil,
      output: Seq[B => Option[String]] = Nil,
      change: Seq[((A, B)) => Option[String]] = Nil
  )(implicit ec: ExecutionContext = ExecutionContext.global): Node[A, B] =
    guarded(input, output, change, parallel = true, warnOnly = false)

  def ensureWarn(
      input: Seq[A => Option[String]] = Nil,
      output: Seq[B => Option[String]] = Nil,
      change: Seq[((A, B)) => Option[String]] = Nil
  ): Node[A, B] =
    guarded(input, output, change, parallel = false, warnOnly = true)(
      ExecutionContext.global
    )

  def ensureParWarn(
      input: Seq[A => Option[String]] = Nil,
      output: Seq[B => Option[String]] = Nil,
      change: Seq[((A, B)) => Option[String]] = Nil
  )(implicit ec: ExecutionContext = ExecutionContext.global): Node[A, B] =
    guarded(input, output, change, parallel = true, warnOnly = true)
}

/** Config-aware `ensure` on Reader-wrapped nodes; plain checks lift
  * automatically via the implicit conversions in the package object.
  */
final class ReaderEnsureOps[T, A, B](private val fa: Reader[T, Node[A, B]]) {
  import Validation._

  private def guarded(
      input: Seq[ValidationCheck[T, A]],
      output: Seq[ValidationCheck[T, B]],
      change: Seq[ValidationCheck[T, (A, B)]],
      warnOnly: Boolean
  ): Reader[T, Node[A, B]] =
    if (input.isEmpty && output.isEmpty && change.isEmpty) fa
    else
      Reader { ctx =>
        val node = fa.run(ctx)
        Node { a =>
          def stage[V](checks: Seq[ValidationCheck[T, V]], v: V, label: String): Unit =
            if (checks.nonEmpty) {
              val errors = checks.flatMap(_.toCurried(ctx)(v))
              if (errors.nonEmpty) {
                if (warnOnly) warned(label, errors) else failed(label, errors)
              }
            }
          stage(input, a, "Input")
          val b = node.f(a)
          stage(output, b, "Output")
          stage(change, (a, b), "Change")
          b
        }
      }

  def ensure(
      input: Seq[ValidationCheck[T, A]] = Nil,
      output: Seq[ValidationCheck[T, B]] = Nil,
      change: Seq[ValidationCheck[T, (A, B)]] = Nil
  ): Reader[T, Node[A, B]] = guarded(input, output, change, warnOnly = false)

  def ensureWarn(
      input: Seq[ValidationCheck[T, A]] = Nil,
      output: Seq[ValidationCheck[T, B]] = Nil,
      change: Seq[ValidationCheck[T, (A, B)]] = Nil
  ): Reader[T, Node[A, B]] = guarded(input, output, change, warnOnly = true)
}
