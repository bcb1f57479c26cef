package graft.config

import scala.collection.mutable.ListBuffer

/**
 * Error-accumulating validation, mirroring the reference's
 * `FailureCollector` contract (reference `Lookup.java:411-428,461-527`):
 * every rule is checked and every violation recorded before a single
 * exception carrying all of them is thrown. Spark's own
 * `AnalysisException` is fail-fast; pipeline authors get much better
 * feedback when all config mistakes surface at once, so we keep the
 * reference's accumulate-then-throw shape.
 */
final case class ValidationFailure(
    message: String,
    correctiveAction: Option[String] = None,
    property: Option[String] = None) {
  override def toString: String = {
    val prop = property.map(p => s" [property: $p]").getOrElse("")
    val act = correctiveAction.map(a => s" $a").getOrElse("")
    s"$message$act$prop"
  }
}

final class ValidationException(val failures: List[ValidationFailure])
    extends RuntimeException(
      s"Errors were encountered during validation. ${failures.mkString("; ")}")

/** Accumulates failures; `getOrThrow` raises once with everything collected. */
final class FailureCollector {
  private val buf = ListBuffer.empty[ValidationFailure]

  def addFailure(message: String, correctiveAction: String = null,
      property: String = null): this.type = {
    buf += ValidationFailure(message, Option(correctiveAction), Option(property))
    this
  }

  def failures: List[ValidationFailure] = buf.toList
  def isEmpty: Boolean = buf.isEmpty

  /** Throw if any failure was collected (reference `collector.getOrThrowException()`). */
  def getOrThrow(): Unit =
    if (buf.nonEmpty) throw new ValidationException(buf.toList)
}
