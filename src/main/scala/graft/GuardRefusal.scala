package graft

/**
 * A DESIGNED at-scale guard refusal: the operator measured (or cheaply
 * bounded) its candidate/output volume, found it quadratic-dangerous at
 * this input size, and declined to build the plan. That is CORRECT
 * behavior — the guards exist precisely so a 100 TB pipeline fails loud
 * at plan time instead of melting a cluster — so tooling must be able
 * to tell it apart from a real failure.
 *
 * Subclasses IllegalArgumentException so every existing caller (and
 * `require`-style handling, plus the specs that intercept IAE) keeps
 * working unchanged. The dedicated type exists because Bench's
 * refused/failed split used to match on the broad IAE class, which
 * mis-filed genuine bugs that surface as IAEs in Spark/JDK library
 * paths (bad config, array/encoder argument errors) as designed
 * refusals and let a broken sweep exit 0 (ADVICE r15).
 */
class GuardRefusal(message: String) extends IllegalArgumentException(message)

object GuardRefusal {
  /** `require` analog for the designed at-scale guards: identical
    * contract, but the thrown type is [[GuardRefusal]] so the bench
    * ledger files it under `refused`, never `failed`. */
  def check(ok: Boolean, message: => String): Unit =
    if (!ok) throw new GuardRefusal(message)
}
