package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Interval (range) join: every (left, right) pair with equal keys whose
 * right timestamp falls in `[leftTime - lookback, leftTime]` — the
 * row-multiplying sibling of [[AsOfJoin]] (which keeps only the latest
 * match). "All orders in the week before each event"-shaped enrichment.
 *
 * Scale design (100 TB posture): the join condition carries an equi-key,
 * so Catalyst plans a hash-partitioned equi-join with the range bounds as
 * a post-join filter — one shuffle on the key, never a cross join. Skewed
 * keys → `SparkUtil.saltedJoin` the equi part, or AQE skew handling.
 *
 * The same condition is the canonical Structured Streaming stream-stream
 * join: [[streaming]] adds the watermarks both sides need for state
 * eviction (each side buffers only `watermark + lookback` of history).
 */
object IntervalJoin {

  def apply(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      lookback: String = "7 days"): DataFrame = {
    // Probe-side parallelism (r16 opt, guide §2.6): when the history side
    // broadcasts, a one-row-group probe runs the whole range join on one
    // task; the conditional repartition is a no-op at scale and is
    // skipped for streaming plans (the [[streaming]] wrapper), whose
    // state partitioning the engine owns.
    val l = if (left.isStreaming) left
      else graft.SparkUtil.ensureProbeParallelism(left)
    l.join(right,
      l(leftKey) === right(rightKey) &&
        right(rightTime) >= l(leftTime) - expr(s"INTERVAL $lookback") &&
        right(rightTime) <= l(leftTime))
  }

  /**
   * Time-bucketed variant with IDENTICAL output (spec- and oracle-pinned
   * against [[apply]]): the equi-key becomes (key, time_bucket) with
   * bucket width = lookback, so one hyperactive key's history no longer
   * funnels through a single task — each (key, bucket) pair is its own
   * shuffle key, bounding per-task work by one lookback window of one
   * key instead of one key's whole lifetime. The standard composite-key
   * answer to *temporal* skew (a key hot for years); a key hot WITHIN a
   * single window still needs `SparkUtil.saltedJoin`/AQE.
   *
   * Construction: a right row at time S matches a left row at time T iff
   * `S ∈ [T-L, T]`, and with bucket width exactly L that means
   * `bucket(S) ∈ {bucket(T)-1, bucket(T)}` — so the left side explodes
   * into its two probe buckets (2× the SMALL side of the multiplication,
   * never the history side) and each qualifying pair matches in exactly
   * one bucket: no dedup pass needed. Buckets use floor division of
   * epoch microseconds, correct for pre-1970 timestamps too.
   *
   * `lookback` must be a day-time interval (months are calendar-
   * ambiguous and cannot define a fixed bucket width).
   */
  def bucketed(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      lookback: String = "7 days"): DataFrame = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(lookback))
    require(iv.months == 0,
      s"bucketed interval join needs a fixed-width day-time lookback, got '$lookback'")
    val micros = iv.days * 86400000000L + iv.microseconds
    require(micros > 0, s"lookback must be positive, got '$lookback'")
    val reserved = Seq("__lb", "__rb")
    val clashes = (left.columns ++ right.columns).filter(reserved.contains).distinct
    require(clashes.isEmpty,
      s"bucketed interval join reserves column names ${reserved.mkString(", ")}; " +
        s"rename input column(s) ${clashes.mkString(", ")}")
    def bucket(t: org.apache.spark.sql.Column) = {
      val us = unix_micros(t)
      // floor division (correct for negatives too); the cast keeps the
      // join key integral — `/` alone would yield a double and wrap the
      // shuffle keys in float-normalization
      ((us - pmod(us, lit(micros))) / lit(micros)).cast("long")
    }
    // same probe-side conditional repartition as [[apply]] (r16 opt) —
    // applied BEFORE the 2× probe-bucket explode so the explode output
    // is spread too
    val l0 = if (left.isStreaming) left
      else graft.SparkUtil.ensureProbeParallelism(left)
    val l = l0.withColumn("__lb",
      explode(array(bucket(l0(leftTime)) - 1, bucket(l0(leftTime)))))
    val r = right.withColumn("__rb", bucket(right(rightTime)))
    l.join(r,
        l(leftKey) === r(rightKey) && l("__lb") === r("__rb") &&
          r(rightTime) >= l(leftTime) - expr(s"INTERVAL $lookback") &&
          r(rightTime) <= l(leftTime))
      .drop("__lb", "__rb")
  }

  /** Stream-stream variant: watermarks bound both join-state buffers. */
  def streaming(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      lookback: String = "10 minutes", watermark: String = "1 hour"): DataFrame =
    apply(left.withWatermark(leftTime, watermark),
      right.withWatermark(rightTime, watermark),
      leftKey, rightKey, leftTime, rightTime, lookback)
}
