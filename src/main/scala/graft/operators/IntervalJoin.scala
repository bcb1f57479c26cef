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
      lookback: String = "7 days"): DataFrame =
    left.join(right,
      left(leftKey) === right(rightKey) &&
        right(rightTime) >= left(leftTime) - expr(s"INTERVAL $lookback") &&
        right(rightTime) <= left(leftTime))

  /** Stream-stream variant: watermarks bound both join-state buffers. */
  def streaming(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      lookback: String = "10 minutes", watermark: String = "1 hour"): DataFrame =
    apply(left.withWatermark(leftTime, watermark),
      right.withWatermark(rightTime, watermark),
      leftKey, rightKey, leftTime, rightTime, lookback)
}
