package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic, cross-engine-replayable sketches. North-star extension
 * (SURVEY.md §2.3 Tier B): the reference has no aggregate surface at all
 * (`Lookup.java` is join-only), but a 100 TB pipeline lives on sketched
 * aggregates — distinct-count dashboards over corpus slices cannot afford
 * an exact `COUNT(DISTINCT)` shuffle of every value.
 *
 * Unlike Spark's built-in `approx_count_distinct` (whose HLL++ register
 * state is engine-internal and not reproducible elsewhere), this
 * HyperLogLog is built from *public arithmetic* — md5-derived 60-bit
 * hashes, integer register math, one final division — so the DuckDB
 * oracle replays the whole sketch bit-for-bit. Same philosophy as
 * `Sampling`: determinism is a feature at scale (a rerun, a different
 * engine, a different partitioning — same sketch, same estimate).
 *
 * Scale design (100 TB posture):
 *   - register extraction is a pure per-row codegen'd projection;
 *   - the only shuffle is `groupBy(keys, bucket).max(rank)` with map-side
 *     partial max — at most `groups × 2^p` rows cross the wire regardless
 *     of corpus size;
 *   - register tables are MERGEABLE state (element-wise max), so partial
 *     sketches from independent jobs/partitions combine without rescan —
 *     the property that makes sketches composable across a fleet.
 */
object Sketches {

  /** 60-bit hash: the first 15 hex chars of md5(value) parsed as an
    * integer. Public and engine-portable (DuckDB: CAST('0x'||substr AS
    * BIGINT)); 15 chars keeps the value comfortably inside a signed 64-bit
    * in both engines. */
  def hash60(value: Column): Column =
    conv(substring(md5(value.cast("string")), 1, 15), 16, 10).cast("long")

  /** HLL rank of the post-bucket bit string `w` of width `bits`:
    * position of the leftmost set bit from the top (leading zeros + 1),
    * `bits + 1` when w == 0. Integer-exact via the length of the binary
    * string — both engines' `bin()` drops leading zeros. */
  private def rank(w: Column, bits: Int): Column =
    when(w === 0, lit(bits + 1)).otherwise(lit(bits + 1) - length(bin(w)))

  /** The per-row (bucket, rank) pair feeding a p-bit HLL — public so the
    * streaming surface shares the exact same projection. */
  def bucketAndRank(value: Column, p: Int): (Column, Column) = {
    require(p >= 2 && p <= 16, s"p must be in [2,16], got $p")
    val h = hash60(value)
    (h.bitwiseAND(lit((1 << p) - 1L)), rank(shiftright(h, p), 60 - p))
  }

  /**
   * Per-group HLL register table: one row per (keys..., bucket) with the
   * max rank observed — the sketch's mergeable state.
   *
   * @param p log2 of the register count (m = 2^p registers per group)
   */
  def hllRegisters(df: DataFrame, keys: Seq[String], valueCol: String,
      p: Int = 4): DataFrame = {
    val (bucket, r) = bucketAndRank(col(valueCol), p)
    df.select((keys.map(col) :+ bucket.as("bucket") :+ r.as("r")): _*)
      .groupBy((keys.map(col) :+ col("bucket")): _*)
      .agg(max(col("r")).as("register"))
  }

  /** Merge two register tables for the same key space (element-wise max) —
    * how partial sketches from independent jobs combine. */
  def mergeRegisters(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    a.union(b)
      .groupBy((keys.map(col) :+ col("bucket")): _*)
      .agg(max(col("register")).as("register"))

  /**
   * Raw HLL distinct estimate per group from a register table:
   * `alpha_m * m^2 / sum_j 2^(-M_j)`.
   *
   * Integer-exact core: `s_int = sum_j 2^(maxRank - M_j)` (absent buckets
   * count as M_j = 0) is an exact BIGINT — max term 2^(61-p), times 2^p
   * registers stays under 2^62 — and the estimate is then a single
   * floating-point expression over exact integers, bit-identical across
   * engines. `v_zero` (empty-register count) is emitted so callers can
   * apply linear counting (`m * ln(m / v_zero)`) in the small-range
   * regime; it is not folded in here because `ln` is the one operation
   * whose last-ulp rounding the cross-engine contract cannot pin.
   */
  /** Standard HLL bias-correction constant for 2^p registers — public so
    * the SQL oracle generator interpolates the identical double. */
  def alpha(p: Int): Double = p match {
    case 4 => 0.673
    case 5 => 0.697
    case 6 => 0.709
    case _ => 0.7213 / (1.0 + 1.079 / (1 << p))
  }

  def approxDistinct(df: DataFrame, keys: Seq[String], valueCol: String,
      p: Int = 4): DataFrame = {
    val m = 1 << p
    val maxRank = 60 - p + 1
    // shiftleft by a column needs the SQL spelling (the Scala DSL only
    // accepts a literal shift amount)
    val term = expr(s"shiftleft(CAST(1 AS BIGINT), $maxRank - register)")
    hllRegisters(df, keys, valueCol, p)
      .groupBy(keys.map(col): _*)
      .agg(
        (sum(term) + (lit(m.toLong) - count(lit(1))) * lit(1L << maxRank)).as("s_int"),
        (lit(m.toLong) - count(lit(1))).as("v_zero"))
      .select((keys.map(col) :+ col("s_int") :+ col("v_zero") :+
        (lit(alpha(p) * m * m) * lit(math.pow(2.0, maxRank)) / col("s_int").cast("double"))
          .as("hll_estimate")): _*)
  }
}
