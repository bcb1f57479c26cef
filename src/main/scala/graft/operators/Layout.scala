package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Data-layout planning via space-filling curves. North-star extension
 * (SURVEY.md §2.3 Tier B): at 100 TB the dominant cost of a multi-
 * dimensional workload (point lookups by entity AND time-range scans) is
 * how files are laid out, and Z-ordering — interleaving the bits of the
 * two access dimensions into one sort key — is the standard answer
 * (Delta/Iceberg `OPTIMIZE ZORDER BY`). This module computes the Morton
 * key and the resulting bucket occupancy report; the write itself is
 * `repartitionByRange(z)` + [[graft.sources.IO.writePartitioned]].
 *
 * Everything is integer bit arithmetic (`>>`, `&`, `<<`, `|`) — exact on
 * both engines, no hash, no float — so the layout decision is
 * bit-identically replayable by the SQL oracle.
 */
object Layout {

  /** Morton (Z-order) interleave of the low `bits` bits of x and y:
    * x occupies even bit positions, y odd. Pure per-row codegen'd
    * column — zero shuffle. */
  def mortonKey(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 16, s"bits=$bits must be in [1, 16]")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /**
   * Z-order bucket occupancy report for an event stream laid out on
   * (entity, hour): per target file bucket — the top `2·bits −
   * bucketShift` bits of the Morton key — row count, Z-key range, and
   * distinct-entity count. Read it to size the layout BEFORE the
   * expensive rewrite: near-uniform `n` across buckets means the
   * interleave is balancing entity skew against time locality; a
   * distinct-entity count near `n` in every bucket means entity point
   * reads will touch few files.
   *
   * Spark shape: the Morton key is a narrow codegen'd projection; the
   * report is ONE hash aggregation over at most `2^(2·bits −
   * bucketShift)` groups with map-side partials. The corpus never
   * shuffles on anything wider than the bounded bucket id.
   */
  def zorderBuckets(events: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ts", bits: Int = 8, bucketShift: Int = 10): DataFrame = {
    require(bucketShift >= 0 && bucketShift < 2 * bits,
      s"bucketShift=$bucketShift must be in [0, ${2 * bits})")
    val mask = (1L << bits) - 1L
    val x = col(keyCol).cast("long").bitwiseAND(lit(mask))
    val y = expr(s"unix_micros($tsCol) div 3600000000").bitwiseAND(lit(mask))
    val z = mortonKey(x, y, bits)
    events.select(col(keyCol), z.as("__z"))
      .groupBy(shiftright(col("__z"), bucketShift).as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("__z")).as("z_min"), max(col("__z")).as("z_max"),
        count_distinct(col(keyCol)).as("n_keys"))
  }
}
