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

  /**
   * Zone-map skip report: per storage shard, the min/max of a stat
   * column plus whether a range predicate `[lo, hi]` can prune the whole
   * shard — the decision a 100 TB scan makes from parquet footer stats
   * BEFORE reading a byte. `scanned = (v_max >= lo AND v_min <= hi)`;
   * `n_match` is the rows the predicate actually selects, so
   * `n - n_match` on scanned shards is the false-positive read cost the
   * layout is paying (high cost → the table wants a re-cluster on
   * `statCol`, see [[zorderBuckets]] / [[clusteringDepth]]).
   *
   * Spark shape: ONE hash aggregation over the bounded shard-id domain
   * with map-side partials (min/max/count/conditional-count are all
   * mergeable); the prune flag is a per-group projection. The corpus
   * never shuffles on anything wider than the shard id.
   */
  def zoneMapSkipReport(df: DataFrame, shard: Column, stat: Column,
      lo: Column, hi: Column): DataFrame =
    df.groupBy(shard.as("shard"))
      .agg(count(lit(1)).as("n"),
        min(stat).as("v_min"), max(stat).as("v_max"),
        count(when(stat >= lo && stat <= hi, 1)).as("n_match"))
      .withColumn("scanned", col("v_max") >= lo && col("v_min") <= hi)

  /**
   * Interval-stabbing depth profile over shard `[lo, hi]` key ranges:
   * for each boundary position, how many shards' ranges cover it — the
   * standard clustering-quality metric for a sorted/Z-ordered layout
   * (depth 1 everywhere = perfectly clustered, a point query touches one
   * file; depth ≈ #shards = unclustered, every point query touches every
   * file). Emits one row per distinct boundary with the depth holding
   * from that position until the next boundary.
   *
   * Sweep-line formulation: each interval contributes (+1 at `lo`,
   * −1 at `hi+1`); depth at a boundary is the running prefix sum in
   * position order. The input is METADATA-scale — one row per shard
   * (file-footer stats, ≤ ~10⁵ rows even at 100 TB) — so the
   * single-partition prefix-sum window is a bounded driver-adjacent
   * artifact, never a corpus-wide window.
   */
  /**
   * Skew-aware partition plan by SORTED ROUND-ROBIN: distinct keys
   * ranked by descending row count, key i → partition (i−1) mod P, then
   * a per-partition load report (rows, keys, heaviest key). Hash
   * partitioning sends whatever keys collide to the same reducer — a
   * hot key plus an unlucky neighbor overloads it; dealing keys out in
   * size order guarantees no partition carries two of the top-P keys,
   * which bounds the imbalance by one key's worth of rows around the
   * mean. The plan table is what a targeted `repartitionByRange`-style
   * rewrite or a custom Partitioner consumes.
   *
   * Spark shape: the corpus reduces to its (key, count) table first
   * (one map-side-partial agg, bounded by key cardinality); the rank
   * window runs over THAT — distinct keys, never corpus rows (the q138
   * treatment); the report is one agg over the bounded plan.
   */
  def balancedAssignment(df: DataFrame, keyCol: String,
      nParts: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nParts >= 1, s"nParts=$nParts must be >= 1")
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n"))
    val planned = counts.withColumn("part",
      (row_number().over(Window.orderBy(col("n").desc, col("key").asc))
        - 1) % nParts)
    planned.groupBy(col("part"))
      .agg(sum(col("n")).as("n_rows"), count(lit(1)).as("n_keys"),
        max(col("n")).as("top_key_rows"))
  }

  def clusteringDepth(shards: DataFrame, lo: Column, hi: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val events = shards.select(lo.cast("long").as("pos"), lit(1L).as("d"))
      .unionAll(shards.select((hi.cast("long") + 1L).as("pos"), lit(-1L).as("d")))
    events.groupBy(col("pos")).agg(sum(col("d")).as("delta"))
      .withColumn("depth",
        sum(col("delta")).over(Window.orderBy(col("pos"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("pos"), col("depth"))
  }
}
