package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of (temporal) join: for each left row, attach the single right row
 * with the greatest `rightTime <= leftTime` for the same key — "the state
 * of the dimension as of the event time". Left rows with no qualifying
 * right row survive null-padded (left-outer semantics, like the Lookup
 * operator's E1). A training-data-pipeline staple the reference lacks
 * (SURVEY.md §2.2 lists as-of joins as absent); composed from Spark
 * built-ins per the extension preference order — no custom plan needed.
 *
 * Determinism: the picked row is unique only if `tieBreakCols` breaks
 * rightTime ties; callers pass a unique right column (e.g. the order key).
 *
 * Scale notes (100 TB posture): two formulations with identical output
 * (spec-pinned):
 *   - [[apply]]: equi-join on the key + per-left-row window pick. Cost is
 *     O(matching history per key) — every event is multiplied by its full
 *     eligible history before the pick. Simple, fine when history is
 *     shallow. The pick window partitions by (key, leftId), not leftId
 *     alone: HashPartitioning(key) from the join satisfies the clustered
 *     distribution on the superset, so the window REUSES the join's
 *     shuffle (local sort only, no second Exchange) — and with both
 *     sides bucketed on the key the whole plan runs with ZERO Exchange
 *     (spec-pinned in PlanContractSpec).
 *   - [[unionSorted]]: the merge formulation — union both sides tagged,
 *     ONE shuffle on the key, one window sort, forward-fill the latest
 *     right payload. Each row is materialized exactly once (no history
 *     multiplication), which is the deep-history scale path. Note that
 *     bucketing does NOT remove this formulation's Exchange: Union
 *     concatenates partitions rather than aligning them, so Spark
 *     reports UnknownPartitioning above it regardless of the inputs'
 *     layout — the bucketed zero-shuffle path is [[apply]].
 */
object AsOfJoin {

  /**
   * @param leftId unique left row id (window partition key for the pick;
   *               MUST be unique per left row — the window partitions by
   *               (leftKey, leftId), which is the same partition set as
   *               leftId alone exactly when leftId never repeats across
   *               keys)
   * @param rightCols right columns to attach, each (rightName, outputAlias)
   * @param tieBreakCols right columns that uniquify equal `rightTime` picks
   *                     (compared descending, after time)
   * @param maxStalenessMinutes as-of TOLERANCE (pandas `merge_asof
   *                     tolerance`): when set, a right row older than
   *                     this is never picked and the left row comes back
   *                     null-padded — "enrich with the latest price,
   *                     unless it's stale". The bound also SHRINKS the
   *                     join: the range condition cuts history
   *                     multiplication from O(full history) to
   *                     O(history within the window), which is the main
   *                     reason to set it at scale.
   * @param forward flip the direction (pandas `merge_asof
   *                     direction='forward'`): pick the EARLIEST right
   *                     row at or after the left time instead of the
   *                     latest at or before — "what happened next"
   *                     (error → next user action, order → first
   *                     shipment event). The staleness bound becomes a
   *                     forward window (`right <= left + m`), shrinking
   *                     the join the same way.
   */
  def apply(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      leftId: String,
      rightCols: Seq[(String, String)],
      tieBreakCols: Seq[String],
      maxStalenessMinutes: Option[Long] = None,
      forward: Boolean = false): DataFrame = {
    // Probe-side parallelism (r16 opt, guide §2.6): a one-row-group
    // parquet probe serializes the whole join+pick on one task when the
    // build side broadcasts; the conditional repartition is a no-op on
    // any input already split to >= cores (i.e. at scale). Batch only —
    // streaming plans size their own state partitioning.
    val l = (if (left.isStreaming) left
             else graft.SparkUtil.ensureProbeParallelism(left)).as("l")
    val r = right.as("r")
    val base = col(s"l.$leftKey") === col(s"r.$rightKey") &&
      (if (forward) col(s"r.$rightTime") >= col(s"l.$leftTime")
       else col(s"r.$rightTime") <= col(s"l.$leftTime"))
    val cond = maxStalenessMinutes.fold(base)(m =>
      if (forward)
        base && col(s"r.$rightTime") <=
          col(s"l.$leftTime") + expr(s"INTERVAL $m MINUTES")
      else
        base && col(s"r.$rightTime") >=
          col(s"l.$leftTime") - expr(s"INTERVAL $m MINUTES"))
    val joined = l.join(r, cond, "left_outer")
    // (key, leftId) partitioning: HashPartitioning(key) from the join
    // satisfies ClusteredDistribution(key, leftId), so no extra Exchange
    // is planned for the window — only a local sort.
    val timeOrd = if (forward) col(s"r.$rightTime").asc_nulls_last
      else col(s"r.$rightTime").desc_nulls_last
    val pick = Window.partitionBy(col(s"l.$leftKey"), col(s"l.$leftId"))
      .orderBy(
        (timeOrd +:
          tieBreakCols.map(c => col(s"r.$c").desc_nulls_last)): _*)
    joined
      .withColumn("__rn", row_number().over(pick))
      .filter(col("__rn") === 1)
      .select(left.columns.toSeq.map(c => col(s"l.$c")) ++
        rightCols.map { case (rc, alias) => col(s"r.$rc").as(alias) }: _*)
  }

  /**
   * Nearest-direction as-of (pandas `merge_asof direction='nearest'`):
   * the right row CLOSEST in time to each left row — before or after —
   * within a required tolerance window. Ties at equal absolute distance
   * break backward (the earlier right row), matching pandas; then the
   * declared tie-break columns descending. The tolerance is mandatory:
   * an unbounded nearest join would pull the entire per-key history
   * into every probe (the bound is what makes this an interval-sized
   * join, exactly the [[apply]] staleness argument on both sides).
   */
  def nearest(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      leftId: String,
      rightCols: Seq[(String, String)],
      tieBreakCols: Seq[String],
      toleranceMinutes: Long): DataFrame = {
    require(toleranceMinutes >= 1,
      s"toleranceMinutes=$toleranceMinutes must be >= 1")
    // same probe-side conditional repartition as [[apply]] (r16 opt)
    val l = (if (left.isStreaming) left
             else graft.SparkUtil.ensureProbeParallelism(left)).as("l")
    val r = right.as("r")
    val cond = col(s"l.$leftKey") === col(s"r.$rightKey") &&
      col(s"r.$rightTime") >=
        col(s"l.$leftTime") - expr(s"INTERVAL $toleranceMinutes MINUTES") &&
      col(s"r.$rightTime") <=
        col(s"l.$leftTime") + expr(s"INTERVAL $toleranceMinutes MINUTES")
    val joined = l.join(r, cond, "left_outer")
    val dist = abs(expr(s"unix_micros(r.$rightTime)") -
      expr(s"unix_micros(l.$leftTime)"))
    val pick = Window.partitionBy(col(s"l.$leftKey"), col(s"l.$leftId"))
      .orderBy(
        (dist.asc_nulls_last +: col(s"r.$rightTime").asc_nulls_last +:
          tieBreakCols.map(c => col(s"r.$c").desc_nulls_last)): _*)
    joined
      .withColumn("__rn", row_number().over(pick))
      .filter(col("__rn") === 1)
      .select(left.columns.toSeq.map(c => col(s"l.$c")) ++
        rightCols.map { case (rc, alias) => col(s"r.$rc").as(alias) }: _*)
  }

  /**
   * Merge formulation of the same as-of semantics: tag and union both
   * sides, sort each key's timeline once, and forward-fill the most
   * recent right payload onto every left row (`last(..., ignoreNulls)`
   * over an unbounded-preceding window). At equal timestamps the right
   * row sorts first (inclusive `<=`), and tie-break columns sort
   * ascending so the forward fill lands on the greatest — matching
   * [[apply]]'s (time desc, tiebreaks desc) pick exactly. Right rows
   * with null key or null time can never be picked by the join
   * formulation and are filtered before the union (null-key left rows
   * still pass through null-padded — E3-style semantics).
   */
  def unionSorted(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightCols: Seq[(String, String)],
      tieBreakCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.StructType
    val tbNames = tieBreakCols.map(c => s"__tb_$c")
    // The union lays both sides out over internal columns; an input that
    // already uses one of these names would collide into a confusing
    // duplicate-column analysis error downstream — fail fast instead.
    val reserved = Set("__k", "__t", "__side", "__p", "__fill") ++ tbNames
    val clashes = (left.columns ++ right.columns).filter(reserved).distinct
    require(clashes.isEmpty,
      s"asOfJoin.unionSorted reserves internal column names ${reserved.toSeq.sorted.mkString(", ")}; " +
        s"rename input column(s) ${clashes.mkString(", ")}")
    val payloadType = StructType(rightCols.map { case (rc, alias) =>
      org.apache.spark.sql.types.StructField(alias, right.schema(rc).dataType, nullable = true)
    }.toArray)
    val rSide = right
      .filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select((
        col(rightKey).as("__k") +: col(rightTime).as("__t") +: lit(0).as("__side") +:
          tieBreakCols.map(c => col(c).as(s"__tb_$c"))) ++
        Seq(struct(rightCols.map { case (rc, alias) => col(rc).as(alias) }: _*).as("__p")) ++
        left.columns.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val lSide = left
      .select((
        col(leftKey).as("__k") +: col(leftTime).as("__t") +: lit(1).as("__side") +:
          tieBreakCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__tb_$c"))) ++
        Seq(lit(null).cast(payloadType).as("__p")) ++
        left.columns.map(col): _*)
    val w = Window.partitionBy(col("__k"))
      .orderBy((col("__t").asc +: col("__side").asc +:
        tbNames.map(c => col(c).asc_nulls_first)): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rSide.unionByName(lSide)
      .withColumn("__fill", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.toSeq.map(col) ++
        rightCols.map { case (_, alias) => col("__fill").getField(alias).as(alias) }: _*)
  }
}
