package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Generic table profiler — the data-quality fact sheet (row count, null
 * count, exact distinct count, min/max) per column, emitted long-form
 * (one row per column) so the result is a table a pipeline can diff
 * between corpus versions. North-star extension (SURVEY.md §2.3 Tier B;
 * every ingestion step of a training-data pipeline starts with this).
 *
 * Spark shape: one aggregation branch PER COLUMN, unioned. The tempting
 * alternative — every statistic in a single `agg` — plans multiple exact
 * count-distincts as an Expand whose partial aggregate keys on the tuple
 * of ALL profiled columns: on high-cardinality columns that first-stage
 * hash agg approaches a full-table distinct (measured 10 s vs < 1 s on
 * the sf0.1 lineitem). Per-column branches instead scan a SINGLE pruned
 * parquet column each (columnar formats make this nearly free), plan the
 * distinct as the standard two-phase agg bounded by that column's
 * cardinality, and shuffle only scalars plus distinct values. For
 * very wide profiles at 100 TB, swap `count_distinct` for
 * `approx_count_distinct` (HLL) and branches can re-merge into one pass.
 */
object Profiler {

  /** Profile `cols` of `df`: one output row per column with
    * (column_name, n_rows, n_nulls, n_distinct, min_value, max_value);
    * min/max are cast to string so heterogeneous column types share one
    * schema, exactly as the SQL oracle spells it. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    cols.map { c =>
      df.select(col(c)).agg(
          count(lit(1)).as("n_rows"),
          (count(lit(1)) - count(col(c))).as("n_nulls"),
          count_distinct(col(c)).as("n_distinct"),
          min(col(c)).cast("string").as("min_value"),
          max(col(c)).cast("string").as("max_value"))
        .select(lit(c).as("column_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_value"), col("max_value"))
    }.reduce(_ unionAll _)
  }

  /**
   * Corpus snapshot diff — the CDC audit between two corpus versions:
   * every id classified as `added` (new only), `removed` (old only),
   * `changed` (both sides, content hash differs) or `unchanged`. The
   * per-doc verdict table is what an incremental pipeline consumes
   * (reprocess exactly the added+changed set); `GROUP BY status` of it
   * is the one-line release note.
   *
   * Spark shape: each side reduces to (id, md5) — a narrow codegen'd
   * projection, the text column never leaves the scan stage — then ONE
   * full-outer equi-join on the id and a CASE verdict. At 100 TB the
   * only shuffle is that join's hash partitioning on the id; snapshots
   * written id-bucketed (`IO.writeBucketed`) join with zero Exchange.
   * md5 (128-bit) makes a false "unchanged" astronomically unlikely and
   * is exactly replayable by the SQL oracle.
   */
  def corpusDiff(oldDf: DataFrame, newDf: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val a = oldDf.select(col(idCol), md5(col(textCol)).as("__ha"))
    val b = newDf.select(col(idCol), md5(col(textCol)).as("__hb"))
    a.join(b, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__ha").isNull, "added")
          .when(col("__hb").isNull, "removed")
          .when(col("__ha") === col("__hb"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /**
   * Join-key skew report — the diagnostic run before choosing a join
   * strategy (plain vs salted vs broadcast): the `topK` hottest keys
   * with their frequency, share of the table, and ratio to the median
   * key frequency. A `skew_vs_median` in the hundreds says the plain
   * hash join will stall on one reducer and `SparkUtil.saltedJoin` (or
   * AQE skew split) is warranted; ≈1 says the key is uniform.
   *
   * Spark shape: ONE hash agg to (key, count) with map-side partials,
   * then two cheap passes over that already-reduced table — a scalar
   * agg (total + median via the shared-interpolation percentile) and a
   * distributed TakeOrdered top-k cut under the total (count desc, key
   * asc) order. The raw table never shuffles; the shuffle is bounded by
   * key cardinality.
   */
  def keySkewReport(df: DataFrame, keyCol: String, topK: Int = 10): DataFrame = {
    // cached: both the stats scalar and the top-k cut read this reduced
    // table — uncached, each reference would re-scan the raw input
    val counts = graft.SparkUtil.trackCache(
      df.groupBy(col(keyCol).cast("string").as("key"))
        .agg(count(lit(1)).as("n")))
    val stats = counts.agg(sum(col("n")).as("__total"),
      percentile(col("n"), lit(0.5)).as("__median"))
    counts.orderBy(col("n").desc, col("key").asc).limit(topK)
      .crossJoin(broadcast(stats))
      .select(col("key"), col("n"),
        (col("n").cast("double") / col("__total").cast("double")).as("share"),
        (col("n").cast("double") / col("__median")).as("skew_vs_median"))
  }

  /**
   * Referential-integrity audit for one child→parent relationship: row
   * and orphan counts plus the orphan rate — the ingestion QA gate that
   * catches partial loads (a parent partition lost in transfer shows up
   * as a nonzero orphan rate on every child table). Call once per
   * relationship and union the one-row results into the release report.
   *
   * Spark shape: ONE pass — the child reduces to its FK column
   * (scan-side projection), the parent to its DISTINCT key, and a single
   * left-outer probe marks each child row matched or orphaned; one
   * scalar agg reads off total, orphan rows, and orphan keys together.
   * At 100 TB the probe is the standard shuffled hash join (or broadcast
   * when the parent key set fits); nothing wider than the key column
   * ever moves, and the child is scanned exactly once.
   */
  def refIntegrityAudit(child: DataFrame, parent: DataFrame,
      fkCol: String, pkCol: String, relationship: String): DataFrame = {
    // one pass over the child: a left-outer probe against the DISTINCT
    // parent-key set (no fan-out possible) marks each row matched or
    // orphaned, and a single aggregate reads off total + orphan counts —
    // the earlier two-scan shape (scalar count, then a separate anti-join
    // scan) read the child twice for the same numbers
    val parentKeys = parent.select(col(pkCol)).distinct()
      .withColumn("__hit", lit(1))
    val isOrphan = col(fkCol).isNotNull && col("__hit").isNull
    val orphans = child.select(col(fkCol))
      .join(parentKeys, col(fkCol) === col(pkCol), "left_outer")
      .agg(count(lit(1)).as("__n"),
        sum(when(isOrphan, 1L).otherwise(0L)).as("__no"),
        count_distinct(when(isOrphan, col(fkCol))).as("__nok"))
    orphans
      .select(lit(relationship).as("relationship"),
        col("__n").as("n_child_rows"),
        col("__no").as("n_orphan_rows"),
        col("__nok").as("n_orphan_keys"),
        (col("__no").cast("double") / col("__n").cast("double"))
          .as("orphan_rate"))
  }

  /**
   * Exact inner-join cardinality prediction from per-key counts — the
   * "will this join explode" check run BEFORE a large join (the two-sided
   * composition of [[keySkewReport]]): `Σ n_left(k) · n_right(k)` over
   * shared keys is exactly the join's output size, and the max single-key
   * term is the largest reducer a plain hash join would build. Orders of
   * magnitude cheaper than the join itself: both sides reduce to per-key
   * counts (map-side partials), the count tables join on the key, and
   * three scalars come back. Sums are decimal(38,0) — at 100 TB a single
   * hot key can push the product sum past 2^63.
   */
  def joinSizeEstimate(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, relationship: String): DataFrame = {
    val ca = left.groupBy(col(leftKey).as("__k")).agg(count(lit(1)).as("__na"))
    val cb = right.groupBy(col(rightKey).as("__k")).agg(count(lit(1)).as("__nb"))
    ca.join(cb, "__k")
      .agg(count(lit(1)).as("n_shared_keys"),
        sum((col("__na") * col("__nb")).cast("decimal(38,0)"))
          .as("predicted_rows"),
        max(col("__na") * col("__nb")).as("max_single_key_rows"))
      .select(lit(relationship).as("relationship"), col("n_shared_keys"),
        col("predicted_rows"), col("max_single_key_rows"))
  }

  /**
   * Profile diff between two table versions — [[profile]] was designed
   * long-form precisely so versions diff row-by-row; this is that diff
   * as an operator: per column, both row counts, both distinct counts,
   * the distinct and null deltas (new minus old), and whether the
   * min/max window moved. The five-second answer to "what changed in
   * this snapshot" before any content-level audit (q101/q104/q109).
   *
   * Spark shape: two [[profile]] passes (each a set of single-column
   * pruned scans) joined on the column name — a |cols|-row join.
   */
  def profileDiff(oldDf: DataFrame, newDf: DataFrame,
      cols: Seq[String]): DataFrame = {
    def side(df: DataFrame, s: String) = profile(df, cols).select(
      col("column_name"), col("n_rows").as(s"n_rows_$s"),
      col("n_nulls").as(s"__nulls_$s"),
      col("n_distinct").as(s"n_distinct_$s"),
      col("min_value").as(s"__min_$s"), col("max_value").as(s"__max_$s"))
    side(oldDf, "a").join(side(newDf, "b"), "column_name")
      .select(col("column_name"),
        col("n_rows_a"), col("n_rows_b"),
        col("n_distinct_a"), col("n_distinct_b"),
        (col("n_distinct_b") - col("n_distinct_a")).as("distinct_delta"),
        (col("__nulls_b") - col("__nulls_a")).as("nulls_delta"),
        (!(col("__min_a") <=> col("__min_b")) ||
          !(col("__max_a") <=> col("__max_b"))).as("minmax_changed"))
  }

  /**
   * Equi-width histogram of a numeric column — the distribution fact
   * sheet next to [[profile]]'s scalar stats (outlier mass, modality,
   * truncation at collection limits all show up here first). Zero-filled:
   * every bucket appears, empty or not, so histograms of two corpus
   * versions diff row-by-row.
   *
   * Spark shape: one scalar min/max agg broadcast back, one map-side-
   * partial bucket-count agg (the scan never shuffles; the shuffle is
   * ≤ nBuckets rows), one tiny zero-fill join against a literal bucket
   * grid. The bucket rule (`floor((x−lo)·n/(hi−lo))`, top edge clamped)
   * is a fixed double chain mirrored by the oracle.
   */
  def histogram(df: DataFrame, valueCol: String,
      nBuckets: Int = 10): DataFrame = {
    require(nBuckets >= 1, s"nBuckets=$nBuckets must be >= 1")
    val x = col(valueCol).cast("double")
    val mm = df.agg(min(x).as("__lo"), max(x).as("__hi"))
    val counts = df.select(x.as("__x")).crossJoin(broadcast(mm))
      .select(when(col("__hi") === col("__lo"), lit(0))
        .otherwise(least(
          floor((col("__x") - col("__lo")) * nBuckets /
            (col("__hi") - col("__lo"))).cast("int"),
          lit(nBuckets - 1))).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_rows"))
    df.sparkSession.range(nBuckets)
      .select(col("id").cast("int").as("bucket"))
      .join(counts, Seq("bucket"), "left_outer")
      .crossJoin(broadcast(mm))
      .select(col("bucket"),
        (col("__lo") + col("bucket").cast("double") *
          (col("__hi") - col("__lo")) / nBuckets).as("bucket_lo"),
        (col("__lo") + (col("bucket") + 1).cast("double") *
          (col("__hi") - col("__lo")) / nBuckets).as("bucket_hi"),
        coalesce(col("n_rows"), lit(0L)).as("n_rows"))
  }

  /**
   * Equi-depth (equal-count) histogram — the quantile-cut dual of
   * [[histogram]]'s equi-width buckets: `nBins` bins with (near-)equal
   * row counts, reporting each bin's row count and value range. Matches
   * SQL `NTILE(n) ORDER BY value` exactly, including its
   * remainder rule (the first `n mod nBins` bins get the extra row), so
   * the oracle replays it with a plain window while the operator stays
   * distributed.
   *
   * Spark shape: the corpus reduces to (value, count) in ONE map-side-
   * partial hash agg; the only window runs over DISTINCT VALUES (bounded
   * by column cardinality, not corpus size), and bins become rank
   * intervals by closed-form ntile arithmetic joined back against the
   * value-rank intervals (broadcast of `nBins` rows). The corpus itself
   * never sorts. For unbounded-cardinality double columns, quantize
   * first (the micro-floor trick) or reach for the q47 sketch; this
   * operator is the EXACT path for bounded-cardinality columns.
   * NULLs are excluded on both engines (Spark sorts them first, DuckDB
   * last — the one place the engines' ORDER BY disagrees).
   */
  def equidepthHistogram(df: DataFrame, valueCol: String,
      nBins: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nBins >= 1, s"nBins=$nBins must be >= 1")
    // cached: the cumulative ranks and the scalar total both read this
    // reduced table — the total as sum(c) rather than a second raw scan
    val vals = graft.SparkUtil.trackCache(
      df.filter(col(valueCol).isNotNull)
        .groupBy(col(valueCol).as("v")).agg(count(lit(1)).as("c")))
    // distributed cumulative rank (r16 opt): the old global-ORDER-BY
    // window moved the whole distinct-values table — corpus-cardinality
    // for a price-like double column — through ONE task; globalCumSum
    // computes the identical ranks with range partitioning + per-
    // partition windows + a bounded offset table (guide §2.4)
    val cum = graft.SparkUtil.globalCumSum(vals, "v", "c", "hi_rank")
      .select(col("v"), (col("hi_rank") - col("c") + 1).as("lo_rank"),
        col("hi_rank"))
    val tot = vals.agg(sum(col("c")).as("__n"))
    val b = col("bin").cast("long")
    val q = expr(s"__n div $nBins")
    val rem = col("__n") % nBins
    val binLo = when(b <= rem, (b - 1) * (q + 1) + 1)
      .otherwise(rem * (q + 1) + (b - 1 - rem) * q + 1)
    val binHi = when(b <= rem, b * (q + 1))
      .otherwise(rem * (q + 1) + (b - rem) * q)
    val bins = broadcast(df.sparkSession.range(1, nBins + 1)
      .select(col("id").cast("int").as("bin"))
      .crossJoin(broadcast(tot))
      .select(col("bin"), binLo.as("__blo"), binHi.as("__bhi")))
    cum.join(bins,
        col("lo_rank") <= col("__bhi") && col("hi_rank") >= col("__blo"))
      .groupBy(col("bin")).agg(
        sum(least(col("hi_rank"), col("__bhi")) -
          greatest(col("lo_rank"), col("__blo")) + 1).as("n_rows"),
        min(col("v")).as("v_lo"), max(col("v")).as("v_hi"))
  }

  /**
   * Exact distributed Pearson correlation matrix over numeric columns —
   * the tabular-data profiling step (feature redundancy, leakage
   * screening: a feature correlating ~1.0 with the label column is a
   * leak). The naive distributed `corr` accumulates float sums in
   * partition order and drifts between runs; here every moment (Σx, Σx²,
   * Σxy) is an EXACT integer sum of micro-scaled values (`floor(x·10⁶ +
   * 0.5)`, the q82 trick, summed as decimal(38,0) — per-row cross
   * products reach ~5·10¹⁸ on price-scale columns, past float precision
   * and near int64 range), and only the final per-pair combination
   * `(n·Σxy − Σx·Σy) / (√(n·Σx² − Σx²)·√(n·Σy² − Σy²))` runs in doubles —
   * a fixed chain mirrored by the oracle, so the matrix replays
   * bit-identically.
   *
   * Spark shape: ONE aggregation pass computes all `2k + k(k−1)/2 + 1`
   * moments with map-side partials (the table never shuffles — the
   * shuffle is one moment row), then a single projection explodes the
   * pair list. O(k²) state per partition, one scan regardless of k.
   *
   * Moment width: decimal(38,0) sums are exact for any input but their
   * aggregation is ~3–5× slower than long sums (software 128-bit adds vs
   * codegen'd 64-bit). A cheap pre-pass (count + per-column max |x| —
   * narrow codegen'd scan) proves when every moment fits int64:
   * `n · maxMicroᵢ · maxMicroⱼ < 2⁶²` for all pairs (2⁶² not 2⁶³ —
   * headroom for the +0.5 rounding and the double-precision guard
   * arithmetic itself). When the bound holds the micro values sum as
   * longs; otherwise the decimal(38,0) path is kept. Both paths produce
   * identical integer moments, so the final double chain — and the
   * oracle — are unchanged. NaN/null maxima fail the bound and fall to
   * the decimal path (the conservative, previous behavior).
   *
   * Precondition: complete rows — `n` counts every row while a null cell
   * silently drops out of its sums, skewing that column's moments (the
   * oracle replays the same rule, so the result stays deterministic, but
   * it is only Pearson's r on null-free columns). Filter or impute nulls
   * upstream; [[profile]] reports the null counts to check first.
   */
  def correlationMatrix(df: DataFrame, cols: Seq[String],
      scale: Long = 1000000L): DataFrame = {
    require(cols.size >= 2, "correlationMatrix needs at least two columns")
    val idx = cols.indices
    def momentsFitLong(n: Long, maxAbs: Seq[Double]): Boolean = {
      val maxMicro = maxAbs.map(_ * scale.toDouble + 1.0)
      n > 0 && maxMicro.forall(m => !m.isNaN) &&
        (for { i <- idx; j <- idx if i <= j }
          yield n.toDouble * maxMicro(i) * maxMicro(j))
          .forall(_ < math.pow(2.0, 62))
    }
    // Footer short-circuit (r16 opt, guide §1.2/§6): the guard pre-pass is
    // a full table scan whose verdict at scale is almost always "decimal"
    // (n·maxMicro² grows with n). Parquet footer statistics give sound
    // UPPER bounds on both n and max|x| without a job; when the BOUNDS
    // already exceed the int64 budget the true moments might too, so take
    // the always-exact decimal path and skip the scan. The bounds are
    // never trusted to prove the LONG side (footer float stats may omit
    // NaNs), so whenever long is picked it is picked by the same exact
    // scan as before — both paths yield identical integer moments either
    // way, this only moves the speed trade.
    val footerUnsafe = (for {
      n  <- graft.SparkUtil.cheapRowCountUpperBound(df)
      ms <- graft.SparkUtil.cheapAbsMaxUpperBound(df, cols)
    } yield !momentsFitLong(n, ms)).getOrElse(false)
    val longSafe = !footerUnsafe && {
      val guardRow = df.agg(count(lit(1)).as("__n"),
        cols.map(c => max(abs(col(c).cast("double"))).as(s"__m_$c")): _*).head()
      momentsFitLong(guardRow.getLong(0),
        idx.map(i => if (guardRow.isNullAt(i + 1)) 0.0 else guardRow.getDouble(i + 1)))
    }
    val microType = if (longSafe) "long" else "decimal(19,0)"
    def micro(c: String): Column =
      floor(col(c).cast("double") * lit(scale.toDouble) + lit(0.5))
        .cast(microType)
    val moments =
      idx.map(i => sum(micro(cols(i))).as(s"__s$i")) ++
      idx.map(i => sum(micro(cols(i)) * micro(cols(i))).as(s"__q$i")) ++
      (for { i <- idx; j <- idx if i < j } yield
        sum(micro(cols(i)) * micro(cols(j))).as(s"__p${i}_$j"))
    val row = df.agg(count(lit(1)).as("__n"), moments: _*)
    def d(name: String) = col(name).cast("double")
    val n = d("__n")
    val pairs = for { i <- idx; j <- idx if i < j } yield {
      val num = n * d(s"__p${i}_$j") - d(s"__s$i") * d(s"__s$j")
      val den = sqrt(n * d(s"__q$i") - d(s"__s$i") * d(s"__s$i")) *
        sqrt(n * d(s"__q$j") - d(s"__s$j") * d(s"__s$j"))
      struct(lit(cols(i)).as("col_a"), lit(cols(j)).as("col_b"),
        (num / den).as("pearson_r"))
    }
    row.select(explode(array(pairs: _*)).as("__pair"))
      .select(col("__pair.col_a"), col("__pair.col_b"), col("__pair.pearson_r"))
  }

  /**
   * k-anonymity audit over a quasi-identifier tuple — the re-identification
   * risk report run before releasing any corpus with user-linked columns:
   * each equivalence class (distinct quasi-id combination) with its size,
   * its share of the table, and the `at_risk` verdict (size < k means a
   * row in that class is re-identifiable among fewer than k candidates).
   *
   * Spark shape: ONE hash aggregation keyed on the quasi-id tuple (map-side
   * partial counts — the table never shuffles raw); the total folds out of
   * the class table with a metadata-scale window, so the raw table is
   * scanned once. Output cardinality is the quasi-id space, orders of
   * magnitude under the row count; share is a single double division of
   * exact integers so the oracle replays it bit-identically.
   */
  def anonymityAudit(df: DataFrame, quasiCols: Seq[String],
      k: Int = 5): DataFrame = {
    require(quasiCols.nonEmpty, "anonymityAudit needs at least one quasi-id column")
    val classes = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
    // total = sum of class sizes via a single-partition window over the
    // already-reduced class table (quasi-id space, orders of magnitude
    // under the row count) — not a second scan of the raw table
    val totalW = org.apache.spark.sql.expressions.Window.partitionBy()
    classes
      .select(quasiCols.map(col) ++ Seq(
        col("class_size"),
        (col("class_size").cast("double") /
          sum(col("class_size")).over(totalW).cast("double")).as("share"),
        (col("class_size") < k).as("at_risk")): _*)
  }

  /**
   * Wide pivot report: per row-key, one count column per EXPLICIT pivot
   * value plus a total — the cross-tab every corpus dashboard starts
   * from (sources × languages). The pivot values are a declared literal
   * list, NOT discovered from data: discovery would need an extra pass
   * AND make the output schema data-dependent, which breaks both schema
   * contracts and the SQL mirror. Values outside the list still count
   * toward `total` (the honest-columns rule: a wide report that
   * silently drops the remainder reads as complete when it isn't).
   *
   * Spark shape: ONE hash aggregation — each pivot column is a
   * conditional count with map-side partials; no Expand, no join, no
   * second pass (`groupBy().pivot(col, values)` plans the same shape;
   * this spells it as conditional aggs so the SQL mirror is literal).
   */
  def pivotCounts(df: DataFrame, rowKey: String, pivotCol: String,
      values: Seq[String]): DataFrame = {
    require(values.nonEmpty, "pivotCounts needs explicit pivot values")
    require(values.distinct == values, "pivot values must be distinct")
    val aggs = values.map(v =>
      count(when(col(pivotCol) === v, 1)).as(v)) :+
      count(lit(1)).as("total")
    df.groupBy(col(rowKey)).agg(aggs.head, aggs.tail: _*)
  }

  /**
   * Declarative data-quality gate (the Deequ/dbt-test shape): named SQL
   * predicates evaluated in ONE scan — a violation is a row where the
   * predicate is false OR null (SQL three-valued logic would otherwise
   * let a null sneak past a NOT filter) — reported long-form with the
   * violation rate as one exact-integer division.
   *
   * Spark shape: one pass, one row — every rule folds to a conditional
   * count in a single global aggregate with map-side partials — then
   * `stack` unpivots the bounded rule row to long form. Adding a rule
   * costs zero extra scans; at 100 TB the alternative (one count per
   * rule) multiplies the table read by the rule count.
   */
  def dqReport(df: DataFrame, rules: Seq[(String, String)]): DataFrame = {
    require(rules.nonEmpty, "dqReport needs at least one rule")
    require(rules.map(_._1).distinct.size == rules.size,
      "rule names must be distinct")
    val aggs = rules.zipWithIndex.map { case ((_, pred), i) =>
      count(when(coalesce(expr(pred), lit(false)) === false, 1))
        .as(s"__v$i")
    } :+ count(lit(1)).as("__n")
    val onePass = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = rules.zipWithIndex
      .map { case ((name, _), i) => s"'${name.replace("'", "''")}', __v$i" }
      .mkString(", ")
    onePass.selectExpr(
        s"stack(${rules.size}, $stackArgs) AS (rule, n_violations)", "__n")
      .select(col("rule"), col("n_violations"), col("__n").as("n_rows"),
        (col("n_violations").cast("double") / col("__n").cast("double"))
          .as("violation_rate"))
  }

  /**
   * Right-to-be-forgotten purge manifest: for each selected root entity
   * (pass the already-filtered root table), the number of child and
   * grandchild rows a cascading delete would remove — the audit a
   * governance pipeline emits BEFORE destructive propagation, and the
   * work manifest the actual delete job consumes. Roots with no
   * descendants appear zero-filled (they still need tombstones).
   *
   * Spark shape: the selected roots drive everything — children
   * semi-join-reduce against the root keys, grandchildren against the
   * SURVIVING child keys (never against the full child table), so each
   * level's shuffle is bounded by the selection's fan-out, not the
   * table. The grandchild count aggregates per child key BEFORE joining
   * back up (agg-before-join: one row per child key crosses the wire).
   */
  def cascadeDeletePlan(selectedRoots: DataFrame, rootKey: String,
      child: DataFrame, childFk: String, childKey: String,
      grand: DataFrame, grandFk: String): DataFrame = {
    val sel = selectedRoots.select(col(rootKey).as("__root")).distinct()
    val ch = child.join(sel, col(childFk) === col("__root"))
      .select(col("__root"), col(childKey).as("__ck"))
    val gn = grand.select(col(grandFk).as("__ck"))
      .join(ch.select(col("__ck")).distinct(), "__ck")
      .groupBy(col("__ck")).agg(count(lit(1)).as("__gn"))
    val perRoot = ch.join(gn, Seq("__ck"), "left")
      .groupBy(col("__root"))
      .agg(count(lit(1)).as("__nc"),
        sum(coalesce(col("__gn"), lit(0L))).as("__ng"))
    sel.join(perRoot, Seq("__root"), "left")
      .select(col("__root").as(rootKey),
        coalesce(col("__nc"), lit(0L)).as("n_children"),
        coalesce(col("__ng"), lit(0L)).as("n_grandchildren"))
  }

  /**
   * Mergeable per-group aggregate STATE — the materialized-view /
   * incremental-refresh primitive: (n, sum, min, max) per key over an
   * integral value column. Because every field is algebraically
   * mergeable (sum/sum/min/max), yesterday's persisted state plus a
   * state over today's DELTA merges into exactly the state a full
   * rescan would produce — which is what [[mergeAggStates]] does and
   * the oracle (a direct aggregate over the union) proves. At 100 TB
   * this is the difference between touching the day's partition and
   * re-reading the table.
   *
   * The value is cast to long up front: integer states merge exactly;
   * a double sum would make merge order observable (the repo's float
   * rule). Null values contribute to `n_rows` but not the value stats
   * (standard SQL aggregate semantics on both engines).
   */
  def aggState(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        sum(col(valueCol).cast("long")).as("sum_v"),
        min(col(valueCol).cast("long")).as("min_v"),
        max(col(valueCol).cast("long")).as("max_v"))

  /** Merge two [[aggState]] tables (same keys): one hash agg over the
    * union — states combine per key with sum/sum/min/max, keys present
    * on only one side pass through. Associative and commutative, so any
    * partial-state tree (daily → weekly → total) folds to the same
    * answer. Derived stats (here `avg_v`) are computed AFTER the merge,
    * one exact-integer division each — never merged themselves. */
  /**
   * Join fan-out histogram: the multiplicity DISTRIBUTION of a join
   * key — how many keys match once, how many 2–3×, how many thousands —
   * in power-of-two bands (q47's log2 trick). [[joinSizeEstimate]]
   * predicts the output total and [[keySkewReport]] names the top keys;
   * this is the shape in between, the histogram a join-strategy choice
   * (broadcast / salt / plain) actually reads.
   *
   * Spark shape: ONE hash aggregation to per-key counts (bounded by key
   * cardinality, map-side partials), then ONE bounded aggregation on
   * the ≤ 64 bucket keys. The raw table never shuffles.
   */
  def joinFanoutHistogram(df: DataFrame, keyCol: String): DataFrame =
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("__m"))
      .withColumn("bucket", expr("length(bin(__m))"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_keys"), sum(col("__m")).as("n_rows"),
        min(col("__m")).as("min_multiplicity"),
        max(col("__m")).as("max_multiplicity"))

  /**
   * Gini concentration of a count distribution: how unequally a
   * measure (events, tokens, bytes) distributes over entities — the
   * "do 1% of users/domains generate 90% of the data?" number a
   * skew-aware pipeline checks before choosing partitioning and
   * mixture weights. Exact sample Gini over ascending-sorted counts
   * `G = (2·Σ i·xᵢ − (n+1)·Σ xᵢ) / (n·Σ xᵢ)`: every sum is an exact
   * integer (tie order cannot change Σ i·xᵢ — tied ranks carry equal
   * x), only the final division is floating point, so the statistic
   * replays bit-identically.
   *
   * Spark shape: ONE hash aggregation to per-entity counts (bounded by
   * entity cardinality), one rank window over THOSE (never the raw
   * rows), one scalar-row reduction. The unpartitioned window sorts
   * only the entity-count table — acceptable while entities fit a
   * partition; shard by a salt and merge the partial sums when they
   * don't.
   */
  /**
   * Mass-weighted lower median per group: the smallest value v such
   * that rows with value <= v (under the (value, id) total order)
   * carry at least HALF the group's total value mass — "half the
   * corpus bytes live in documents of at least/most X chars", the
   * storage-planning statistic a row-median hides completely on
   * heavy-tailed sizes (a few giant docs carry most bytes while the
   * row median stays tiny). Exact integer arithmetic: the qualifying
   * condition is the cross-multiplied `2·cum >= total`.
   *
   * Spark shape: one shuffle on the group key, one cumulative window
   * per group partition under the deterministic total order (the
   * q125/q173 posture), ONE group aggregation.
   */
  def massMedian(df: DataFrame, groupCol: String, valueCol: String,
      idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = Window.partitionBy(col(groupCol))
      .orderBy(col("__v").asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(col(groupCol))
    df.select(col(groupCol), col(idCol),
        col(valueCol).cast("long").as("__v"))
      .withColumn("__cum", sum(col("__v")).over(ord))
      .withColumn("__tot", sum(col("__v")).over(all))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"), max(col("__tot")).as("total_mass"),
        min(when(lit(2) * col("__cum") >= col("__tot"), col("__v")))
          .as("mass_median"))
  }

  /**
   * Top-k most frequent values per declared column, long form with a
   * deterministic rank under the (count desc, value asc) total order —
   * the "common values" pane of every profiling tool, and the quick
   * category-drift check between table versions (diff the ranked rows).
   * Values are cast to string so heterogeneous columns share a schema
   * (the [[profile]] min/max convention).
   *
   * Spark shape: one branch per column — a single-column pruned scan,
   * a value-bounded count aggregation with map-side partials, a
   * distributed TakeOrderedAndProject cut at k (never a global sort),
   * then a rank window over the ≤ k surviving rows.
   */
  def topValuesProfile(df: DataFrame, cols: Seq[String],
      k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(cols.nonEmpty && k >= 1, "need columns and k >= 1")
    cols.map { c =>
      df.select(col(c).cast("string").as("value"))
        .groupBy(col("value")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("value").asc)
        .limit(k)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("cnt").desc, col("value").asc)).cast("long"))
        .select(lit(c).as("column_name"), col("value"), col("cnt"),
          col("rank"))
    }.reduce(_.unionByName(_))
  }

  /**
   * Per-group feature-distribution parity: for each declared integer
   * feature, count, min/max, and micro-exact mean per group — long
   * form, one row per (group, feature). The split-bias audit run after
   * ANY train/test split: if the test half's mean document length or
   * token count drifts from train's, the split (or the id space it
   * hashed) is biased and every eval number downstream inherits it.
   * Also the cross-shard / cross-day parity check for ingestion.
   *
   * Spark shape: one branch per feature — each a (group, feature)-
   * pruned scan with ONE hash aggregation on the group key (map-side
   * partial sums of exact longs); means are final single divisions.
   */
  def featureParity(df: DataFrame, groupCol: String,
      features: Seq[String]): DataFrame = {
    require(features.nonEmpty, "need at least one feature")
    features.map { f =>
      df.groupBy(col(groupCol))
        .agg(count(lit(1)).as("n"),
          min(col(f).cast("long")).as("min_v"),
          max(col(f).cast("long")).as("max_v"),
          sum(col(f).cast("long")).as("__s"))
        .select(col(groupCol), lit(f).as("feature"), col("n"),
          col("min_v"), col("max_v"),
          (col("__s").cast("double") / col("n").cast("double"))
            .as("mean_v"))
    }.reduce(_.unionByName(_))
  }

  /**
   * String-length profile: per declared string column, row/null/empty
   * counts and exact min/max/sum lengths with a mean — the five-second
   * encoding sanity sheet next to [[profile]]'s value stats (a `lang`
   * column whose max length is 4000 is holding full texts; a `text`
   * column with thousands of empties means the extractor died). Long
   * form, one row per column, so versions diff row-by-row.
   *
   * Spark shape: one branch per column, each a single-column pruned
   * scan folding to one scalar row (the q100 reasoning); sums are
   * exact longs, the mean one final division.
   */
  def stringLengthProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    cols.map { c =>
      df.agg(count(lit(1)).as("n_rows"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
          sum(when(length(col(c)) === 0, 1L).otherwise(0L)).as("n_empty"),
          min(length(col(c)).cast("long")).as("min_len"),
          max(length(col(c)).cast("long")).as("max_len"),
          sum(coalesce(length(col(c)).cast("long"), lit(0L))).as("sum_len"))
        .select(lit(c).as("column_name"), col("n_rows"), col("n_null"),
          col("n_empty"), col("min_len"), col("max_len"), col("sum_len"),
          (col("sum_len").cast("double") /
            (col("n_rows") - col("n_null")).cast("double")).as("mean_len"))
    }.reduce(_.unionByName(_))
  }

  /**
   * Benford first-digit audit of a positive numeric column (Benford,
   * "The law of anomalous numbers", Proc. Am. Phil. Soc. 1938; Hill,
   * Statistical Science 1995 for the modern treatment): observed
   * first-significant-digit counts against the canonical log10(1+1/d)
   * distribution — the classic forensic screen for fabricated or
   * synthetic numeric data (organic multiplicative magnitudes follow
   * the curve; generated/uniform ones don't, which is precisely what
   * the audit should surface). Expected shares ride as integer
   * PER-MILLE LITERALS (301, 176, ...) rather than engine-computed
   * log10 calls — no libm in the comparison, so observed, expected,
   * and deviation all replay bit-identically. Rows with value < 1 are
   * out of scope (their first significant digit needs decimal-shift
   * normalization; the audit's classic form is for magnitudes >= 1).
   *
   * Spark shape: one narrow projection (floor -> long -> leading
   * char) + ONE hash aggregation on the 9-value digit key with
   * map-side partials; the scalar total comes from a window over the
   * <= 9-row digit table, never a second scan.
   */
  def benfordAudit(df: DataFrame, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val expected = Seq(1 -> 301L, 2 -> 176L, 3 -> 125L, 4 -> 97L,
      5 -> 79L, 6 -> 67L, 7 -> 58L, 8 -> 51L, 9 -> 46L)
    val digits = df.filter(col(valueCol) >= 1)
      .select(substring(floor(col(valueCol)).cast("long").cast("string"),
        1, 1).cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val exp = expected.tail.foldLeft(
        when(col("digit") === expected.head._1, lit(expected.head._2))) {
      case (acc, (d, e)) => acc.when(col("digit") === d, lit(e))
    }
    digits
      .withColumn("observed_per_mille",
        expr("(n * 1000) div sum(n) over ()"))
      .select(col("digit"), col("n"), col("observed_per_mille"),
        exp.as("expected_per_mille"),
        abs(col("observed_per_mille") - exp).as("dev_per_mille"))
  }

  /**
   * Candidate-key audit: for each declared column combination, the
   * exact distinct-tuple count against the row count and the is-key
   * verdict — the uniqueness contract check run at ingestion before
   * anything joins on, dedups by, or partitions over a "key" that
   * quietly stopped being one (the fixture's (l_orderkey,
   * l_linenumber) is exactly such a trap: TPC-H proper keys it, this
   * synthetic one doesn't). Combos are declared, not discovered —
   * discovery is a combinatorial search that can't be a fixed-schema
   * report (the q156 honest-columns reasoning).
   *
   * Spark shape: one branch per combo — each a pruned scan of just
   * that combo's columns with count + the standard two-phase distinct
   * aggregation (the q100 per-column-branch reasoning; a single-pass
   * multi-distinct would Expand on the union of all combos' columns).
   * Declared columns must be non-null for the combo to be meaningful
   * (SQL count-distinct-tuple and multi-arg countDistinct diverge on
   * null tuples).
   */
  def candidateKeyAudit(df: DataFrame, combos: Seq[Seq[String]]): DataFrame = {
    require(combos.nonEmpty && combos.forall(_.nonEmpty),
      "need at least one non-empty combo")
    combos.map { cs =>
      df.agg(count(lit(1)).as("n_rows"),
          countDistinct(cs.head, cs.tail: _*).as("n_distinct"))
        .select(lit(cs.mkString(",")).as("combo"), col("n_rows"),
          col("n_distinct"),
          (col("n_distinct") === col("n_rows")).as("is_key"))
    }.reduce(_.unionByName(_))
  }

  /**
   * Functional-dependency audit: for each declared (determinant ->
   * dependent) rule, the number of determinant values, how many of
   * them map to MORE than one dependent value, the worst fan-out, and
   * the holds verdict — the schema-semantics check behind "can I
   * safely pick any_value(dep) per det", denormalization, and
   * dimension extraction. Violated dependencies on supposedly-derived
   * columns are how silent data corruption usually first shows up.
   *
   * Spark shape: one branch per rule — a (det, dep)-pruned scan, one
   * hash aggregation to per-determinant distinct-dependent counts
   * (bounded by determinant cardinality), one scalar fold. Exact
   * integer counts throughout.
   */
  def functionalDependencyAudit(df: DataFrame,
      rules: Seq[(String, String)]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    rules.map { case (det, dep) =>
      df.groupBy(col(det))
        .agg(countDistinct(col(dep)).as("__nd"))
        .agg(count(lit(1)).as("n_keys"),
          sum(when(col("__nd") > 1, 1L).otherwise(0L)).as("n_violating"),
          max(col("__nd")).as("max_deps"))
        .select(lit(s"$det->$dep").as("rule"), col("n_keys"),
          col("n_violating"), col("max_deps"),
          (col("n_violating") === 0L).as("holds"))
    }.reduce(_.unionByName(_))
  }

  /**
   * Concentration (Lorenz) curve checkpoints: for each literal top-K%
   * checkpoint, the exact share of total activity carried by the
   * heaviest K% of entities — "do 1% of users generate 90% of events"
   * answered with the actual curve points instead of [[giniConcentration]]'s
   * single scalar. Checkpoint rank is the ceiling `⌈pct·n/100⌉` under
   * the deterministic (count desc, entity asc) total order, so every
   * reported number is a real prefix of the real ranking; shares are
   * per-mille integer floors plus one final double division — both
   * replay bit-identically.
   *
   * Spark shape: ONE hash aggregation to per-entity counts (bounded by
   * entity cardinality), one rank+cumsum window over THAT table (the
   * q181 posture — the unpartitioned window sorts entity counts, never
   * raw rows), then a <= |checkpoints| fan-out explode and a rank-match
   * filter. Nothing wider than the entity id ever shuffles.
   */
  def concentrationCurve(df: DataFrame, keyCol: String,
      checkpoints: Seq[Int] = Seq(1, 5, 10, 25, 50)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(checkpoints.nonEmpty && checkpoints.forall(p => p >= 1 && p <= 100),
      s"checkpoints $checkpoints must be percents in [1, 100]")
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("__c"))
    val ord = Window.orderBy(col("__c").desc, col(keyCol).asc)
    val all = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val ranked = counts
      .withColumn("__r", row_number().over(ord).cast("long"))
      .withColumn("__cum", sum(col("__c")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__n", count(lit(1)).over(all))
      .withColumn("__tot", sum(col("__c")).over(all))
    ranked
      .select(explode(array(checkpoints.map(lit(_)): _*)).as("pct"),
        col("__r"), col("__cum"), col("__n"), col("__tot"))
      .filter(col("__r") === expr("(pct * __n + 99) div 100"))
      .select(col("pct"), col("__r").as("top_entities"),
        col("__n").as("n_entities"), col("__cum").as("events_covered"),
        col("__tot").as("total_events"),
        expr("(__cum * 1000) div __tot").as("share_per_mille"))
  }

  def giniConcentration(df: DataFrame, keyCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("__x"))
    val ranked = counts.withColumn("__i",
      row_number().over(Window.orderBy(col("__x").asc, col(keyCol).asc))
        .cast("long"))
    ranked.agg(count(lit(1)).as("n_entities"),
        sum(col("__x")).as("total"),
        sum(col("__i") * col("__x")).as("__ix"))
      .select(col("n_entities"), col("total"),
        ((lit(2.0) * col("__ix").cast("double") -
          (col("n_entities") + 1L).cast("double") * col("total").cast("double")) /
          (col("n_entities").cast("double") * col("total").cast("double")))
          .as("gini"))
  }

  /**
   * Rank-exact winsorization report: per key, the p-lo/p-hi clamp bounds
   * taken at DETERMINISTIC ranks over the (value, id) total order
   * (`lo_rank = ⌈loPct·n/100⌉`, `hi_rank = n + 1 − ⌈(100−hiPct)·n/100⌉`)
   * and the count of rows each clamp would touch — the robust
   * preprocessing audit run before feeding heavy-tailed measures to
   * anything mean-based. Rank-based (not interpolated) so every number
   * is a value that EXISTS in the data and the whole report replays
   * bit-identically — the q159 lower-median reasoning at both tails.
   *
   * Spark shape: one rank window per key partition (single shuffle) and
   * a bounds aggregation (conditional min at the pinned ranks), then the
   * key-space bounds table broadcasts back over the raw rows for the
   * VALUE-exact clamp counts (`v < lo`, `v > hi` — ties AT the bound are
   * untouched by clamping, so rank-based counts would overstate).
   */
  def winsorizeReport(df: DataFrame, keyCol: String, valueCol: String,
      idCol: String, loPct: Int = 5, hiPct: Int = 95): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(loPct >= 0 && hiPct <= 100 && loPct < hiPct,
      s"bad percentile bounds ($loPct, $hiPct)")
    val base = df
      .select(col(keyCol), col(idCol).as("__i"),
        col(valueCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull)
    val ranked = base
      .withColumn("__rn", row_number().over(Window.partitionBy(col(keyCol))
        .orderBy(col("__v").asc, col("__i").asc)))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col(keyCol))))
      .withColumn("__lor", greatest(lit(1L),
        expr(s"(${loPct}L * __n + 99) div 100")))
      .withColumn("__hir", col("__n") + 1L - greatest(lit(1L),
        expr(s"(${100 - hiPct}L * __n + 99) div 100")))
    val bounds = ranked.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_rows"),
        min(when(col("__rn") === col("__lor"), col("__v"))).as("lo_bound"),
        min(when(col("__rn") === col("__hir"), col("__v"))).as("hi_bound"))
    base.join(broadcast(bounds), Seq(keyCol))
      .groupBy(col(keyCol), col("n_rows"), col("lo_bound"), col("hi_bound"))
      .agg(
        sum(when(col("__v") < col("lo_bound"), 1L).otherwise(0L))
          .as("n_clamped_low"),
        sum(when(col("__v") > col("hi_bound"), 1L).otherwise(0L))
          .as("n_clamped_high"))
  }

  /**
   * Dataset card: the per-language release summary a corpus ships with —
   * doc count, distinct sources, total whitespace tokens, exact-duplicate
   * doc count (docs whose md5(text) appears ≥ 2× within the language),
   * and each language's share of the corpus. One table answering the
   * first four questions any consumer of the dataset asks.
   *
   * Spark shape: duplicate multiplicity comes from a (lang, md5) hash
   * aggregation whose output is bounded by distinct-content cardinality,
   * folded per language in a second bounded aggregation; sources/tokens
   * ride ONE direct per-language aggregation (map-side partials,
   * exact distinct bounded by the source space); the two |langs|-sized
   * results join broadcast, and the corpus total folds out of the
   * per-language counts with a window over the |langs|-sized join — no
   * extra pass. The corpus is scanned exactly twice (content hashes,
   * per-language sums), shuffled never (both shuffles carry aggregated
   * rows).
   */
  def datasetCard(docs: DataFrame, groupCol: String = "lang",
      sourceCol: String = "source", textCol: String = "text"): DataFrame = {
    val perContent = docs
      .groupBy(col(groupCol), md5(col(textCol)).as("__h"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col(groupCol))
      .agg(sum(when(col("__c") >= 2, col("__c")).otherwise(0L))
        .as("n_exact_dup_docs"))
    val perLang = docs
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col(sourceCol)).as("n_sources"),
        sum(size(graft.functions.TextFunctions.tokens(col(textCol)))
          .cast("long")).as("sum_tokens"))
    // corpus total = sum of per-language counts via a window over the
    // |langs|-sized join result — not a third scan of the corpus
    val totalW = org.apache.spark.sql.expressions.Window.partitionBy()
    perLang.join(perContent, Seq(groupCol))
      .select(col(groupCol), col("n_docs"), col("n_sources"),
        col("sum_tokens"), col("n_exact_dup_docs"),
        (col("n_docs").cast("double") /
          sum(col("n_docs")).over(totalW).cast("double"))
          .as("corpus_share"))
  }

  def mergeAggStates(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame = {
    // re-merging a merged state is legal: only the state columns ride
    // the union — derived columns (avg_v) are recomputed, never merged
    val state = (keys ++ Seq("n_rows", "sum_v", "min_v", "max_v")).map(col)
    a.select(state: _*).unionByName(b.select(state: _*))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n_rows")).as("n_rows"), sum(col("sum_v")).as("sum_v"),
        min(col("min_v")).as("min_v"), max(col("max_v")).as("max_v"))
      .withColumn("avg_v",
        col("sum_v").cast("double") / col("n_rows").cast("double"))
  }
}
