package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/**
 * Deterministic sampling for training-data pipelines: hash-bucket
 * sampling, per-stratum rate control, and train/test splitting. North-star
 * extensions (SURVEY.md §2.3 Tier B); no analog in the reference
 * (`Lookup.java` is join-only — the host platform has no sampler either).
 *
 * All three are *content-addressed* (a Knuth multiplicative mix of a stable
 * id, reduced mod 100), not `rand()`-based, because at 100 TB a sample must
 * be (a) reproducible across reruns and engines, (b) consistent across
 * tables (the same id always lands in the same bucket, so a document and
 * its derived rows stay in the same split), and (c) a pure narrow
 * projection — no seed-state, no shuffle, evaluated inside whole-stage
 * codegen and pushed against the scan.
 *
 * The bucket function is public arithmetic (`((id mod 2^31) * 2654435761)
 * mod 2^32 mod 100`), so any engine — including the DuckDB oracle —
 * replays it bit-identically. The id is reduced mod 2^31 BEFORE the Knuth
 * multiply: (2^31 - 1) * 2654435761 < 2^63, so the product never exceeds
 * signed-64-bit range in any engine. Without the reduction, ids above
 * ~3.46e9 would silently wrap in Spark but raise in DuckDB (which traps
 * BIGINT overflow) — exactly the id range a 100 TB corpus reaches.
 */
object Sampling {

  /** Ids at/above this are folded down so the Knuth product stays < 2^63. */
  val IdFold = 2147483648L // 2^31

  /** Hash bucket in [0, 100) for a non-negative integer id column. */
  def bucket(id: Column): Column =
    pmod(TextFunctions.mix32(pmod(id.cast("long"), lit(IdFold))), lit(100L))

  /** Keep rows whose id-bucket falls below `pct` (≈ pct% of rows,
    * deterministic). */
  def hashSample(df: DataFrame, pct: Int, idCol: String = "doc_id"): DataFrame =
    df.filter(bucket(col(idCol)) < pct)

  /** Per-stratum sampling rates: rows in stratum s are kept at
    * `rates(s)`% (default `defaultPct`% for unlisted strata). The rate
    * CASE-chain is built over sorted keys so the plan is deterministic.
    * The classic corpus rebalancer (e.g. downsample dominant languages). */
  def stratifiedSample(df: DataFrame, rates: Map[String, Int], defaultPct: Int,
      strataCol: String = "lang", idCol: String = "doc_id"): DataFrame = {
    val pct = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultPct).cast("long")) {
      case (acc, (k, v)) => when(col(strataCol) === k, lit(v.toLong)).otherwise(acc)
    }
    df.filter(bucket(col(idCol)) < pct)
  }

  /** Adds a `split` column: "test" for ids bucketed below `testPct`,
    * else "train". Id-addressed, so membership is stable across runs and
    * joins (no leakage when derived tables are split independently). */
  def trainTestSplit(df: DataFrame, testPct: Int,
      idCol: String = "doc_id"): DataFrame =
    df.withColumn("split",
      when(bucket(col(idCol)) < testPct, lit("test")).otherwise(lit("train")))

  /**
   * Top-share (nucleus) selection: per group, keep documents BEST-FIRST
   * (score desc, id tiebreak — total order) until the kept set covers at
   * least `sharePct`% of the group's total score mass — "the best docs
   * carrying 90% of the tokens per language". The mass-coverage dual of
   * a fixed-rate sample: a fat-tailed group keeps few docs, a uniform
   * one keeps most. Scores must be non-negative integers (token/char
   * counts — the usual mass). The kept set is the MINIMAL such prefix:
   * a doc survives iff the mass before it is still short of the target
   * (exclusive-cumsum cross-multiplied against the total — all integer
   * arithmetic, bit-identical replay).
   *
   * Spark shape: one shuffle on the group key; the running sum and the
   * per-group total are two window passes over the same partitioning
   * (one Exchange, one sort). At 100 TB groups are language/source-sized
   * — millions of rows per partition is fine for a running sum; split
   * pathological giant groups with a composite key as in
   * `TextAnalysis.packSequences`.
   */
  def topShareSelection(df: DataFrame, sharePct: Int, scoreCol: String,
      groupCol: String = "lang", idCol: String = "doc_id"): DataFrame = {
    require(sharePct >= 0 && sharePct <= 100,
      s"sharePct=$sharePct must be in [0, 100]")
    import org.apache.spark.sql.expressions.Window
    val run = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(col(groupCol))
    df.withColumn("__cum", sum(col(scoreCol).cast("long")).over(run))
      .withColumn("__tot", sum(col(scoreCol).cast("long")).over(tot))
      .filter((col("__cum") - col(scoreCol)) * 100 < lit(sharePct) * col("__tot"))
      .drop("__cum", "__tot")
  }

  /**
   * Leakage-safe train/test split: the split unit is the NEAR-DUP
   * CLUSTER, not the document — a doc and its near-duplicates always
   * land in the same side, closing the classic eval-leakage hole where
   * an id-hash split puts a test doc's near-copy into train (the
   * [[trainTestSplit]] failure mode on duplicated corpora). `pairs` is
   * any near-dup pair table (Jaccard, MinHash, SimHash, embedding —
   * first two columns are the edge); docs absent from `pairs` form
   * singleton clusters and split by their own id, so on a dedup'd corpus
   * this degrades to exactly [[trainTestSplit]].
   *
   * Spark shape: connected components over the pair graph (the edge
   * subgraph is tiny relative to the corpus; isolated docs are appended
   * self-labeled without riding the iteration — see
   * [[ConnectedComponents]]), then the same narrow content-addressed
   * bucket filter on the COMPONENT id. Deterministic end to end: the
   * component is the min doc id of the cluster, the bucket is public
   * arithmetic, so the oracle replays membership exactly.
   */
  def leakageSafeSplit(docs: DataFrame, pairs: DataFrame, testPct: Int,
      idCol: String = "doc_id"): DataFrame =
    ConnectedComponents(pairs, vertices = Some(docs.select(col(idCol))))
      .select(col("id").as(idCol), col("component"),
        when(bucket(col("component")) < testPct, lit("test"))
          .otherwise(lit("train")).as("split"))

  /** Content-addressed bucket in [0, 100) for ARBITRARY values (strings,
    * composites cast to string) — the no-dense-id case: real corpora often
    * key on URLs or content hashes, not sequential longs. Uses the
    * engine-portable 60-bit md5-prefix hash (`Sketches.hash60`), so the
    * DuckDB oracle replays membership exactly; same reproducibility
    * contract as [[bucket]]. */
  def contentBucket(value: Column): Column =
    pmod(Sketches.hash60(value), lit(100L))

  /** Keep ~pct% of rows selected by content identity (md5-derived bucket
    * of `keyCol`), not position or id — stable across reruns, engines,
    * and table layouts even when no numeric id exists. */
  def contentSample(df: DataFrame, pct: Int, keyCol: String = "text"): DataFrame =
    df.filter(contentBucket(col(keyCol)) < pct)

  /**
   * Group-level holdout split (sklearn GroupKFold's holdout cousin):
   * the split unit is an entire GROUP (source, domain, author) — every
   * row of a group lands on the same side by construction, because the
   * side is a pure function of the group VALUE (the content-addressed
   * [[contentBucket]]). The third member of the leakage-guard family:
   * [[trainTestSplit]] splits ids (fine for i.i.d. rows),
   * [[leakageSafeSplit]] splits near-dup clusters (content leakage),
   * this splits provenance groups — the right unit when a model must
   * generalize to UNSEEN SOURCES, where a per-row split lets every
   * test source be seen in training.
   *
   * Spark shape: a pure narrow codegen'd projection — no join against
   * a group table, no shuffle; rerun- and relayout-stable.
   */
  def groupHoldout(df: DataFrame, groupCol: String,
      testPct: Int): DataFrame = {
    require(testPct >= 1 && testPct <= 99,
      s"testPct=$testPct must be in [1, 99]")
    df.withColumn("split",
      when(contentBucket(col(groupCol)) < testPct, lit("test"))
        .otherwise(lit("train")))
  }

  /**
   * Temperature-style language rebalancing (the mC4/XLM-R recipe at
   * T=2): expected kept rows per stratum proportional to `sqrt(count)`,
   * with the SMALLEST stratum kept at 100% — downsamples dominant
   * languages toward a flatter distribution while never upsampling. The
   * rate is `floor(100·sqrt(c_min/c_s))`, so expected kept =
   * `c_s·rate/100 ≈ sqrt(c_min·c_s) ∝ sqrt(c_s)`.
   *
   * Determinism: `sqrt` is IEEE-correctly-rounded and the rest is one
   * divide + floor, so the rates — and therefore membership — replay
   * bit-identically in the SQL oracle. The exponent is fixed at 1/2
   * (not a free `pow(x, alpha)`) deliberately: `pow` is a libm call
   * with engine-varying last-ulp behavior, exactly the kind of silent
   * cross-engine drift the oracle gate exists to catch.
   *
   * Spark shape: the per-stratum counts are a bounded driver-side model
   * artifact (≤ |strata| rows — the codebook pattern, same as IVF);
   * membership is then the usual pure narrow codegen'd
   * bucket-vs-CASE-rate filter, pushed against the scan. Two jobs, no
   * extra shuffle on the corpus.
   */
  def temperatureSample(df: DataFrame, strataCol: String = "lang",
      idCol: String = "doc_id"): DataFrame = {
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(counts.nonEmpty, "temperatureSample needs a non-empty corpus")
    val cMin = counts.values.min.toDouble
    val rates = counts.map { case (s, c) =>
      s -> math.floor(100.0 * math.sqrt(cMin / c)).toLong
    }
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(0L)) {
      case (acc, (s, r)) => when(col(strataCol) === s, lit(r)).otherwise(acc)
    }
    df.filter(bucket(col(idCol)) < rate)
  }

  /** EXACT per-stratum quotas: the `n` rows of each stratum with the
    * lowest (bucket, id) rank — rate-based [[stratifiedSample]] yields
    * ~pct%, this yields exactly min(n, |stratum|) rows (the "10k docs per
    * language" requirement). Ranking by the Knuth id-bucket ([[bucket]],
    * same function as [[hashSample]]) keeps selection pseudorandom yet
    * deterministic, and aligned with [[hashSample]] membership (low
    * buckets first). One shuffle on the
    * stratum key; Spark plans the rank-filter as WindowGroupLimit, so
    * each map task forwards at most `n` rows per stratum — the full
    * stratum never materializes on one node. */
  def takePerStratum(df: DataFrame, n: Int, strataCol: String = "lang",
      idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(strataCol))
      .orderBy(bucket(col(idCol)).asc, col(idCol).asc)
    df.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= n)
      .drop("__rank")
  }

  /**
   * Downsample to a TARGET corpus mix: given target output proportions
   * per stratum (percent, summing to 100), keep the largest corpus the
   * existing data can serve at that mix (never upsampling), by
   * per-stratum rate filters. The binding stratum — the one whose data
   * runs out first at the target mix — keeps (almost) everything;
   * overrepresented strata downsample. This is the "rebalance the
   * language/source mix" step every multilingual pretraining corpus
   * goes through.
   *
   * All arithmetic is exact integer: the achievable output scale is
   * `T = min_s floor(100·n_s / pct_s)` and each stratum's keep rate is
   * `floor(pct_s · T / n_s)` ∈ [0, 100] — so membership (the shared
   * content-addressed id bucket vs the rate) is deterministic and
   * SQL-replayable. Per-stratum counts are the usual bounded driver
   * artifact. Strata absent from `targetPct` are dropped; a target
   * stratum absent from the data contributes nothing (the mix is then
   * unattainable as specified — same expected-rate semantics as
   * [[stratifiedSample]], not an exact-quota guarantee).
   */
  def mixToTarget(df: DataFrame, targetPct: Map[String, Int],
      strataCol: String = "lang", idCol: String = "doc_id"): DataFrame = {
    require(targetPct.nonEmpty && targetPct.values.forall(_ > 0),
      "target percentages must be positive")
    require(targetPct.values.sum == 100,
      s"target mix sums to ${targetPct.values.sum}, must be 100")
    val counts = df.filter(col(strataCol).isin(targetPct.keys.toSeq: _*))
      .groupBy(col(strataCol)).agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    if (counts.isEmpty) return df.filter(lit(false))
    val tMax = targetPct.flatMap { case (s, pct) =>
      counts.get(s).map(_ * 100L / pct)
    }.min
    val rate = targetPct.map { case (s, pct) =>
      s -> counts.get(s).map(n => pct * tMax / n).getOrElse(0L)
    }
    val rateCol = targetPct.keys.toSeq.sorted.foldLeft(lit(-1L)) {
      case (acc, s) => when(col(strataCol) === s, lit(rate(s))).otherwise(acc)
    }
    df.filter(bucket(col(idCol)) < rateCol)
  }

  /**
   * Deterministic epoch shuffle: a rerun-stable pseudorandom training
   * order per epoch with no global sort and no `rand()`. Each row hashes
   * — with the epoch baked into the hash input — to one of `nBuckets`
   * buckets; its within-bucket position ranks by (hash, id). A reader
   * streaming buckets 0..nBuckets-1, each in position order, sees a
   * different deterministic permutation every epoch.
   *
   * Spark shape: the bucket is a narrow codegen'd projection; the only
   * shuffle is the per-bucket rank window, which parallelizes across
   * buckets (each window partition is ~corpus/nBuckets — size nBuckets
   * so that fits an executor; there is never a single-partition global
   * window). Content-addressed like every sampler here: membership and
   * order survive reruns and input re-layout.
   */
  def epochShuffle(df: DataFrame, epoch: Int, nBuckets: Int = 32,
      idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = TextFunctions.rollingHash(
      concat(col(idCol).cast("string"), lit(s":$epoch")))
    val w = Window.partitionBy(col("bucket"))
      .orderBy(col("__h").asc, col(idCol).asc)
    df.select(col(idCol), h.as("__h"))
      .withColumn("bucket", pmod(col("__h"), lit(nBuckets.toLong)).cast("int"))
      .withColumn("pos", row_number().over(w))
      .select(col(idCol), col("bucket"), col("pos"))
  }

  /**
   * Budget-constrained quality-first corpus snapshot: fill a training
   * token budget from the best documents first. Documents are tiered by
   * the DATA-INDEPENDENT power-of-two bucket of a quality proxy
   * (`tier = length(bin(value))` — the histogram-sketch bucketing, so no
   * global sort or single-partition window is ever needed); whole tiers
   * are kept best-first while they fit, and the boundary tier — the
   * first that would overflow the budget — is rate-sampled by the
   * content-addressed id bucket at `floor(100·remaining/tierTokens)` so
   * expected kept tokens land on the budget. Tiers below the boundary
   * are dropped.
   *
   * Spark shape (100 TB posture): the per-tier token sums are a bounded
   * driver-side model artifact (≤ 63 rows — the codebook pattern);
   * membership is then a pure narrow codegen'd filter on (tier, bucket),
   * pushed against the scan. All boundary math is exact integer
   * arithmetic (sums, cumulative sums over ≤ 63 tiers, one integer
   * division), so the snapshot — like every sampler here — is
   * deterministic, rerun-stable, and exactly SQL-replayable.
   *
   * Precondition: `valueCol` must be non-null and non-negative. A null
   * value would make the tier group null (`getInt` below throws); a
   * negative one hits Spark `bin()`'s 64-bit two's-complement rendering
   * where DuckDB's `bin()` renders at the declared integer width —
   * silent cross-engine divergence. Rows violating it are dropped up
   * front so both failure modes are unreachable, and the drop is part of
   * the operator's contract (a doc with no usable quality proxy cannot
   * be tiered).
   */
  def tokenBudgetSample(df0: DataFrame, budgetTokens: Long,
      valueCol: String = "n_chars", idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(budgetTokens >= 0, s"budgetTokens=$budgetTokens must be >= 0")
    val df = df0.filter(col(valueCol).isNotNull && col(valueCol) >= 0)
    val tier = length(bin(col(valueCol)))
    val sums = df
      .select(tier.as("__tier"),
        size(TextFunctions.tokens(col(textCol))).cast("long").as("__nt"))
      .groupBy(col("__tier")).agg(sum(col("__nt")).as("__s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(-_._1) // best (largest value tier) first
    var cum = 0L
    var boundary: Option[(Int, Long)] = None // (tier, rate)
    sums.foreach { case (t, s) =>
      if (boundary.isEmpty && cum + s > budgetTokens) {
        boundary = Some((t, 100L * (budgetTokens - cum) / s))
      }
      cum += s
    }
    boundary match {
      case None => df // the whole corpus fits the budget
      case Some((bt, rate)) =>
        df.filter(tier > bt || (tier === bt && bucket(col(idCol)) < rate))
    }
  }

  /**
   * Deterministic weighted sampling without replacement: the `n` rows
   * with the smallest priority key `(u · 10⁶) div w`, where `u` is the
   * id's Knuth hash folded to [0, 2²⁰) and `w` the row's weight — the
   * integer surrogate of Efraimidis–Spirakis exponential-jump sampling
   * (a row's inclusion odds scale ~linearly with its weight, membership
   * is a pure function of (id, weight) — re-runs and backfills agree,
   * unlike any `rand()` formulation). Ties broken by id: the selected
   * SET is total-order deterministic. NULL and negative weights are
   * excluded (the [[tokenBudgetSample]] precondition); weight 0 is
   * clamped to 1 rather than dividing by zero.
   *
   * Spark shape: the key is a narrow codegen'd projection; the global
   * smallest-n cut plans as `TakeOrderedAndProject` — each partition
   * forwards at most `n` rows, no full sort ever materializes. Driver
   * holds n rows; keep n bounded (the top-k contract, q25's shape).
   */
  /**
   * Pareto-frontier selection over two maximize-objectives: keep exactly
   * the rows no other row DOMINATES (another row ≥ on both objectives
   * and > on at least one) — the skyline operator (Börzsönyi, Kossmann,
   * Stocker, "The Skyline Operator", ICDE 2001). The curation face: of
   * "long AND lexically rich" (or "high quality AND high novelty") docs,
   * the frontier is the set where you cannot improve one axis without
   * giving up the other — a scale-free shortlist no threshold pair can
   * express. Ties on BOTH axes are all kept (no strict dominance).
   *
   * Spark shape (100 TB posture): the corpus reduces to one (x → max y)
   * hash agg with map-side partials; the ONLY window (prefix max of
   * `max y` over strictly-greater x) runs over DISTINCT X VALUES —
   * bounded by x's cardinality, never the corpus; the verdict joins back
   * on the x equi-key. A row survives iff `y = maxy(x)` (no same-x
   * dominator) and `y > gtmax(x)` (no greater-x dominator). The corpus
   * never sorts — the q138 equi-depth treatment applied to skylines.
   */
  def paretoFrontier(df: DataFrame, xCol: Column, yCol: Column,
      idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pts = df.select(col(idCol), xCol.cast("long").as("x"),
        yCol.cast("long").as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
    val gx = pts.groupBy(col("x")).agg(max(col("y")).as("__maxy"))
    val w = Window.orderBy(col("x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val gg = gx.withColumn("__gtmax", max(col("__maxy")).over(w))
    pts.join(gg, Seq("x"))
      .filter(col("y") === col("__maxy") &&
        (col("__gtmax").isNull || col("__gtmax") < col("y")))
      .select(col(idCol), col("x"), col("y"))
  }

  /**
   * Deterministic mixture schedule via stride scheduling (Waldspurger &
   * Weihl 1995): within each content-addressed bucket, documents of
   * each stratum are enumerated and assigned the virtual-time key
   * `rank·100 div weight` — ordering by it interleaves strata
   * PROPORTIONALLY to their weights at every prefix (a 70/30 mix is
   * 70/30 after every ~10 rows, not just at the end), which is what a
   * training loader needs from a materialized mixture order. All
   * integer arithmetic; ties broken by (stratum, id).
   *
   * Spark shape: one shuffle on (bucket, stratum) for the per-stratum
   * rank windows, then per-BUCKET schedule positions — the global
   * order is (bucket, schedule_pos), so no global sort ever runs and
   * buckets parallelize (the q84 epoch-shuffle scale argument).
   * Zero-weight strata are excluded.
   */
  def mixtureSchedule(df: DataFrame, weights: Map[String, Int],
      strataCol: String = "lang", idCol: String = "doc_id",
      nBuckets: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(weights.values.forall(_ >= 0), "weights must be non-negative")
    val w = weights.toSeq.sortBy(_._1).foldLeft(lit(0L)) {
      case (acc, (s, v)) => when(col(strataCol) === s, lit(v.toLong)).otherwise(acc)
    }
    // Hash straight into [0, nBuckets) — composing the percent bucket
    // (mod 100) with mod nBuckets would hand buckets 0..(100 % nBuckets - 1)
    // a systematically larger share (4/100 vs 3/100 at nBuckets = 32),
    // skewing "equal" parallel buckets by a third.
    val bucketed = df.select(col(idCol), col(strataCol))
      .withColumn("__w", w).filter(col("__w") > 0)
      .withColumn("bucket", pmod(graft.functions.TextFunctions.mix32(
        pmod(col(idCol).cast("long"), lit(IdFold))), lit(nBuckets.toLong)))
    val rankW = Window.partitionBy(col("bucket"), col(strataCol))
      .orderBy(col(idCol).asc)
    val posW = Window.partitionBy(col("bucket"))
      .orderBy(col("__vt").asc, col(strataCol).asc, col(idCol).asc)
    bucketed
      .withColumn("__rn", row_number().over(rankW).cast("long"))
      .withColumn("__vt", expr("(__rn * 100) div __w"))
      .withColumn("schedule_pos", row_number().over(posW).cast("long"))
      .select(col(idCol), col(strataCol), col("bucket"), col("schedule_pos"))
  }

  /**
   * Exact-k consistent sample: the k rows with the smallest Knuth-mix
   * id hashes — a uniform sample of EXACTLY k (the pct-based
   * [[hashSample]] only lands near its rate), still deterministic,
   * rerun-stable, and NESTED (the k-sample is a prefix of the
   * k+1-sample, so growing a debugging sample never churns rows).
   * `sample_rank` is the stable enumeration order a downstream "first
   * m of the sample" cut uses.
   *
   * Spark shape: a narrow hash projection and ONE distributed
   * `TakeOrderedAndProject` under the total (hash, id) order — each
   * map task forwards at most k rows, no global sort; the final rank
   * window sees exactly k rows.
   */
  def consistentTopKSample(df: DataFrame, k: Int,
      idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k=$k must be >= 1")
    val h = graft.functions.TextFunctions.mix32(
      pmod(col(idCol).cast("long"), lit(IdFold)))
    df.withColumn("__h", h)
      .orderBy(col("__h").asc, col(idCol).asc)
      .limit(k)
      .withColumn("sample_rank", row_number()
        .over(Window.orderBy(col("__h").asc, col(idCol).asc)).cast("long"))
      .drop("__h")
  }

  /**
   * Reshard movement plan: when a content-addressed shard layout grows
   * from `oldN` to `newN` shards, which (old, new) cells carry how many
   * docs and which of those are MOVES — the cost estimate a storage
   * migration runs before touching a byte. Shard ids are the shared
   * content-addressed bucket (mod oldN / mod newN), so the plan is
   * deterministic and reproducible by any engine from ids alone.
   *
   * Spark shape: one narrow projection + ONE bounded hash aggregation
   * (≤ oldN·newN rows) with map-side partials; the total folds out of
   * the cell table with a metadata-scale window for the moved share.
   */
  def reshardPlan(df: DataFrame, oldN: Int, newN: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(oldN >= 1 && newN >= 1, "shard counts must be >= 1")
    val b = bucket(col(idCol))
    val cells = df.select((b % oldN).as("old_shard"), (b % newN).as("new_shard"))
    // total via a window over the ≤ oldN·newN cell table — one scan,
    // never a second pass over the raw table for the same number
    val totalW = org.apache.spark.sql.expressions.Window.partitionBy()
    cells.groupBy(col("old_shard"), col("new_shard"))
      .agg(count(lit(1)).as("n_docs"))
      .select(col("old_shard"), col("new_shard"), col("n_docs"),
        (col("old_shard") =!= col("new_shard")).as("moves"),
        (col("n_docs").cast("double") /
          sum(col("n_docs")).over(totalW).cast("double")).as("doc_share"))
  }

  /**
   * Token-budget allocation sheet: a global token budget split across
   * strata by literal percent weights, compared against what each
   * stratum actually has — allocated vs available, the integer-exact
   * fill rate numerator/denominator, and the deficit. The planning
   * artifact computed BEFORE [[tokenBudgetSample]] runs: a stratum that
   * can't fill its allocation forces either a weight change or
   * up-sampling, and this sheet is where that decision is made.
   *
   * Spark shape: ONE hash aggregation over the stratum key (map-side
   * partial token sums); the weight CASE-chain rides the plan as
   * literals over sorted keys (the [[stratifiedSample]] determinism
   * contract). Unlisted strata get weight 0 (allocated 0, never a
   * deficit).
   */
  def budgetAllocation(df: DataFrame, budgetTokens: Long,
      weights: Map[String, Int], strataCol: String = "lang",
      textCol: String = "text"): DataFrame = {
    require(budgetTokens >= 0, "budget must be >= 0")
    val pct = weights.toSeq.sortBy(_._1).foldLeft(lit(0L)) {
      case (acc, (s, w)) => when(col(strataCol) === s, lit(w.toLong)).otherwise(acc)
    }
    val raw = lit(budgetTokens) * pct
    val allocated = ((raw - pmod(raw, lit(100L))) / lit(100.0)).cast("long")
    df.select(col(strataCol),
        size(graft.functions.TextFunctions.tokens(col(textCol)))
          .cast("long").as("__tok"))
      .groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_docs"), sum(col("__tok")).as("available_tokens"))
      .withColumn("allocated_tokens", allocated)
      .select(col(strataCol), col("n_docs"), col("available_tokens"),
        col("allocated_tokens"),
        (col("allocated_tokens") > col("available_tokens")).as("underfilled"),
        greatest(lit(0L), col("allocated_tokens") - col("available_tokens"))
          .as("deficit_tokens"))
  }

  /**
   * Per-group document cap — the CommonCrawl-style curation rule "no
   * domain may contribute more than n documents", applied by a
   * deterministic priority (score desc, id asc) so the kept set is the
   * group's best-n, not an arbitrary n. The anti-concentration step a
   * mixture-weighted corpus needs before any sampling: one viral domain
   * otherwise floods its stratum's budget.
   *
   * Spark shape: one shuffle on the group key, then a rank window whose
   * `row_number <= n` filter sits directly above it — Spark plans this as
   * `WindowGroupLimit`, so each map task forwards at most n rows per
   * group (partial top-k before the exchange); the full group never
   * sorts on one node. Skew posture: a group's survivors are bounded at
   * n, so the post-filter side is flat regardless of input skew.
   */
  def capPerGroup(df: DataFrame, n: Int, groupCol: String,
      scoreCol: String, idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n >= 1, s"n=$n must be >= 1")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= n)
  }

  def weightedSample(df: DataFrame, n: Int, weightCol: String = "n_chars",
      idCol: String = "doc_id"): DataFrame = {
    require(n >= 0, s"n=$n must be >= 0")
    val u = graft.functions.TextFunctions.mix32(
      pmod(col(idCol).cast("long"), lit(IdFold))) % 1048576L
    val key = expr(s"__u * 1000000 div greatest($weightCol, 1)")
    df.filter(col(weightCol).isNotNull && col(weightCol) >= 0)
      .withColumn("__u", u)
      .withColumn("wkey", key)
      .orderBy(col("wkey").asc, col(idCol).asc)
      .limit(n)
      .drop("__u")
  }
}
