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
  // ---- Bloom filter (membership sketch) ----------------------------------
  //
  // Same philosophy as the HLL above: public arithmetic end to end so the
  // construction is SQL-replayable and the filter is a portable ARTIFACT
  // (an array of longs), not engine-internal state. Positions use the
  // Kirsch-Mitzenmacher double-hash family over the 60-bit md5-prefix
  // hash: pos_i = (h1 + i*h2) mod mBits with h1 = top 30 bits and
  // h2 = 2*(low 30 bits)+1 (odd). Words hold 63 bits, not 64, so every
  // bit mask stays a positive signed long in every engine (DuckDB's
  // BIGINT shift of bit 63 would overflow).

  /** Bits per Bloom word (63 keeps `1 << (pos mod 63)` positive). */
  val BloomWordBits = 63

  /** The k absolute bit positions of `value` in an `mBits`-wide filter.
    *
    * `portable = true` (default) derives them from the md5-based
    * [[hash60]] so the exact bit pattern replays in DuckDB SQL — the
    * q44/q45 contract. `portable = false` swaps in `xxhash64 & (2⁶⁰−1)`:
    * not SQL-replayable, but codegen'd native and ~10× cheaper per row —
    * the right choice when the filter is a pure runtime artifact whose
    * effect is invisible in the result (e.g. [[graft.SparkUtil.bloomPrunedJoin]],
    * where the join erases false positives). Build and probe must use
    * the SAME flag — the positions ARE the filter. */
  def bloomPositions(value: Column, mBits: Int, k: Int,
      portable: Boolean = true): Seq[Column] = {
    require(k >= 1 && mBits >= BloomWordBits, s"need k >= 1 and mBits >= $BloomWordBits")
    val h =
      if (portable) hash60(value)
      else xxhash64(value).bitwiseAND(lit((1L << 60) - 1))
    val h1 = shiftright(h, 30)
    val h2 = h.bitwiseAND(lit((1L << 30) - 1)) * 2 + 1
    (0 until k).map(i => pmod(h1 + lit(i.toLong) * h2, lit(mBits.toLong)))
  }

  /**
   * Distributed Bloom build: the sparse word table (word_idx, bits) of the
   * distinct values of `valueCol` — a `bit_or` aggregation, so the state
   * is mergeable exactly like HLL registers (element-wise OR across
   * partial builds) and the shuffle is bounded at `mBits/63` rows per map
   * task regardless of input size.
   */
  def bloomWords(df: DataFrame, valueCol: String, mBits: Int = 1 << 16,
      k: Int = 5, portable: Boolean = true): DataFrame =
    df.where(col(valueCol).isNotNull) // a null key has no bit positions
      .select(explode(array(
        bloomPositions(col(valueCol), mBits, k, portable): _*)).as("__pos"))
      .select(expr(s"__pos div $BloomWordBits").as("word_idx"),
        expr(s"shiftleft(CAST(1 AS BIGINT), CAST(__pos % $BloomWordBits AS INT))").as("__mask"))
      .groupBy(col("word_idx"))
      .agg(expr("bit_or(__mask)").as("bits"))

  /** Merge two Bloom word tables by element-wise OR — set bits only
    * accumulate, so shard filters fold in any tree shape into exactly
    * the filter built over the union of their inputs. */
  def mergeBloomWords(a: DataFrame, b: DataFrame): DataFrame =
    a.union(b)
      .groupBy(col("word_idx"))
      .agg(expr("bit_or(bits)").as("bits"))

  /** Collect a word table into the dense long-array artifact (driver-side;
    * `mBits/63 + 1` longs — a 2^20-bit filter is ~16 KB). */
  def bloomArray(df: DataFrame, valueCol: String, mBits: Int = 1 << 16,
      k: Int = 5, portable: Boolean = true): Array[Long] = {
    val words = new Array[Long](mBits / BloomWordBits + 1)
    bloomWords(df, valueCol, mBits, k, portable).collect().foreach { r =>
      words(r.getLong(0).toInt) = r.getLong(1)
    }
    words
  }

  /** Right shift by a column-valued amount (the DSL `shiftright` only
    * accepts a literal shift). */
  private def shr(v: Column, n: Column): Column = {
    val b = org.apache.spark.sql.graft.ColumnBridge
    b.column(org.apache.spark.sql.catalyst.expressions.ShiftRight(
      b.expression(v), b.expression(n)))
  }

  /** Membership predicate against a literal word array: all `k` bits set.
    * A pure per-row expression — the filter rides the plan as a literal
    * (like the IVF codebook), so probing shuffles NOTHING and joins
    * NOTHING. False positives possible (callers verify exactly); false
    * negatives impossible. */
  def bloomMightContain(value: Column, words: Array[Long], mBits: Int,
      k: Int = 5, portable: Boolean = true): Column = {
    val wordsCol = typedLit(words.toSeq)
    bloomPositions(value, mBits, k, portable).map { pos =>
      val bitIdx = pmod(pos, lit(BloomWordBits.toLong)).cast("int")
      // (pos - bitIdx) is an exact multiple of 63 and pos < 2^31, so the
      // double division is exact before the int cast
      val wordIdx = ((pos - bitIdx) / lit(BloomWordBits)).cast("int")
      shr(element_at(wordsCol, wordIdx + 1), bitIdx)
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }

  // ---- Count-min sketch (frequency estimation) ---------------------------
  //
  // The frequency member of the family: depth×width counter grid, each
  // occurrence increments one cell per row (positions from the same
  // Kirsch-Mitzenmacher family as the Bloom filter), point estimate =
  // min over the depth cells. Overestimates only (collisions add, never
  // subtract); construction is a pure count aggregation, so the grid
  // merges by cell-wise SUM and is bit-replayable in SQL.

  /** Sparse CMS grid over the rows of `df` (one increment per row):
    * (row_idx, col_idx, cnt). Values are pre-aggregated (a plain
    * wordcount with map-side partial counts) BEFORE the ×depth position
    * explode, so the explode and the cell aggregation run over distinct
    * values, not raw occurrences — cells then accumulate the value
    * weights. At most depth×width cells per map task either way, but the
    * occurrence-heavy first stage stays a bare hash aggregation. */
  def cmsTable(df: DataFrame, valueCol: String, width: Int = 1024,
      depth: Int = 4): DataFrame =
    df.groupBy(col(valueCol)).agg(count(lit(1)).as("__w"))
      .select(col("__w"), explode(array(
        bloomPositions(col(valueCol), width, depth).zipWithIndex.map {
          case (pos, i) => struct(lit(i).as("i"), pos.as("pos"))
        }: _*)).as("__c"))
      .select(col("__c.i").as("row_idx"), col("__c.pos").as("col_idx"), col("__w"))
      .groupBy(col("row_idx"), col("col_idx"))
      .agg(sum(col("__w")).as("cnt"))

  /** Merge two CMS grids by cell-wise SUM — associative and commutative
    * (counts only add), so shard grids fold in any tree shape into
    * exactly the whole-corpus grid. */
  def mergeCmsTables(a: DataFrame, b: DataFrame): DataFrame =
    a.union(b)
      .groupBy(col("row_idx"), col("col_idx"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Collect the grid into the dense artifact (row-major, depth×width
    * longs — 4×1024 is 32 KB). */
  def cmsArray(df: DataFrame, valueCol: String, width: Int = 1024,
      depth: Int = 4): Array[Long] = {
    val grid = new Array[Long](width * depth)
    cmsTable(df, valueCol, width, depth).collect().foreach { r =>
      grid(r.getInt(0) * width + r.getLong(1).toInt) = r.getLong(2)
    }
    grid
  }

  /** Point frequency estimate against a literal grid: min over the depth
    * cells — a pure per-row expression (no join, no shuffle), like
    * [[bloomMightContain]]. Never underestimates. */
  def cmsEstimate(value: Column, grid: Array[Long], width: Int = 1024,
      depth: Int = 4): Column = {
    val gridCol = typedLit(grid.toSeq)
    least(bloomPositions(value, width, depth).zipWithIndex.map {
      case (pos, i) => element_at(gridCol, pos.cast("int") + (i * width + 1))
    }: _*)
  }

  // ---- Log-histogram quantile sketch -------------------------------------
  //
  // The quantile member of the sketch family (distinct = HLL, membership =
  // Bloom): per-group counts over DATA-INDEPENDENT power-of-two buckets
  // (`bucket = length(bin(v))`, i.e. floor(log2 v) + 1 — the same integer
  // bin() trick as the HLL rank, identical in both engines), so partial
  // sketches merge by summing counts. Quantile estimates interpolate
  // linearly inside the straddling bucket with integer arithmetic until
  // one final division — bit-replayable in SQL, unlike approx_percentile's
  // merge-order-dependent t-digest. Relative error is bounded by the
  // bucket width (factor-of-2 buckets → estimate within [lo, hi) of the
  // true value's bucket).

  /**
   * Per-group quantile estimates from the log-histogram sketch.
   * `percentiles` are integer percents; `valueCol` must be a positive
   * integer column. Output: one row per (keys..., pct) with the estimate.
   *
   * Scale shape: one `groupBy(keys, bucket)` with map-side partial counts
   * (≤ 63 buckets per group cross the wire), a ≤63-row-per-group window
   * cumsum, and a tiny per-percentile filter — no sort of the data, no
   * full materialization.
   */
  def histogramQuantiles(df: DataFrame, keys: Seq[String], valueCol: String,
      percentiles: Seq[Int] = Seq(50, 90, 99)): DataFrame =
    quantilesFromBucketCounts(bucketCounts(df, keys, valueCol), keys,
      percentiles)

  /** The sketch STATE: per-group counts over the data-independent
    * power-of-two buckets — this is the table shards persist and
    * [[mergeBucketCounts]] folds (buckets are value-determined, so
    * partial counts from any shard partition sum to the whole-corpus
    * counts exactly — the HLL/Bloom/CMS mergeability contract for
    * quantiles). */
  def bucketCounts(df: DataFrame, keys: Seq[String],
      valueCol: String): DataFrame =
    df.select((keys.map(col) :+
        length(bin(col(valueCol))).cast("int").as("bucket")): _*)
      .groupBy((keys.map(col) :+ col("bucket")): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Merge two bucket-count sketches by cell-wise SUM — associative and
    * commutative, so any shard tree folds identically. */
  def mergeBucketCounts(a: DataFrame, b: DataFrame,
      keys: Seq[String]): DataFrame =
    a.union(b)
      .groupBy((keys.map(col) :+ col("bucket")): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Quantile estimates from a (possibly merged) bucket-count table —
    * [[histogramQuantiles]]'s estimation half exposed for merged state. */
  def quantilesFromBucketCounts(counts: DataFrame, keys: Seq[String],
      percentiles: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(percentiles.nonEmpty && percentiles.forall(p => p >= 1 && p <= 100))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(keys.map(col): _*)
    val cum = counts
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(wAll))
    // One pass for ALL percentiles: explode the pct list against the tiny
    // cumulative table instead of unioning one aggregation per percentile
    // (which would re-run the corpus groupBy once per requested quantile).
    // Integer target rank t; the straddling bucket has cumBefore < t <= cum.
    cum.withColumn("pct", explode(array(percentiles.map(lit(_)): _*)))
      .withColumn("__t", expr("greatest((n * pct) div 100, 1)"))
      .filter(col("cum") >= col("__t") && (col("cum") - col("cnt")) < col("__t"))
      .select((keys.map(col) :+ col("pct") :+
        // lo + (t - cumBefore) * (hi - lo) / cnt, integer until the division
        expr("""CAST(shiftleft(CAST(1 AS BIGINT), bucket - 1) AS DOUBLE) +
               |CAST((__t - (cum - cnt)) *
               |     (shiftleft(CAST(1 AS BIGINT), bucket) - shiftleft(CAST(1 AS BIGINT), bucket - 1))
               |  AS DOUBLE) / CAST(cnt AS DOUBLE)""".stripMargin).as("estimate")): _*)
  }

  /** Standard HLL bias-correction constant for 2^p registers — public so
    * the SQL oracle generator interpolates the identical double. */
  def alpha(p: Int): Double = p match {
    case 4 => 0.673
    case 5 => 0.697
    case 6 => 0.709
    case _ => 0.7213 / (1.0 + 1.079 / (1 << p))
  }

  /** Distinct-count estimate from a REGISTER TABLE — [[approxDistinct]]'s
    * math exposed for externally built or [[mergeRegisters]]-merged
    * state, which is what enables HLL SET ALGEBRA: estimates of A, B and
    * the merged A∪B give `|A∩B| ≈ est(A) + est(B) - est(A∪B)` without
    * ever co-scanning the two sides (q91). */
  def estimateFromRegisters(regs: DataFrame, keys: Seq[String],
      p: Int): DataFrame = {
    val m = 1 << p
    val maxRank = 60 - p + 1
    // shiftleft by a column needs the SQL spelling (the Scala DSL only
    // accepts a literal shift amount)
    val term = expr(s"shiftleft(CAST(1 AS BIGINT), $maxRank - register)")
    val grouped = if (keys.isEmpty) regs.groupBy() else regs.groupBy(keys.map(col): _*)
    grouped
      .agg(
        (sum(term) + (lit(m.toLong) - count(lit(1))) * lit(1L << maxRank)).as("s_int"),
        (lit(m.toLong) - count(lit(1))).as("v_zero"))
      .select((keys.map(col) :+ col("s_int") :+ col("v_zero") :+
        (lit(alpha(p) * m * m) * lit((1L << maxRank).toDouble) / col("s_int").cast("double"))
          .as("hll_estimate")): _*)
  }

  def approxDistinct(df: DataFrame, keys: Seq[String], valueCol: String,
      p: Int = 4): DataFrame =
    estimateFromRegisters(hllRegisters(df, keys, valueCol, p), keys, p)

  /**
   * EXACT heavy hitters by the two-pass Misra–Gries scheme (Misra &
   * Gries 1982; the distributed form of SpaceSaving): all values whose
   * exact count exceeds `total/(capacity+1)`, with their exact counts.
   *
   * Pass 1 runs a `capacity`-counter MG summary PER PARTITION
   * (`mapPartitions` — the designated imperative escape hatch, justified
   * because MG's decrement step is genuine per-partition mutable state
   * Spark's aggs can't express in bounded memory when the value domain
   * is unbounded). MG guarantees any value with local count >
   * localN/(capacity+1) survives locally; summing across partitions, a
   * value with GLOBAL count > total/(capacity+1) must exceed the local
   * threshold somewhere (averaging argument), so the union of survivors
   * is a candidate SUPERSET — never a miss. The same pass also counts
   * the partition's rows, so the global total rides along in the one
   * per-partition summary row instead of costing a second scan. Pass 2
   * recounts ONLY the candidates exactly (a literal `isin` filter —
   * `capacity × numPartitions` strings ride the plan, nothing joins) and
   * applies the exact integer cross-multiplied threshold, so the output
   * is bit-identical to the brute-force GROUP BY the oracle runs — while
   * the full value domain never shuffles (the brute force's hash agg
   * over an unbounded domain is the thing that dies at 100 TB). Two
   * scans total; the driver-side artifact stays bounded at one
   * `(count, ≤capacity keys)` row per partition.
   */
  def heavyHittersExact(df: DataFrame, value: Column,
      capacity: Int): DataFrame = {
    require(capacity >= 1, s"capacity=$capacity must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df.select(value.cast("string").as("value"))
      .where(col("value").isNotNull)
    val summaries = vals.as[String].mapPartitions { it =>
      val c = scala.collection.mutable.HashMap.empty[String, Long]
      var localN = 0L
      it.foreach { v =>
        localN += 1
        c.get(v) match {
          case Some(n) => c.update(v, n + 1)
          case None if c.size < capacity => c.update(v, 1L)
          case None => // decrement-all: snapshot keys, then mutate
            c.keysIterator.toArray.foreach { k =>
              val n = c(k) - 1
              if (n == 0L) c.remove(k) else c.update(k, n)
            }
        }
      }
      Iterator.single((localN, c.keysIterator.toArray))
    }.collect()
    val total = summaries.iterator.map(_._1).sum
    val candidates = summaries.iterator.flatMap(_._2).toSeq.distinct
    val empty = vals.groupBy(col("value"))
      .agg(count(lit(1)).as("n")).where(lit(false))
    if (candidates.isEmpty) empty
    else vals.where(col("value").isin(candidates: _*))
      .groupBy(col("value")).agg(count(lit(1)).as("n"))
      .where(col("n") * lit(capacity + 1L) > lit(total))
  }
}
