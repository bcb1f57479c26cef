package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/**
 * Text-analysis operators for training-data pipelines: corpus statistics,
 * per-document quality scoring, language identification, and content
 * fingerprinting. North-star extensions beyond the reference's single
 * lookup operator (SURVEY.md §2.2/§2.3 Tier B).
 *
 * Scale notes (100 TB posture):
 *   - `quality` / `languageId` / `fingerprint` are pure per-row projections
 *     — no shuffle, fully parallel, whole-stage-codegen'd expression trees.
 *     They read only the columns they use, so Parquet column pruning keeps
 *     the scan narrow.
 *   - `stats` is a single hash aggregation with map-side partial
 *     aggregation; sums are over 64-bit integers (exact, order-insensitive)
 *     and ratios are computed from the final integer sums, so results do
 *     not depend on partitioning or aggregation order.
 */
object TextAnalysis {

  /** Per-group corpus statistics. Integer sums only (order-insensitive);
    * averages derived from the sums by one double division. */
  def stats(docs: DataFrame, groupCol: String = "lang", textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    docs
      .select(col(groupCol), length(col(textCol)).as("chars").cast("long"),
        size(toks).cast("long").as("toks"))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum("chars").as("sum_chars"),
        sum("toks").as("sum_tokens"))
      .withColumn("avg_chars", col("sum_chars").cast("double") / col("n_docs"))
      .withColumn("avg_tokens", col("sum_tokens").cast("double") / col("n_docs"))
  }

  /** Per-document quality metrics: token counts (whitespace and BPE-ish),
    * type-token ratio, stopword ratio, mean token length, and a boolean
    * quality gate. All ratios are single divisions of exact integers, so
    * they are bit-deterministic across engines. */
  def quality(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    val nToks = size(toks)
    val nUniq = size(array_distinct(toks))
    val stops = markerCount(col(textCol), LangMarkers.head._2) // English stopword list
    val meanTokLen = (length(col(textCol)) - (nToks - 1)).cast("double") / nToks
    val ttr = nUniq.cast("double") / nToks
    val stopRatio = stops.cast("double") / nToks
    docs.select(
      col(idCol),
      nToks.as("n_tokens"),
      nUniq.as("n_uniq_tokens"),
      bpeTokenCount(col(textCol)).as("n_bpe_tokens"),
      ttr.as("ttr"),
      stopRatio.as("stop_ratio"),
      meanTokLen.as("mean_token_len"),
      (nToks >= 10 && ttr >= 0.1 && stopRatio <= 0.5).as("quality_ok"))
  }

  /** Per-group exact percentiles of a numeric column. Spark's `percentile`
    * and DuckDB's `quantile_cont` share the linear-interpolation definition,
    * so results are bit-identical on integer inputs. Exact percentiles sort
    * per group; at 100 TB swap in `approx_percentile` (t-digest sketch,
    * mergeable map-side) when the rank error budget allows. */
  def percentiles(docs: DataFrame, groupCol: String = "lang",
      valueCol: String = "n_chars"): DataFrame =
    docs.groupBy(col(groupCol)).agg(
      percentile(col(valueCol), lit(0.5)).as("p50"),
      percentile(col(valueCol), lit(0.9)).as("p90"),
      percentile(col(valueCol), lit(0.99)).as("p99"))

  /** Subtotal/total aggregation over a dimension hierarchy via ROLLUP:
    * (lang, source) → per-pair, per-lang, grand-total rows (nulls mark
    * rolled-up levels). One shuffle; partial aggregation map-side. */
  def rollupStats(docs: DataFrame, dims: Seq[String] = Seq("lang", "source"),
      textCol: String = "text"): DataFrame =
    docs.rollup(dims.map(col): _*).agg(
      count(lit(1)).as("n_docs"),
      sum(length(col(textCol)).cast("long")).as("sum_chars"))

  /** Deterministic text normalization for training corpora: lowercase,
    * strip non-alphanumerics, collapse runs of spaces, trim. Pure per-row
    * codegen'd projection. */
  def normalize(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
      trim(regexp_replace(
        regexp_replace(lower(col(textCol)), "[^a-z0-9 ]", ""),
        " +", " ")).as("text_norm"))

  /** Email pattern shared with the SQL oracle — syntax restricted to the
    * subset with identical semantics in Java regex and RE2 (character
    * classes, +, bounded repetition; no lookaround). */
  val EmailRegex = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Long digit runs (phone/account-number shaped). */
  val LongNumberRegex = "[0-9]{7,}"

  /** PII redaction for training corpora: emails → `<EMAIL>`, 7+-digit
    * runs → `<NUM>`, with per-doc match counts for audit rollups. Emails
    * are replaced FIRST so a number embedded in an address cannot leak
    * through as a digit run. Pure per-row codegen'd projection (regex
    * passes, no shuffle); both patterns live in the Java-regex∩RE2
    * subset, so the operator replays exactly in the oracle. */
  def redact(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
      size(regexp_extract_all(col(textCol), lit(EmailRegex), lit(0))).as("n_emails"),
      size(regexp_extract_all(col(textCol), lit(LongNumberRegex), lit(0))).as("n_numbers"),
      regexp_replace(
        regexp_replace(col(textCol), EmailRegex, "<EMAIL>"),
        LongNumberRegex, "<NUM>").as("text_redacted"))

  /** Top-k rows per group by a ranking column (descending), deterministic
    * via the id tiebreak — the distributed "best n per key" pattern.
    * Spark plans this as WindowGroupLimit: the top-k is taken partially
    * map-side before the shuffle, so the full group never materializes. */
  def topKPerGroup(docs: DataFrame, k: Int, groupCol: String = "lang",
      rankCol: String = "n_chars", idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(rankCol).desc, col(idCol).asc)
    docs.select(col(idCol), col(groupCol), col(rankCol))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Curriculum buckets: per-group NTILE over a quality proxy
    * (descending, id tiebreak for a total order → deterministic bucket
    * edges). The standard "schedule easy-to-hard / sample by quality
    * tier" preprocessing step; one shuffle on the group key. */
  def qualityBuckets(docs: DataFrame, nBuckets: Int = 10,
      groupCol: String = "lang", rankCol: String = "n_chars",
      idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(rankCol).desc, col(idCol).asc)
    docs.select(col(idCol), col(groupCol), col(rankCol))
      .withColumn("bucket", ntile(nBuckets).over(w))
  }

  /** Sequence packing for training: documents are laid out contiguously
    * per group in id order, and each document is assigned to the
    * fixed-token-budget sequence containing its start offset (greedy
    * contiguous fill — documents may straddle a boundary; the trainer's
    * sample-splitting handles that, as usual for packed pretraining data).
    * Integer-exact: one window cumulative sum and integer division, so
    * the layout is deterministic and SQL-replayable.
    *
    * One shuffle on `groupCol`. With few/huge groups (e.g. packing a
    * whole language), partition instead by a composite key — e.g.
    * `(lang, Sampling.bucket(id))` — and pack each bucket independently;
    * packing quality is unaffected since sequences never span groups. */
  def packSequences(docs: DataFrame, budgetTokens: Int,
      groupCol: String = "lang", idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nToks = size(tokens(col(textCol))).cast("long")
    docs.select(col(idCol), col(groupCol), nToks.as("n_tokens"))
      .withColumn("start_off", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col(idCol), col(groupCol), col("n_tokens"),
        expr(s"start_off div $budgetTokens").as("seq_id"),
        pmod(col("start_off"), lit(budgetTokens.toLong)).as("seq_offset"))
  }

  /** Gopher-style repetition signals per document: the share of the most
    * frequent token (`top_tok_ratio`) and the duplicate-2-gram fraction
    * (`dup_2gram_ratio`), plus a boolean gate — boilerplate, spam, and
    * generation loops score high on both. Pure per-row projection (native
    * one-pass expressions, no shuffle); every ratio is a single division
    * of exact integers, so the whole operator SQL-replays bit-identically.
    * 2-gram uniqueness is counted over rolling hashes on BOTH engines, so
    * the (cosmically rare) hash collision cannot cause oracle drift. */
  def repetition(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val nToks = size(tokens(col(textCol))).cast("long")
    val top = topTokenCount(col(textCol))
    val n2 = greatest(nToks - 1, lit(0L))
    val uniq2 = size(shingleHashes(col(textCol), 2)).cast("long")
    val topRatio = top.cast("double") / nToks
    val dupRatio = when(n2 > 0, (n2 - uniq2).cast("double") / n2).otherwise(lit(0.0))
    graft.SparkUtil.ensureParallelism(docs).select(
      col(idCol),
      nToks.as("n_tokens"),
      top.as("top_tok_count"),
      topRatio.as("top_tok_ratio"),
      n2.as("n_2grams"),
      uniq2.as("uniq_2grams"),
      dupRatio.as("dup_2gram_ratio"),
      (topRatio <= 0.2 && dupRatio <= 0.5).as("repetition_ok"))
  }

  /** Vocabulary construction: the `k` most frequent tokens corpus-wide
    * with term frequency and document frequency (the IDF ingredient) —
    * the relational core of tokenizer training. Plan shape: explode →
    * hash agg with map-side partial counts (at most |vocab| rows cross
    * the shuffle per map task) → `TakeOrderedAndProject` top-k (no global
    * sort). The (freq desc, token asc) order is total, so the cut at `k`
    * is deterministic and SQL-replayable. */
  def vocabulary(docs: DataFrame, k: Int = 1000, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("freq"), countDistinct(col(idCol)).as("doc_freq"))
      .orderBy(col("freq").desc, col("token").asc)
      .limit(k)

  /** Language identification by stopword-marker voting: all marker lists
    * counted in ONE native tokenization pass projected into a counts
    * column, then the CASE-chain vote reads `element_at` off that array —
    * two stacked projections (Catalyst keeps them split because the
    * counts column is referenced many times), instead of one regex scan
    * per language per row. */
  def languageId(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol), col(textCol), langMarkerCounts(col(textCol)).as("__mc"))
      .select(col(idCol),
        langIdFromCounts(col("__mc"), col(textCol)).as("lang_pred"))

  /** Content fingerprints: MD5 (exact-dup key), a base-31 rolling hash
    * (cheap order-sensitive fingerprint), and a 32-bit SimHash (near-dup
    * fingerprint). Per-row, no shuffle. */
  def fingerprint(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    graft.SparkUtil.ensureParallelism(docs).select(
      col(idCol),
      md5(col(textCol)).as("md5_hex"),
      rollingHash(col(textCol)).as("rolling_hash"),
      simhash(tokens(col(textCol))).as("simhash"))
}
