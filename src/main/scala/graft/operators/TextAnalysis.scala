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
      textCol: String = "text"): DataFrame =
    packSequencesBy(docs, budgetTokens,
      size(tokens(col(textCol))).cast("long"), groupCol, idCol)

  /** [[packSequences]] with an arbitrary per-document token-weight
    * column (e.g. a trained tokenizer's emitted-token count) instead of
    * the whitespace count. Same layout contract and scale shape: one
    * shuffle on `groupCol`, integer-exact offsets. */
  def packSequencesBy(docs: DataFrame, budgetTokens: Int,
      weight: Column, groupCol: String = "lang",
      idCol: String = "doc_id"): DataFrame =
    // distributed per-group cumulative offsets (r16 opt, guide §2.4):
    // the plain PARTITION BY group window runs each group — at corpus
    // scale, each LANGUAGE — on one task; groupedCumSum computes the
    // identical ROWS-frame offsets with range partitioning + bounded
    // per-(group, partition) offset tables (scale-adaptive: provably
    // small inputs keep the plain window, so the local plan is
    // unchanged). doc ids are unique, the frame's determinism
    // precondition either way.
    graft.SparkUtil.groupedCumSum(
        docs.select(col(idCol), col(groupCol),
          weight.cast("long").as("n_tokens")),
        groupCol, idCol, "n_tokens", "start_off")
      .withColumn("start_off", col("start_off") - col("n_tokens"))
      .select(col(idCol), col(groupCol), col("n_tokens"),
        expr(s"start_off div $budgetTokens").as("seq_id"),
        pmod(col("start_off"), lit(budgetTokens.toLong)).as("seq_offset"))

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

  /**
   * Zipf rank-frequency checkpoints: token frequency at literal ranks
   * under the (freq desc, token asc) total order, with the rank·freq
   * product — the corpus-linguistics sanity probe (organic text keeps
   * rank·freq roughly constant; synthetic or templated corpora bend
   * the curve, which is exactly what this fixture shows). Ranks past
   * the vocabulary simply have no row — absence IS the signal that the
   * vocabulary is tiny.
   *
   * Spark shape: one token-count aggregation with map-side partials,
   * a distributed TakeOrderedAndProject cut at max(ranks) (never a
   * global sort), then a rank window over those ≤ max(ranks) rows.
   * Exact integers end to end.
   */
  def zipfCheckpoints(docs: DataFrame,
      ranks: Seq[Int] = Seq(1, 2, 4, 8, 16),
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(ranks.nonEmpty && ranks.forall(_ >= 1), s"bad ranks $ranks")
    val maxR = ranks.max
    val top = docs.select(explode(tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token").asc)
      .limit(maxR)
    top
      .withColumn("rank", row_number().over(
        Window.orderBy(col("freq").desc, col("token").asc)).cast("long"))
      .filter(col("rank").isin(ranks.map(_.toLong): _*))
      .select(col("rank"), col("token"), col("freq"),
        (col("rank") * col("freq")).as("rank_times_freq"))
  }

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

  /** Boilerplate phrases whose presence alone fails a document — the
    * C4-style blacklist (placeholder text, cookie-wall fragments). Fixed
    * and public so the SQL oracle replays the rule. */
  val BlacklistPhrases: Seq[String] = Seq("lorem ipsum", "enable javascript")

  /**
   * C4/Gopher-style composite quality filter: the rule battery a web-scale
   * pretraining pipeline applies before any expensive processing. Each
   * rule is a named boolean (so rejection reasons roll up per-rule), plus
   * `n_failed` and the final `keep` verdict:
   *
   *   - `ok_n_tokens`: token count within [minTokens, maxTokens]
   *     (C4 drops pages with < 5 sentences; Gopher keeps 50..100k words);
   *   - `ok_tok_len`: mean token length within [minMeanTokLen,
   *     maxMeanTokLen] (Gopher's 3..10 — gibberish and DNA strings fail);
   *   - `ok_repetition`: most-frequent-token share <= maxTopTokRatio
   *     (Gopher's repetition gate, shared signal with [[repetition]]);
   *   - `ok_stopwords`: at least minStopwords stopword hits (Gopher's
   *     "has >= 2 stop words" natural-language check);
   *   - `ok_blacklist`: contains no [[BlacklistPhrases]] substring.
   *
   * Pure per-row codegen'd projection — no shuffle, no UDF; every signal
   * is integer counting or a single exact-integer division, so the whole
   * battery SQL-replays bit-identically. At 100 TB this runs pushed
   * against the scan, and downstream operators see only survivors.
   */
  /** The [[qualityFilter]] rule battery reduced to one boolean verdict —
    * for callers that only need pass/fail (e.g. domain reputation).
    * MUST stay in sync with qualityFilter's rules; both sides share the
    * same building blocks (tokens / topTokenCount / markerCount /
    * BlacklistPhrases), so a rule change edits both or neither. */
  def qualityKeep(text: Column, minTokens: Int = 15, maxTokens: Int = 100000,
      minMeanTokLen: Double = 4.0, maxMeanTokLen: Double = 12.0,
      maxTopTokRatio: Double = 0.2, minStopwords: Int = 2): Column = {
    val nToks = size(tokens(text))
    val meanTokLen = (length(text) - (nToks - 1)).cast("double") / nToks
    val topRatio = topTokenCount(text).cast("double") / nToks
    val stops = markerCount(text, LangMarkers.head._2)
    Seq(nToks >= minTokens && nToks <= maxTokens,
      meanTokLen >= minMeanTokLen && meanTokLen <= maxMeanTokLen,
      topRatio <= maxTopTokRatio,
      stops >= minStopwords,
      BlacklistPhrases.map(p => !text.contains(p)).reduce(_ && _))
      .reduce(_ && _)
  }

  def qualityFilter(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", minTokens: Int = 15, maxTokens: Int = 100000,
      minMeanTokLen: Double = 4.0, maxMeanTokLen: Double = 12.0,
      maxTopTokRatio: Double = 0.2, minStopwords: Int = 2): DataFrame = {
    val nToks = size(tokens(col(textCol)))
    val meanTokLen = (length(col(textCol)) - (nToks - 1)).cast("double") / nToks
    val topRatio = topTokenCount(col(textCol)).cast("double") / nToks
    val stops = markerCount(col(textCol), LangMarkers.head._2)
    val okN = nToks >= minTokens && nToks <= maxTokens
    val okLen = meanTokLen >= minMeanTokLen && meanTokLen <= maxMeanTokLen
    val okRep = topRatio <= maxTopTokRatio
    val okStop = stops >= minStopwords
    val okBlack = BlacklistPhrases
      .map(p => !col(textCol).contains(p)).reduce(_ && _)
    val rules = Seq(okN, okLen, okRep, okStop, okBlack)
    val nFailed = rules.map(r => when(r, 0).otherwise(1)).reduce(_ + _)
    docs.select(col(idCol),
      nToks.as("n_tokens"),
      meanTokLen.as("mean_token_len"),
      topRatio.as("top_tok_ratio"),
      stops.as("n_stopwords"),
      okN.as("ok_n_tokens"),
      okLen.as("ok_tok_len"),
      okRep.as("ok_repetition"),
      okStop.as("ok_stopwords"),
      okBlack.as("ok_blacklist"),
      nFailed.as("n_failed"),
      (nFailed === 0).as("keep"))
  }

  /**
   * Overlapping token-window chunking: each document becomes
   * `ceil(n / stride)` chunks of up to `chunkTokens` tokens, with
   * consecutive chunks overlapping by `chunkTokens - stride` tokens — the
   * RAG-indexing / fixed-context-window preprocessing step. Emits
   * (doc, chunk_id, chunk_start, n_chunk_tokens, chunk_hash), where
   * `chunk_hash` is the base-31 rolling hash of the chunk text — a
   * content-exact fingerprint of every chunk without an array-typed (or
   * giant string) output column.
   *
   * Pure narrow row expansion (one explode over the chunk starts) — no
   * shuffle, no UDF; integer arithmetic plus the shared rolling hash, so
   * the layout and fingerprints SQL-replay exactly. A short document
   * (fewer than `chunkTokens` tokens) yields one truncated chunk.
   *
   * Relies on the tokenizer invariant `n >= 1`: `split` of ANY string —
   * including the empty string — returns at least one (possibly empty)
   * token in both Spark and DuckDB, so `sequence(0, n-1, stride)` here
   * and the oracle's `range(0, n, stride)` emit the same >= 1 chunk
   * starts. (An earlier `greatest(n-1, 0)` guard pinned a one-chunk
   * answer for an unreachable n=0 case the oracle pinned as zero
   * chunks; the guard is gone so the two contracts cannot disagree
   * even in the degenerate case.)
   */
  def chunk(docs: DataFrame, chunkTokens: Int = 64, stride: Int = 48,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(stride > 0 && stride <= chunkTokens,
      s"stride=$stride must be in (0, chunkTokens=$chunkTokens]")
    val toks = tokens(col(textCol))
    docs
      .select(col(idCol), toks.as("__toks"), size(toks).as("__n"))
      .select(col(idCol), col("__toks"), col("__n"),
        explode(sequence(lit(0), col("__n") - 1, lit(stride)))
          .as("chunk_start"))
      .select(col(idCol),
        (col("chunk_start") / stride).cast("long").as("chunk_id"),
        col("chunk_start"),
        least(lit(chunkTokens), col("__n") - col("chunk_start")).as("n_chunk_tokens"),
        rollingHash(concat_ws(" ",
          slice(col("__toks"), col("chunk_start") + 1, lit(chunkTokens))))
          .as("chunk_hash"))
  }

  /**
   * Feature-hashing document vectors (the "hashing trick"): each token is
   * hashed to one of `d` dimensions (`mix32(rollingHash(tok)) mod d` — the
   * same public mix as SimHash bit sampling), and the document's vector is
   * the per-dimension occurrence count. Reported as (nnz, l1, checksum)
   * where `fh_checksum = Σ_dim (count_dim · 31^dim) mod p` — an
   * order-insensitive content-exact fingerprint of the sparse vector, so
   * no array-typed output column is needed (q59's checksum pattern).
   *
   * This is the cheap text→vector bridge: it feeds clustering and
   * similarity operators when no trained embedding exists. Spark shape:
   * ONE native codegen'd expression per row (`FeatureHashSummary` — a
   * local `long[d]` histogram, no explode, no shuffle), so at 100 TB the
   * vectorizer is a pure narrow projection pushed against the scan.
   * [[featureHashAgg]] is the relational twin, spec-pinned identical.
   */
  def featureHash(docs: DataFrame, d: Int = 32, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol), featureHashSummary(col(textCol), d).as("__s"))
      .select(col(idCol),
        element_at(col("__s"), 1).as("nnz"),
        element_at(col("__s"), 2).as("l1"),
        element_at(col("__s"), 3).as("fh_checksum"))

  /** Relational (explode → count → agg) twin of [[featureHash]]: two hash
    * aggregations with map-side partial counts, at most `d` rows per doc
    * crossing the second shuffle. Kept as the cross-formulation parity
    * check (and the shape the SQL oracle replays); checksum terms are
    * reduced mod p BEFORE the sum so DuckDB's trapping BIGINT arithmetic
    * never overflows. */
  def featureHashAgg(docs: DataFrame, d: Int = 32, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(d > 0, s"d=$d must be positive")
    val p = HashPrime
    val pow31 = Seq.iterate(1L, d)(x => x * 31 % p)
    val dims = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("__tok"))
      .select(col(idCol),
        pmod(mix32(rollingHash(col("__tok"))), lit(d.toLong)).as("__dim"))
    dims.groupBy(col(idCol), col("__dim")).agg(count(lit(1)).as("__cnt"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("nnz"),
        sum(col("__cnt")).as("l1"),
        (sum(pmod(pmod(col("__cnt"), lit(p)) *
          element_at(typedLit(pow31), (col("__dim") + 1).cast("int")), lit(p)))
          % p).as("fh_checksum"))
  }

  /**
   * Rare-token scoring: per document, the share of token occurrences
   * whose corpus-wide document frequency is at most `rareMaxDf` — a cheap
   * perplexity surrogate (OOV/typo/gibberish density) used both as a
   * quality signal (high rare share ⇒ noise) and a diversity signal
   * (zero rare share ⇒ boilerplate). Two-pass relational shape: the
   * document-frequency table is one explode + distinct + hash agg (the
   * [[vocabulary]] aggregation), then token occurrences equi-join it with
   * map-side partial counts on both sides; every ratio is one division of
   * exact integers. At 100 TB the df table is vocabulary-bounded — orders
   * of magnitude smaller than the corpus — and AQE broadcasts it when it
   * fits.
   */
  def rareTokenScore(docs: DataFrame, rareMaxDf: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val occ = graft.SparkUtil.trackCache(
      docs.select(col(idCol), explode(tokens(col(textCol))).as("__tok")))
    val dfreq = occ.distinct().groupBy(col("__tok"))
      .agg(count(lit(1)).as("__df"))
    val nRare = sum(when(col("__df") <= rareMaxDf, 1L).otherwise(0L))
    occ.join(dfreq, "__tok")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        nRare.as("n_rare_tokens"),
        (nRare.cast("double") / count(lit(1))).as("rare_ratio"))
  }

  /**
   * Per-document keyword extraction by TF-IDF ORDERING: each document's
   * top-`k` tokens ranked by (term frequency desc, document frequency
   * asc, token asc) — frequent-in-this-doc but rare-in-the-corpus wins.
   * Ranking by the integer (tf, df) pair instead of a float `tf·log(N/df)`
   * score is deliberate: the order is the same monotone preference and
   * the whole operator stays integer-exact (a free `log` is a libm call
   * with engine-varying last-ulp behavior — exactly the cross-engine
   * drift the oracle gate exists to catch).
   *
   * Spark shape: token occurrences aggregate to per-doc term frequencies
   * and a vocabulary-bounded document-frequency table (both with map-side
   * partial counts), equi-join on the token, and the per-doc cut is a
   * rank window planned as `WindowGroupLimit` — at most `k` rows per doc
   * leave each map task. The (tf desc, df asc, token asc) order is total
   * per document, so the cut is deterministic.
   */
  def keywords(docs: DataFrame, k: Int = 3, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val occ = graft.SparkUtil.trackCache(
      docs.select(col(idCol), explode(tokens(col(textCol))).as("token")))
    val tf = occ.groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val dfreq = occ.distinct().groupBy(col("token")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tf").desc, col("df").asc, col("token").asc)
    tf.join(dfreq, "token")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("token"), col("tf"), col("df"), col("rank"))
  }

  /**
   * Per-group robust scaling (median/IQR normalization) of a numeric
   * column — the outlier-insensitive feature scaling for curriculum
   * scheduling and quality-signal fusion: `(v - median) / (q3 - q1)`,
   * 0 when the IQR collapses. The per-group quantile row is a bounded
   * model artifact (≤ |groups| rows) broadcast back onto the corpus, so
   * the scan side never shuffles. Exact percentiles share the
   * linear-interpolation definition with the oracle's `quantile_cont`,
   * and the scale arithmetic is plain IEEE subtraction/division of those
   * shared doubles — bit-identical in both engines. At 100 TB swap
   * `percentile` for `approx_percentile` when the rank-error budget
   * allows (the scaling join is unchanged).
   */
  def robustScale(docs: DataFrame, groupCol: String = "lang",
      valueCol: String = "n_chars", idCol: String = "doc_id"): DataFrame = {
    val stats = docs.groupBy(col(groupCol)).agg(
      percentile(col(valueCol), lit(0.25)).as("__q1"),
      percentile(col(valueCol), lit(0.5)).as("__med"),
      percentile(col(valueCol), lit(0.75)).as("__q3"))
    docs.select(col(idCol), col(groupCol), col(valueCol))
      .join(broadcast(stats), groupCol)
      .select(col(idCol), col(groupCol), col(valueCol),
        when(col("__q3") === col("__q1"), lit(0.0))
          .otherwise((col(valueCol) - col("__med")) / (col("__q3") - col("__q1")))
          .as("scaled"))
  }

  /**
   * Vocabulary coverage curve: for each rank k ≤ `maxRank` of the corpus
   * vocabulary (by occurrence count), the cumulative share of all token
   * OCCURRENCES the top-k tokens cover — the curve that sizes a
   * tokenizer vocabulary budget ("how big must V be for 95% coverage").
   *
   * Spark shape: token counts aggregate with map-side partials; the
   * top-`maxRank` cut is a distributed `TakeOrderedAndProject` under the
   * total (count desc, token asc) order, so the ONLY single-partition
   * work — the cumulative-sum window — runs over ≤ maxRank rows, never
   * the full vocabulary. The denominator is one scalar aggregate
   * broadcast back; coverage is a single division of exact integers.
   */
  def coverageCurve(docs: DataFrame, maxRank: Int = 30,
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = graft.SparkUtil.trackCache(
      docs.select(explode(tokens(col(textCol))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("n")))
    val top = counts.orderBy(col("n").desc, col("token").asc).limit(maxRank)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n").desc, col("token").asc)))
    val total = counts.agg(sum(col("n")).as("__total"))
    top.crossJoin(broadcast(total))
      .select(col("rank"), col("token"), col("n"),
        sum(col("n")).over(Window.orderBy(col("rank"))).as("cum_n"),
        col("__total"))
      .select(col("rank"), col("token"), col("n"), col("cum_n"),
        (col("cum_n").cast("double") / col("__total").cast("double"))
          .as("coverage"))
  }

  /**
   * Corpus drift report — per-token chi-square contributions between two
   * corpus versions over the pooled top-`k` vocabulary: which tokens'
   * frequencies shifted, by how much, with the standard 2×N contingency
   * statistic. The drift audit run before swapping a corpus version into
   * a training mix (a global KL would need transcendentals and an
   * order-dependent float sum; per-token chi-square contributions are
   * pure rational arithmetic on exact counts, so every row replays
   * bit-identically — rank and sum downstream however you like).
   *
   * Spark shape: one token agg per side (map-side partials), one
   * full-outer equi-join on the token, a distributed top-k cut under the
   * (pooled count desc, token asc) total order, and the two scalar
   * totals broadcast back. Expected counts and contributions are
   * left-assoc double chains mirrored exactly in the oracle.
   */
  def corpusDrift(docsA: DataFrame, docsB: DataFrame, k: Int = 30,
      textCol: String = "text"): DataFrame = {
    def counts(d: DataFrame, as: String) =
      d.select(explode(tokens(col(textCol))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as(as))
    val j = graft.SparkUtil.trackCache(
      counts(docsA, "ca").join(counts(docsB, "cb"), Seq("token"), "full_outer")
        .select(col("token"), coalesce(col("ca"), lit(0L)).as("ca"),
          coalesce(col("cb"), lit(0L)).as("cb")))
    val tot = j.agg(sum(col("ca")).as("__ta"), sum(col("cb")).as("__tb"))
    val top = j.orderBy((col("ca") + col("cb")).desc, col("token").asc).limit(k)
    val caD = col("ca").cast("double")
    val cbD = col("cb").cast("double")
    val grand = (col("__ta") + col("__tb")).cast("double")
    val eA = ((col("ca") + col("cb")) * col("__ta")).cast("double") / grand
    val eB = ((col("ca") + col("cb")) * col("__tb")).cast("double") / grand
    top.crossJoin(broadcast(tot))
      .select(col("token"), col("ca").as("cnt_a"), col("cb").as("cnt_b"),
        (caD / col("__ta").cast("double")).as("share_a"),
        (cbD / col("__tb").cast("double")).as("share_b"),
        ((caD - eA) * (caD - eA) / eA + (cbD - eB) * (cbD - eB) / eB)
          .as("chi2"))
  }

  /** One row per char trigram position of `textCol` (labelled by
    * `keyCol`) — shared by the language-profile train and infer stages.
    * Character semantics (not bytes) in both engines, so CJK text
    * trigram-izes identically. */
  private def charTrigrams(docs: DataFrame, keyCol: String,
      textCol: String): DataFrame =
    graft.SparkUtil.ensureParallelism(docs)
      .filter(length(col(textCol)) >= 3)
      // one-pass codegen'd slicer (r16 opt, guide §4): the transform+
      // substring spelling re-walked the string per position — O(len²)
      // per doc, the dominant CPU of the q88 train/infer stages
      .select(col(keyCol).as("k"),
        explode(graft.functions.TextFunctions.charTrigrams(col(textCol)))
          .as("tri"))

  /**
   * TRAIN a character-trigram language profile: per language, the top-`m`
   * trigrams by corpus count — the classic n-gram-profile language
   * identifier (Cavnar & Trenkle), here as the train half of a
   * train-then-infer pair (see [[classifyByProfile]]). Unlike the
   * marker-list heuristic ([[languageId]]), the profile is LEARNED from
   * the labelled corpus — the model-artifact pattern with a trained
   * artifact instead of a literal one.
   *
   * Integer counts with a total (count desc, trigram asc) tiebreak make
   * the learned profile — not just its scores — exactly reproducible and
   * SQL-replayable. One hash agg (map-side partials over the bounded
   * trigram space) + a WindowGroupLimit cut.
   */
  def trainLangProfiles(docs: DataFrame, m: Int = 50, langCol: String = "lang",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = charTrigrams(docs, langCol, textCol)
      .groupBy(col("k").as(langCol), col("tri")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col(langCol)).orderBy(col("n").desc, col("tri").asc)
    counts.withColumn("rank", row_number().over(w)).filter(col("rank") <= m)
  }

  /**
   * INFER with a trained trigram profile: each document is scored per
   * language by how many of its DISTINCT char trigrams appear in that
   * language's profile, and labelled with the argmax (score desc, lang
   * asc — total order). Documents sharing no trigram with any profile
   * drop out (no evidence, no verdict — the inner-join contract).
   *
   * Spark shape: the profile is a ≤ langs·m-row broadcast artifact; doc
   * trigrams dedupe with one hash agg and equi-join the profile — the
   * corpus never shuffles whole rows, only (doc, trigram) pairs, and the
   * argmax is a WindowGroupLimit cut.
   */
  def classifyByProfile(docs: DataFrame, profiles: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      langCol: String = "lang"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docTri = charTrigrams(docs, idCol, textCol).distinct()
    val scores = docTri
      .join(broadcast(profiles.select(col(langCol), col("tri"))), "tri")
      .groupBy(col("k").as(idCol), col(langCol)).agg(count(lit(1)).as("score"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("score").desc, col(langCol).asc)
    scores.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(col(idCol), col(langCol).as("pred_lang"), col("score"))
  }

  /** The (context, next) adjacent-token pairs of `textCol`, one row per
    * position — shared by [[bigramLm]] and [[bigramNovelty]]. */
  private def bigramPairs(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    graft.SparkUtil.ensureParallelism(docs)
      .select(col(idCol).as("id"), tokens(col(textCol)).as("__t"))
      // the filter guards sub-2-token docs (they have no bigrams; and
      // Spark's sequence(1, 0) would DESCEND, not yield empty) — the
      // oracle's WHERE len(t) >= 2
      .filter(size(col("__t")) >= 2)
      // NOT rewritten to a native window expression (r16 opt, measured
      // and rejected): a codegen'd one-pass n-gram builder replacing this
      // transform+struct lambda measured a wash across every consumer
      // (q81 1.44 -> 1.41, q80 0.71 -> 0.73, q162 1.39 -> 1.47, q133
      // 1.93 -> 1.90 matched focused) — the explode/shuffle volume, not
      // the lambda, is the cost here.
      .select(col("id"), explode(expr(
        """transform(sequence(1, size(__t) - 1),
          |  i -> struct(element_at(__t, i) AS ctx,
          |              element_at(__t, i + 1) AS nxt))""".stripMargin)).as("bg"))
      .select(col("id"), col("bg.ctx").as("ctx"), col("bg.nxt").as("nxt"))

  /**
   * Count-based bigram language model: for each context token with at
   * least `minContextCount` corpus occurrences (as a bigram left side),
   * the top-`k` next tokens with their pair and context counts — the
   * mergeable count state a CCNet-style perplexity filter trains on.
   * Probabilities are left as exact integer (pair_n, ctx_n) pairs rather
   * than a float division at rank time: the ranking by (pair_n desc,
   * nxt asc) is the same monotone order and the operator stays
   * integer-exact (the repo's no-libm rule — same reasoning as
   * [[keywords]]).
   *
   * Spark shape: one hash aggregation over (ctx, nxt) with map-side
   * partials (bounded by vocabulary², in practice by corpus bigram
   * diversity), then ONE window over ctx computes both the context total
   * (sum) and the per-context cut (row_number → `WindowGroupLimit`, at
   * most k rows per context leave each map task). No joins, two
   * shuffles total.
   */
  def bigramLm(docs: DataFrame, k: Int = 3, minContextCount: Int = 20,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = bigramPairs(docs, idCol, textCol)
      .groupBy(col("ctx"), col("nxt")).agg(count(lit(1)).as("pair_n"))
    val w = Window.partitionBy(col("ctx"))
    val rank = Window.partitionBy(col("ctx"))
      .orderBy(col("pair_n").desc, col("nxt").asc)
    pairs
      .withColumn("ctx_n", sum(col("pair_n")).over(w))
      .withColumn("rnk", row_number().over(rank))
      .filter(col("rnk") <= k && col("ctx_n") >= minContextCount)
  }

  /**
   * Per-document bigram novelty: of a document's DISTINCT adjacent-token
   * bigrams, how many also occur in at least `minDocs - 1` OTHER
   * documents (document frequency >= minDocs) — the "how much of this
   * doc is phrasing the corpus already has" signal that separates
   * templated/boilerplate-heavy docs (high shared rate) from novel prose
   * (low), without an LM or a float in sight. The rate is one division
   * of exact integers.
   *
   * Spark shape: distinct (doc, bigram) pairs feed both a bounded
   * document-frequency aggregation and an equi-join back on the bigram —
   * the inverted-index pattern (never pairwise), so a hot bigram costs
   * df rows, not df². Documents shorter than 2 tokens yield no bigrams
   * and drop out (same contract as the shingle operators).
   */
  def bigramNovelty(docs: DataFrame, minDocs: Int = 2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val distinctBg = graft.SparkUtil.trackCache(
      bigramPairs(docs, idCol, textCol).distinct())
    val dfreq = distinctBg.groupBy(col("ctx"), col("nxt"))
      .agg(count(lit(1)).as("__df"))
    distinctBg.join(dfreq, Seq("ctx", "nxt"))
      .groupBy(col("id").as(idCol)).agg(
        count(lit(1)).as("n_bigrams"),
        sum(when(col("__df") >= minDocs, 1L).otherwise(0L)).as("n_shared"))
      .select(col(idCol), col("n_bigrams"), col("n_shared"),
        (col("n_shared").cast("double") / col("n_bigrams").cast("double"))
          .as("shared_rate"))
  }

  /**
   * Linear quality scorer with a literal weight vector — the inference
   * face of a trained fastText/logistic quality classifier, reduced to
   * what it is at serving time: a dot product of integer features with
   * fixed weights and a threshold. Features are quality-proxy integers
   * (token count, stopword hits, all-digit token count,
   * capitalized-token count); weights are integers, so the score and the
   * keep decision are integer-exact end to end (no sigmoid — monotone in
   * the logit, so thresholding the linear score IS thresholding the
   * probability).
   *
   * Spark shape: a pure per-row codegen'd projection — zero shuffle, the
   * model rides the plan as literals (the codebook pattern at its
   * smallest). Features are regex passes, not array-lambda filters: a
   * `filter(tokens, λ)` HOF drops the projection out of whole-stage
   * codegen (plan-pinned), while `regexp_extract_all` stays inside it.
   * Token-boundary patterns are whole-token-equivalent to the oracle's
   * `list_filter` under the single-space corpus contract — the same
   * argument [[languageId]]'s marker counting rests on.
   */
  def linearScore(docs: DataFrame,
      weights: Map[String, Long] = Map("n_tok" -> 2L, "n_stop" -> 5L,
        "n_digit" -> -3L, "n_upper" -> -1L),
      threshold: Long = 120L, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val nTok = size(tokens(col(textCol))).cast("long")
    val nStop = markerCount(col(textCol), LangMarkers.head._2).cast("long")
    val nDigit = size(regexp_extract_all(col(textCol),
      lit("(?:^| )[0-9]+(?= |$)"), lit(0))).cast("long")
    val nUpper = size(regexp_extract_all(col(textCol),
      lit("(?:^| )[A-Z]"), lit(0))).cast("long")
    val score = lit(weights("n_tok")) * nTok + lit(weights("n_stop")) * nStop +
      lit(weights("n_digit")) * nDigit + lit(weights("n_upper")) * nUpper
    docs.select(col(idCol), nTok.as("n_tok"), nStop.as("n_stop"),
      nDigit.as("n_digit"), nUpper.as("n_upper"), score.as("score"),
      (score >= threshold).as("keep"))
  }

  /**
   * Per-group rank-blend score normalization: incomparable quality
   * signals (char count, stopword density, a classifier logit) become
   * comparable by replacing each with its PERCENTILE RANK within the
   * group, then averaging — the standard rank-fusion trick for blending
   * scores with wildly different scales and tail shapes (a z-score blend
   * would let one heavy-tailed signal dominate). Rank 0 = best; ranks
   * come from the total (score desc, id asc) order, so the blend is
   * deterministic and SQL-replayable: `(rn − 1)/(n − 1)` per signal,
   * arithmetic mean across signals, all per-row fixed chains over
   * integers.
   *
   * Spark shape: one shuffle on the group key; one window pass (sort +
   * rank + group count) PER SIGNAL over the same partitioning — Spark
   * reuses the Exchange, re-sorting locally per signal. Groups are
   * language/source-sized; split giant groups with a composite key as
   * in [[packSequences]].
   */
  def rankBlend(docs: DataFrame, scoreCols: Seq[String],
      groupCol: String = "lang", idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(scoreCols.nonEmpty, "rankBlend needs at least one score column")
    val n = count(lit(1)).over(Window.partitionBy(col(groupCol)))
    val ranked = scoreCols.foldLeft(
        docs.select((idCol +: groupCol +: scoreCols).distinct.map(col): _*)
          .withColumn("__n", n)) { (d, sc) =>
      val w = Window.partitionBy(col(groupCol))
        .orderBy(col(sc).desc, col(idCol).asc)
      d.withColumn(s"__r_$sc",
        when(col("__n") === 1, lit(0.0))
          .otherwise((row_number().over(w) - 1).cast("double") /
            (col("__n") - 1).cast("double")))
    }
    val blend = scoreCols.map(sc => col(s"__r_$sc")).reduce(_ + _) /
      lit(scoreCols.size.toDouble)
    ranked.select(Seq(col(idCol), col(groupCol)) ++
      scoreCols.map(sc => col(s"__r_$sc").as(s"pct_rank_$sc")) :+
      blend.as("blended_rank"): _*)
  }

  /**
   * Source-similarity matrix: pairwise cosine between per-group token
   * count vectors — which corpus sources carry the same content mix (two
   * mirrors of one crawl score ≈ 1; disjoint domains score near 0). The
   * corpus-level face of q108's per-document similarity: run it before
   * choosing mixture weights so near-identical sources don't get double
   * weight.
   *
   * Spark shape: the corpus reduces to (group, token, count) in ONE
   * map-side-partial hash agg — bounded by |groups| × |vocab|, orders of
   * magnitude under the corpus — and every downstream step (norms, the
   * token-key self-join, the pair agg) runs over that reduced table.
   * Dots and norms are exact integer sums; only the final per-pair
   * cosine is a double.
   */
  def sourceSimilarityMatrix(docs: DataFrame, groupCol: String = "source",
      textCol: String = "text"): DataFrame = {
    val counts = graft.SparkUtil.trackCache(
      graft.SparkUtil.ensureParallelism(docs)
        .select(col(groupCol).as("g"), explode(tokens(col(textCol))).as("t"))
        .groupBy(col("g"), col("t")).agg(count(lit(1)).as("n")))
    // cached: both per-side norm joins consume it — uncached, each join
    // rebuilt the aggregate with its own full pass over counts (r16 opt;
    // one row per group, trivially small)
    val norms = graft.SparkUtil.trackCache(
      counts.groupBy("g").agg(sum(col("n") * col("n")).as("n2")))
    counts.as("a").join(counts.as("b"),
        col("a.t") === col("b.t") && col("a.g") < col("b.g"))
      .groupBy(col("a.g").as("source_a"), col("b.g").as("source_b"))
      .agg(sum(col("a.n") * col("b.n")).as("dot"))
      .join(norms.select(col("g").as("source_a"), col("n2").as("__n2a")), "source_a")
      .join(norms.select(col("g").as("source_b"), col("n2").as("__n2b")), "source_b")
      .select(col("source_a"), col("source_b"),
        (col("dot").cast("double") /
          (sqrt(col("__n2a").cast("double")) * sqrt(col("__n2b").cast("double"))))
          .as("cosine"))
  }

  /**
   * Stupid-backoff coverage audit: for every trigram position
   * (w1, w2, w3) of every document, which n-gram LM level would serve it
   * — the full trigram (corpus count ≥ `minCount`), the (w2, w3) bigram,
   * the w3 unigram, or nothing (OOV) — reported as exact per-document
   * level counts. This is the "how well does an n-gram LM cover this
   * doc" precursor to a CCNet-style perplexity filter, without a single
   * float: the backoff DECISION structure is integer-exact even though a
   * real LM's probabilities are not.
   *
   * Spark shape: the three count tables are hash aggregations with
   * map-side partials, bounded by corpus n-gram diversity (not corpus
   * size); the position stream then takes three LEFT equi-joins on
   * n-gram keys — the inverted-index pattern, never pairwise — and one
   * final per-doc aggregation. A hot n-gram costs its df, not df².
   */
  def backoffCoverage(docs: DataFrame, minCount: Int = 2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // NOT pass-shared (r16 opt, measured and rejected): deriving the
    // tri/bi/uni tables from one cached tokenized scan replaces three
    // cheap scan+split passes with one corpus-SIZE deserialized
    // token-array cache — the materialization cost more than the two
    // saved splits (q133 1.77 → 1.97 s matched focused), and at scale a
    // corpus-size cache is memory pressure, not a win (guide §5 cache
    // rule: recompute here is cheaper than the memory it buys).
    val pos = graft.SparkUtil.trackCache(
      graft.SparkUtil.ensureParallelism(docs)
        .select(col(idCol).as("id"), tokens(col(textCol)).as("__t"))
        .filter(size(col("__t")) >= 3)
        .select(col("id"), explode(expr(
          """transform(sequence(1, size(__t) - 2),
            |  i -> struct(element_at(__t, i) AS w1,
            |              element_at(__t, i + 1) AS w2,
            |              element_at(__t, i + 2) AS w3))""".stripMargin)).as("p"))
        .select(col("id"), col("p.w1").as("w1"), col("p.w2").as("w2"),
          col("p.w3").as("w3")))
    val tri = pos.groupBy(col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("__tn")).filter(col("__tn") >= minCount)
      .select(col("w1"), col("w2"), col("w3"), lit(1).as("__tri"))
    val bi = bigramPairs(docs, idCol, textCol)
      .groupBy(col("ctx"), col("nxt")).agg(count(lit(1)).as("__bn"))
      .filter(col("__bn") >= minCount)
      .select(col("ctx").as("w2"), col("nxt").as("w3"), lit(1).as("__bi"))
    val uni = docs
      .select(explode(tokens(col(textCol))).as("w3"))
      .groupBy(col("w3")).agg(count(lit(1)).as("__un"))
      .filter(col("__un") >= minCount)
      .select(col("w3"), lit(1).as("__uni"))
    pos
      .join(tri, Seq("w1", "w2", "w3"), "left_outer")
      .join(bi, Seq("w2", "w3"), "left_outer")
      .join(uni, Seq("w3"), "left_outer")
      .groupBy(col("id").as(idCol)).agg(
        count(lit(1)).as("n_positions"),
        sum(when(col("__tri").isNotNull, 1L).otherwise(0L)).as("n_tri"),
        sum(when(col("__tri").isNull && col("__bi").isNotNull, 1L)
          .otherwise(0L)).as("n_bi"),
        sum(when(col("__tri").isNull && col("__bi").isNull &&
          col("__uni").isNotNull, 1L).otherwise(0L)).as("n_uni"),
        sum(when(col("__tri").isNull && col("__bi").isNull &&
          col("__uni").isNull, 1L).otherwise(0L)).as("n_oov"))
  }

  /**
   * Dictionary phrase tagging: occurrence counts of a literal phrase
   * list in each document, emitted as (doc, phrase, n_hits > 0) rows —
   * the entity/topic tagging pass of a curation pipeline (and the
   * positive-match dual of q33's blacklist decontamination). Counting is
   * substring arithmetic — `(len(text) − len(replace(text, p, ''))) ÷
   * len(p)` — identical non-overlapping leftmost-match semantics on both
   * engines, integer-exact.
   *
   * Spark shape: the dictionary rides the plan as an array literal (the
   * codebook pattern); explode × phrase-count is a pure narrow
   * projection — zero shuffle, no join, output bounded by
   * docs × |dictionary| before the >0 filter prunes it.
   */
  def phraseMatch(docs: DataFrame, phrases: Seq[String],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(phrases.nonEmpty, "phraseMatch needs at least one phrase")
    require(phrases.forall(_.nonEmpty), "phrases must be non-empty strings")
    val dict = array(phrases.distinct.sorted.map(lit): _*)
    docs.select(col(idCol), col(textCol).as("__txt"),
        explode(dict).as("phrase"))
      .select(col(idCol), col("phrase"),
        expr("""(length(__txt) - length(replace(__txt, phrase, '')))
          | div length(phrase)""".stripMargin).cast("long").as("n_hits"))
      .filter(col("n_hits") > 0)
  }

  /**
   * Token co-occurrence association pairs (document-level market-basket
   * mining): unordered token pairs appearing together in ≥ `minSupport`
   * documents, with exact pair/marginal document frequencies, confidence
   * `P(b|a) = n_pair/df_a`, and lift `n_pair·N/(df_a·df_b)` — each a
   * SINGLE division of exact integers (bit-identical in IEEE doubles on
   * both engines, the repo's float rule).
   *
   * Scale shape: the corpus reduces to its (doc, distinct-token) posting
   * list; tokens with `df < minSupport` are pruned BEFORE pairing — a
   * LOSSLESS prune, since a pair in k docs forces both marginals ≥ k —
   * and the df table is vocabulary-bounded so the prune join broadcasts.
   * Pairing is the q14 per-doc inverted-index self-join (never corpus ×
   * corpus); per-doc cost is quadratic only in the doc's distinct
   * SURVIVING tokens, which the df prune caps for any minSupport above
   * the long tail.
   */
  def cooccurrencePairs(docs: DataFrame, minSupport: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(minSupport >= 1, s"minSupport=$minSupport must be >= 1")
    val dt = docs
      .select(col(idCol).as("__doc"),
        explode(array_distinct(split(col(textCol), " "))).as("tok"))
    val dfs = dt.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val pruned = dt.join(broadcast(dfs.where(col("df") >= minSupport)), "tok")
    val nDocs = docs.select(count(lit(1)).as("n_docs"))
    pruned.as("a").join(pruned.as("b"),
        col("a.__doc") === col("b.__doc") && col("a.tok") < col("b.tok"))
      .groupBy(col("a.tok").as("tok_a"), col("b.tok").as("tok_b"),
        col("a.df").as("df_a"), col("b.df").as("df_b"))
      .agg(count(lit(1)).as("n_pair"))
      .where(col("n_pair") >= minSupport)
      .crossJoin(broadcast(nDocs))
      .select(col("tok_a"), col("tok_b"), col("n_pair"), col("df_a"),
        col("df_b"),
        (col("n_pair").cast("double") / col("df_a").cast("double"))
          .as("conf"),
        ((col("n_pair") * col("n_docs")).cast("double") /
          (col("df_a") * col("df_b")).cast("double")).as("lift"))
  }

  /**
   * Distinctive vocabulary per source: the top-k tokens whose in-source
   * occurrence share most exceeds their corpus share — domain profiling
   * ("what is this source actually about") via the lift of exact
   * counts. Ordering uses integer-only arithmetic sized to stay inside
   * int64 at ANY corpus scale: per-million occurrence rates
   * (`n·10⁶ div total`, ≤ 10⁶ by construction) and their scaled ratio
   * `rate_src·10³ div max(rate_corpus, 1)` — no float enters the rank,
   * ties break by token, and a min-count floor keeps one-off tokens
   * off the list.
   *
   * Spark shape: the corpus tokenization explode runs ONCE — the
   * (source, token) aggregation is cached (vocab × sources bounded), and
   * every other count derives from it: corpus counts by re-aggregating
   * the cached table on the token, per-source totals by a window, and
   * the corpus total by a single-partition window over the same bounded
   * join (metadata-scale — never the raw explode again). The per-source
   * top-k cut is a rank window (`WindowGroupLimit`). (An earlier shape
   * re-derived the explode three times — per-source, corpus, and the
   * broadcast corpus-total crossJoin — tripling the tokenization scan.)
   */
  def distinctiveVocab(docs: DataFrame, k: Int = 5, minCount: Int = 5,
      sourceCol: String = "source", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1 && minCount >= 1, "k and minCount must be >= 1")
    val tok = docs.select(col(sourceCol).as("g"),
      explode(tokens(col(textCol))).as("tok"))
    val bySrc = graft.SparkUtil.trackCache(tok.groupBy(col("g"), col("tok"))
      .agg(count(lit(1)).as("n_source")))
    val byCorpus = bySrc.groupBy(col("tok"))
      .agg(sum(col("n_source")).as("n_corpus"))
    val srcTotal = Window.partitionBy(col("g"))
    val corpusTotal = Window.partitionBy()
    val joined = bySrc.join(byCorpus, Seq("tok"))
      .withColumn("__st", sum(col("n_source")).over(srcTotal))
      .withColumn("__ct", sum(col("n_source")).over(corpusTotal))
      .filter(col("n_source") >= minCount)
      // per-million rates: n·10⁶ stays in int64 up to 9.2e12 occurrences
      // of one token in one source (beyond any real corpus); the corpus
      // rate floors at 1 so the ratio never divides by zero
      .withColumn("__rs", expr("(n_source * 1000000) div __st"))
      .withColumn("__rc", expr("greatest((n_corpus * 1000000) div __ct, 1)"))
      .withColumn("__lift", expr("(__rs * 1000) div __rc"))
    val rank = Window.partitionBy(col("g"))
      .orderBy(col("__lift").desc, col("tok").asc)
    joined.withColumn("rank", row_number().over(rank))
      .filter(col("rank") <= k)
      .select(col("g").as(sourceCol), col("tok"), col("n_source"),
        col("n_corpus"), col("__lift").as("lift_millis"), col("rank"))
  }

  /**
   * Source quality-ranking stability: rank sources by q63 pass rate on
   * two hash-halves independently and report the rank shift per source
   * plus the squared difference (the per-source term of Spearman's
   * footrule/ρ numerator — left as exact integers rather than a
   * correlation, so the report replays bit-identically and the big
   * movers are named, not averaged away). A stable ranking means
   * source-level curation decisions generalize; a large d² flags a
   * source whose quality verdict depends on which half you sampled.
   *
   * Spark shape: the battery's per-row projection, ONE aggregation to
   * (source, half) pass counts (bounded by 2·|sources|), two rank
   * windows over that bounded table, one equi-join on the source.
   * Ranks order by (pass-rate desc, source asc) via exact integer
   * cross-multiplied comparison — no float rate enters the ordering.
   */
  def sourceRankStability(docs: DataFrame, newPct: Int = 50,
      idCol: String = "doc_id", sourceCol: String = "source"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qf = qualityFilter(docs.select(col(idCol), col("text")))
      .select(col(idCol), col("keep"))
      .join(docs.select(col(idCol), col(sourceCol)), Seq(idCol))
      .withColumn("__new", Sampling.bucket(col(idCol)) < newPct)
    val per = qf.groupBy(col(sourceCol), col("__new"))
      .agg(sum(when(col("keep"), 1L).otherwise(0L)).as("__pass"),
        count(lit(1)).as("__n"))
    // Rank by pass rate without a float in the ordering: the exact
    // integer key pass·10⁶ div n preserves the rate order down to 1e-6
    // rate differences (below that the source tiebreak pins the order,
    // identically in both engines, so the report still replays
    // exactly); 10⁶ keeps the product inside int64 even at
    // trillion-row sources.
    val key = expr("(__pass * 1000000) div __n")
    val w = Window.partitionBy(col("__new"))
      .orderBy(key.desc, col(sourceCol).asc)
    val ranked = per.withColumn("__rk", row_number().over(w).cast("long"))
    val a = ranked.filter(!col("__new"))
      .select(col(sourceCol), col("__rk").as("rank_old"))
    val b = ranked.filter(col("__new"))
      .select(col(sourceCol), col("__rk").as("rank_new"))
    a.join(b, Seq(sourceCol))
      .select(col(sourceCol), col("rank_old"), col("rank_new"),
        (col("rank_new") - col("rank_old")).as("rank_shift"),
        ((col("rank_new") - col("rank_old")) *
          (col("rank_new") - col("rank_old"))).as("d2"))
  }

  /**
   * Language confusion matrix: declared metadata label × q11-predicted
   * label with cell counts and row shares — the classifier-eval
   * artifact behind q176's per-doc verdicts (which languages get
   * mistaken for which, not just how often). Row share is one exact
   * integer division per cell.
   *
   * Spark shape: the detector's per-row codegen'd projection, one
   * equi-join on the id, ONE hash aggregation on ≤ |langs|² cells, and
   * a broadcast of per-declared-label totals back onto the cells.
   */
  def langConfusionMatrix(docs: DataFrame, idCol: String = "doc_id",
      langCol: String = "lang"): DataFrame = {
    val cells = languageId(docs.select(col(idCol), col("text")))
      .join(docs.select(col(idCol), col(langCol).as("declared")), Seq(idCol))
      .groupBy(col("declared"), col("lang_pred"))
      .agg(count(lit(1)).as("n_docs"))
    val rowTotals = cells.groupBy(col("declared"))
      .agg(sum(col("n_docs")).as("__rt"))
    cells.join(broadcast(rowTotals), Seq("declared"))
      .select(col("declared"), col("lang_pred"), col("n_docs"),
        (col("n_docs").cast("double") / col("__rt").cast("double"))
          .as("row_share"))
  }

  /**
   * Vocabulary growth curve (Heaps' law measurement): distinct-token
   * vocabulary size at each literal id checkpoint — the "is the corpus
   * still teaching new words?" curve that decides whether more crawl is
   * worth ingesting. Exact: each token's FIRST document is a min
   * aggregation; a checkpoint's vocabulary is the count of tokens whose
   * first doc id precedes it — no per-checkpoint rescan, the corpus is
   * tokenized once.
   *
   * PRECONDITION — checkpoints are ID thresholds, not row counts: a
   * checkpoint c means "vocabulary among docs with id < c", which equals
   * "vocabulary after the first c documents" ONLY when ids are dense and
   * 0-based (true for the fixture corpus). With sparse or offset ids,
   * pick checkpoints in id space, or pre-rank: an exact distributed
   * dense rank needs a range-partitioned sort plus a per-partition
   * offset cumsum (a global `row_number` window would single-partition
   * the corpus — the anti-pattern this operator deliberately avoids).
   * The precondition is load-bearing, so by default (`strict = true`)
   * it is ASSERTED with one cheap bounded aggregation (min/max/count of
   * the id column — a narrow column scan, no shuffle beyond the
   * single-row agg) and a sparse-id corpus fails loudly; pass
   * `strict = false` to deliberately interpret checkpoints in raw id
   * space.
   *
   * Spark shape: distinct (token, doc) pairs → ONE min aggregation per
   * token (bounded by vocabulary), then `stack` over the literal
   * checkpoint list turns conditional sums into the long-form curve —
   * ONE scalar-row aggregation regardless of checkpoint count. The
   * new_tokens delta is a lag over ≤ |checkpoints| rows.
   */
  def vocabGrowthCurve(docs: DataFrame, checkpoints: Seq[Long],
      idCol: String = "doc_id", textCol: String = "text",
      strict: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(checkpoints.nonEmpty && checkpoints == checkpoints.sorted,
      "checkpoints must be non-empty and ascending")
    if (strict) {
      val r = docs.agg(min(col(idCol)).cast("long"),
        max(col(idCol)).cast("long"), count(col(idCol))).head()
      val n = r.getLong(2)
      require(n == 0 || (r.getLong(0) == 0L && r.getLong(1) == n - 1),
        s"vocabGrowthCurve checkpoints are 'first c documents' only for " +
          s"dense 0-based $idCol ids; got min=${r.get(0)} max=${r.get(1)} " +
          s"n=$n. Pass strict = false to read checkpoints as raw id " +
          "thresholds instead.")
    }
    val firstDoc = docs
      .select(col(idCol).as("__d"), explode(array_distinct(
        tokens(col(textCol)))).as("__t"))
      .groupBy(col("__t")).agg(min(col("__d")).as("__first"))
    val aggs = checkpoints.zipWithIndex.map { case (c, i) =>
      sum(when(col("__first") < c, 1L).otherwise(0L)).as(s"__v$i")
    }
    val onePass = firstDoc.agg(aggs.head, aggs.tail: _*)
    val stackArgs = checkpoints.zipWithIndex
      .map { case (c, i) => s"${c}L, __v$i" }.mkString(", ")
    onePass
      .selectExpr(s"stack(${checkpoints.size}, $stackArgs) AS (checkpoint, vocab_size)")
      .withColumn("new_tokens", col("vocab_size") -
        coalesce(lag(col("vocab_size"), 1)
          .over(Window.orderBy(col("checkpoint"))), lit(0L)))
  }

  /**
   * Character-class profile per language: exact counts of lowercase,
   * uppercase, digit, space, and other characters with the alphabetic
   * share — the encoding/quality sanity sheet that catches mojibake,
   * digit-dump tables, and wrong-script content before any tokenizer
   * sees the text. Counts are per-row regex passes summed exactly; the
   * single ratio is one division of those sums.
   *
   * Spark shape: one narrow codegen'd projection, ONE hash aggregation
   * with map-side partials; output is the language space.
   */
  /**
   * Quality-rule co-failure matrix: for every unordered pair of the
   * q63 battery's rules, the per-rule fail counts, the both-fail
   * count, and the co-failure Jaccard — near-1 overlap means one rule
   * is (on this corpus) redundant and its regex/scan cost is free to
   * drop; near-0 means the rules catch disjoint failure modes and the
   * battery earns its width. The rule-economics audit behind tuning a
   * gate that runs on every document of a 100 TB corpus.
   *
   * Spark shape: ONE pass — all 5 + 10 conditional counts fold in a
   * single scalar aggregation over the battery projection, then a
   * `stack` unpivot to the 10-row long form (the q158 one-scan rule).
   */
  def ruleCofailureMatrix(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val battery = qualityFilter(docs, idCol, textCol)
    val rules = Seq("ok_n_tokens", "ok_tok_len", "ok_repetition",
      "ok_stopwords", "ok_blacklist")
    val pairs = for {
      i <- rules.indices; j <- (i + 1) until rules.size
    } yield (rules(i), rules(j))
    val failAggs = rules.map(r =>
      sum(when(!col(r), 1L).otherwise(0L)).as(s"__f_$r"))
    val bothAggs = pairs.map { case (a, b) =>
      sum(when(!col(a) && !col(b), 1L).otherwise(0L)).as(s"__b_${a}__$b")
    }
    val all = failAggs ++ bothAggs
    val stackArgs = pairs.map { case (a, b) =>
      s"'$a', '$b', __f_$a, __f_$b, __b_${a}__$b"
    }.mkString(", ")
    battery.agg(all.head, all.tail: _*)
      .select(expr(s"stack(${pairs.size}, $stackArgs)" +
        " AS (rule_a, rule_b, n_fail_a, n_fail_b, n_both_fail)"))
      .withColumn("cofail_jaccard",
        when(col("n_fail_a") + col("n_fail_b") - col("n_both_fail") > 0,
          col("n_both_fail").cast("double") /
            (col("n_fail_a") + col("n_fail_b") - col("n_both_fail"))
              .cast("double")))
  }

  /**
   * Markup-density audit: per document, the count of HTML-ish tags, the
   * characters spent inside them, the per-mille markup share, and a
   * keep verdict — the boilerplate-extraction health check of a web
   * corpus (text that is mostly tags survived extraction badly and
   * poisons token budgets). Tag chars are measured by the
   * length-difference trick (`len(text) − len(regexp_replace(text,
   * tag, ''))` — the q63 marker-count pattern), tag count by the
   * native `regexp_count`; both in the Java-regex∩RE2 subset.
   *
   * Spark shape: a pure narrow codegen'd projection — zero joins, zero
   * shuffles. The fixture corpus carries no markup, so the declared
   * query injects tags on a hash-sampled slice (q53 pattern) — the
   * non-trivial branch actually fires under the oracle.
   */
  def markupDensity(docs: DataFrame, maxPerMille: Int = 100,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val pat = "</?[a-z]+>"
    val t = col(textCol)
    docs.select(col(idCol),
        regexp_count(t, lit(pat)).cast("long").as("n_tags"),
        (length(t) - length(regexp_replace(t, pat, "")))
          .cast("long").as("markup_chars"),
        length(t).cast("long").as("n_chars"))
      .withColumn("markup_per_mille",
        when(col("n_chars") > 0,
          expr("(markup_chars * 1000) div n_chars")).otherwise(0L))
      .withColumn("keep", col("markup_per_mille") <= maxPerMille)
  }

  /**
   * Sentence-shape profile per language: documents split into
   * sentences on the literal ". " boundary, rolled up to (docs,
   * sentences, mean sentences/doc, mean tokens/sentence, longest
   * sentence in tokens) — the run-on/fragment shape signal a quality
   * gate reads next to [[quality]]'s flat token counts (a corpus of
   * 200-token "sentences" is extraction debris, not prose).
   *
   * Spark shape: one narrow sentence explode (row expansion, no
   * shuffle), one (group, doc) aggregation, one group aggregation —
   * no higher-order lambdas (ArrayTransform/ArrayAggregate are
   * CodegenFallback and would de-star the projection; the explode
   * keeps everything in whole-stage codegen). Counts are exact
   * integers; means are final single divisions.
   */
  def sentenceStats(docs: DataFrame, groupCol: String = "lang",
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val perSentence = docs
      .select(col(groupCol), col(idCol),
        explode(split(col(textCol), "\\. ")).as("__s"))
      .select(col(groupCol), col(idCol),
        size(split(col("__s"), " ")).cast("long").as("__stoks"))
    val perDoc = perSentence
      .groupBy(col(groupCol), col(idCol))
      .agg(count(lit(1)).as("__ns"), sum(col("__stoks")).as("__toks"),
        max(col("__stoks")).as("__maxs"))
    perDoc.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__ns")).as("n_sentences"),
        max(col("__maxs")).as("max_sentence_tokens"),
        (sum(col("__ns")).cast("double") / count(lit(1)).cast("double"))
          .as("mean_sentences_per_doc"),
        (sum(col("__toks")).cast("double") / sum(col("__ns")).cast("double"))
          .as("mean_tokens_per_sentence"))
  }

  def charClassProfile(docs: DataFrame, groupCol: String = "lang",
      textCol: String = "text"): DataFrame = {
    def cc(pat: String) =
      size(regexp_extract_all(col(textCol), lit(pat), lit(0))).cast("long")
    docs
      .select(col(groupCol),
        length(col(textCol)).cast("long").as("__n"),
        cc("[a-z]").as("__lo"), cc("[A-Z]").as("__up"),
        cc("[0-9]").as("__di"), cc(" ").as("__sp"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"), sum(col("__n")).as("n_chars"),
        sum(col("__lo")).as("n_lower"), sum(col("__up")).as("n_upper"),
        sum(col("__di")).as("n_digit"), sum(col("__sp")).as("n_space"))
      .select(col(groupCol), col("n_docs"), col("n_chars"), col("n_lower"),
        col("n_upper"), col("n_digit"), col("n_space"),
        (col("n_chars") - col("n_lower") - col("n_upper") - col("n_digit") -
          col("n_space")).as("n_other"),
        // guarded like tokenizerFertility: NULL (not IEEE inf/nan) when a
        // group holds only empty texts, in lockstep with the oracle's NULLIF
        when(col("n_chars") > 0, (col("n_lower") + col("n_upper"))
          .cast("double") / col("n_chars").cast("double"))
          .as("alpha_ratio"))
  }

  /**
   * Curriculum staging: per language, documents ordered easy→hard by a
   * difficulty proxy (BPE-ish token count — longer costs more context)
   * and assigned to `stages` equal bands — the curriculum-learning
   * schedule artifact ("train on stage 1 first"). The band is computed
   * from the rank directly (`1 + ((rn−1)·stages) div n`) rather than
   * `ntile`, so the split rule is explicit integer arithmetic both
   * engines replay identically (ntile's extra-row placement is
   * standard, but an explicit formula can't be mis-implemented).
   *
   * Spark shape: one shuffle on the group key, one window pass (rank +
   * group count over the same partitioning), a per-row integer stage
   * formula. Deterministic under the (difficulty, id) total order.
   */
  def curriculumStages(docs: DataFrame, stages: Int = 4,
      groupCol: String = "lang", idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(stages >= 1, s"stages=$stages must be >= 1")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("difficulty").asc, col(idCol).asc)
    docs
      .select(col(idCol), col(groupCol),
        bpeTokenCount(col(textCol)).cast("long").as("difficulty"))
      .withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__n",
        count(lit(1)).over(Window.partitionBy(col(groupCol))))
      .select(col(idCol), col(groupCol), col("difficulty"),
        (expr(s"((__rn - 1) * $stages) div __n") + 1L).as("stage"))
  }

  /**
   * Quality-gate drift report: the q63 rule battery evaluated on two
   * hash-split halves of the corpus ("old" = id-bucket ≥ `newPct`,
   * "new" = below), long-form per rule with both pass rates and the
   * delta — the monitoring artifact that tells you WHICH gate moved
   * when a crawl/source update shifts the corpus (a moved repetition
   * rate means template spam; a moved stopword rate means language mix).
   *
   * Spark shape: the battery is the shared per-row codegen'd projection;
   * ONE aggregation computes all 2×5 conditional counts with map-side
   * partials (the corpus never shuffles raw — the shuffle is one moment
   * row), then a `stack` explodes the 5-row report. Rates are exact
   * integer divisions; the delta is one IEEE subtraction — replayable.
   */
  def qualityDrift(docs: DataFrame, newPct: Int = 50,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val rules = Seq("ok_n_tokens", "ok_tok_len", "ok_repetition",
      "ok_stopwords", "ok_blacklist")
    val isNew = Sampling.bucket(col(idCol)) < newPct
    val qf = qualityFilter(docs.select(col(idCol), col(textCol)))
      .withColumn("__new", isNew)
    val aggs =
      rules.flatMap { r =>
        Seq(sum(when(!col("__new") && col(r), 1L).otherwise(0L)).as(s"__po_$r"),
          sum(when(col("__new") && col(r), 1L).otherwise(0L)).as(s"__pn_$r"))
      } ++ Seq(
        sum(when(!col("__new"), 1L).otherwise(0L)).as("__no"),
        sum(when(col("__new"), 1L).otherwise(0L)).as("__nn"))
    val onePass = qf.agg(aggs.head, aggs.tail: _*)
    val stackArgs = rules
      .map(r => s"'$r', __po_$r, __pn_$r").mkString(", ")
    onePass
      .selectExpr(
        s"stack(${rules.size}, $stackArgs) AS (rule, __po, __pn)",
        "__no", "__nn")
      .select(col("rule"),
        col("__no").as("n_old"), col("__nn").as("n_new"),
        (col("__po").cast("double") / col("__no").cast("double"))
          .as("pass_rate_old"),
        (col("__pn").cast("double") / col("__nn").cast("double"))
          .as("pass_rate_new"),
        ((col("__pn").cast("double") / col("__nn").cast("double")) -
          (col("__po").cast("double") / col("__no").cast("double")))
          .as("drift"))
  }

  /**
   * Per-document LM predictability under the corpus bigram model — the
   * integer-exact core of a CCNet-style perplexity filter: a bigram
   * position (ctx, nxt) is "predictable" when its pair count covers at
   * least 1/`branch` of its context's total mass (`pair_n · branch ≥
   * ctx_n`, an exact integer cross-multiply — no probabilities, no
   * logs, so both engines agree bit-for-bit where a float perplexity
   * would drift in the last ulp). A document whose positions are mostly
   * predictable reads like the corpus (boilerplate, templated text);
   * novel prose scores low — the same separation per-doc perplexity
   * gives, with a rate in [0,1] instead of an entropy.
   *
   * Spark shape: the per-position bigram table feeds ONE (ctx, nxt)
   * hash aggregation (map-side partials, vocab²-bounded output) whose
   * context totals come from one window over the vocab-bounded counts
   * (never the positions); positions then equi-join the LM on
   * (ctx, nxt) — the inverted-index pattern, a hot bigram costs its
   * occurrence count, never a cross product — and collapse back to one
   * row per doc in ONE final hash aggregation. Sub-2-token docs have no
   * bigram positions and drop out (the [[bigramNovelty]] contract).
   */
  def lmPredictability(docs: DataFrame, branch: Int = 8,
      threshold: Double = 0.5, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(branch >= 1, s"branch=$branch must be >= 1")
    val pos = bigramPairs(docs, idCol, textCol)
    val counts = pos.groupBy(col("ctx"), col("nxt"))
      .agg(count(lit(1)).as("pair_n"))
    val lm = counts.withColumn("ctx_n",
      sum(col("pair_n")).over(Window.partitionBy(col("ctx"))))
    val rate = col("n_predictable").cast("double") /
      col("n_bigrams").cast("double")
    pos.join(lm, Seq("ctx", "nxt"))
      .groupBy(col("id").as(idCol))
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(when(col("pair_n") * lit(branch.toLong) >= col("ctx_n"), 1L)
          .otherwise(0L)).as("n_predictable"))
      .select(col(idCol), col("n_bigrams"), col("n_predictable"),
        rate.as("predictable_rate"),
        (rate >= threshold).as("template_like"))
  }

  /**
   * Tokenizer fertility report per (group, source): how many BPE-ish
   * subword tokens the tokenizer spends per whitespace word
   * (`bpe_per_word` — the fertility number tokenizer papers quote) and
   * how many characters each subword token covers (`chars_per_bpe`) —
   * the per-language cost sheet that decides vocabulary allocation and
   * per-language token budgets (a language with fertility 3 pays 3× the
   * sequence length for the same text).
   *
   * Integer sums only (order-insensitive, exact), each ratio one final
   * double division of those sums — the [[stats]] determinism contract.
   * Spark shape: one hash aggregation with map-side partials; output
   * cardinality = the (group, source) space.
   */
  def tokenizerFertility(docs: DataFrame, groupCol: String = "lang",
      sourceCol: String = "source", textCol: String = "text"): DataFrame =
    docs
      .select(col(groupCol), col(sourceCol),
        length(col(textCol)).cast("long").as("__chars"),
        size(tokens(col(textCol))).cast("long").as("__words"),
        bpeTokenCount(col(textCol)).cast("long").as("__bpe"))
      .groupBy(col(groupCol), col(sourceCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__chars")).as("sum_chars"),
        sum(col("__words")).as("sum_words"),
        sum(col("__bpe")).as("sum_bpe"))
      .select(col(groupCol), col(sourceCol), col("n_docs"),
        col("sum_chars"), col("sum_words"), col("sum_bpe"),
        // guarded: a group of empty-text docs has sum_words = sum_bpe = 0,
        // where Spark's Divide yields NULL but DuckDB's double division
        // follows IEEE (inf/nan) — the explicit when() pins both engines
        // (oracle: NULLIF) to NULL on the degenerate group
        when(col("sum_words") > 0, col("sum_bpe").cast("double") /
          col("sum_words").cast("double")).as("bpe_per_word"),
        when(col("sum_bpe") > 0, col("sum_chars").cast("double") /
          col("sum_bpe").cast("double")).as("chars_per_bpe"))

  /**
   * T5-style span-corruption plan: for each document, a deterministic
   * list of token spans to mask — `floor(n·maskPct/100) / spanLen` spans
   * of `spanLen` tokens, each span's start drawn by the shared Knuth-mix
   * hash of (doc id, span index) over the valid start range. The PLAN is
   * the data-engineering artifact (the trainer applies it at batch
   * time); emitting it as rows makes the masking reproducible,
   * auditable, and joinable against the doc table — the properties a
   * `rand()`-at-training-time mask can't offer. Spans may overlap
   * (standard for hash-drawn spans; the trainer's mask is a union).
   *
   * Spark shape: a pure narrow projection + explode — zero shuffle,
   * zero joins, whole-stage codegen; the hash arithmetic pre-reduces
   * ids mod 2³¹ (the [[Sampling.bucket]] overflow contract) so the
   * Knuth product never exceeds 2⁶³ in any engine. Docs shorter than
   * one span, or whose budget rounds to zero spans, drop out.
   */
  def spanCorruptionPlan(docs: DataFrame, spanLen: Int = 3,
      maskPct: Int = 15, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(spanLen >= 1, s"spanLen=$spanLen must be >= 1")
    require(maskPct >= 1 && maskPct <= 100, s"maskPct=$maskPct out of range")
    // Exact long floor-division (Column `/` is double division): subtract
    // the remainder first so the double quotient is exactly divisible.
    def idiv(a: Column, b: Long): Column =
      ((a - pmod(a, lit(b))) / lit(b.toDouble)).cast("long")
    val n = size(tokens(col(textCol))).cast("long")
    val nSpans = idiv(idiv(n * lit(maskPct.toLong), 100L), spanLen.toLong)
    val base = graft.SparkUtil.ensureParallelism(docs)
      .select(col(idCol), n.as("n_tokens"), nSpans.as("__k"))
      .filter(col("n_tokens") >= spanLen && col("__k") >= 1)
    val seed = pmod(
      pmod(col(idCol).cast("long"), lit(Sampling.IdFold)) * 31L +
        col("span_idx"), lit(Sampling.IdFold))
    base
      .select(col(idCol), col("n_tokens"),
        explode(sequence(lit(0L), col("__k") - 1L)).as("span_idx"))
      .select(col(idCol), col("span_idx"),
        (pmod(mix32(seed), col("n_tokens") - spanLen + 1L) + 1L)
          .as("span_start"),
        lit(spanLen.toLong).as("span_len"), col("n_tokens"))
  }

  /**
   * INTEGER-EXACT BM25 term scores per (document, query term) — the
   * shared core of [[bm25TopK]] (retrieval) and [[bm25Decontaminate]]
   * (eval-query leakage flagging). BM25 as usually written mixes
   * `ln((N-df+0.5)/(df+0.5))` idf into a float sum whose libm `ln`
   * is NOT bit-identical across engines; this repo's rank invariant
   * (no float enters a rank — the q68 principle) demands an exact
   * formulation, so:
   *
   *   - idf is the FLOOR-LOG2 of the Robertson odds ratio, computed
   *     exactly in integers: with num = 2(N−df)+1 and den = 2df+1,
   *     `L = len(bin(num)) − len(bin(den))` and
   *     `idf = L − [den·2^L > num]` — no rounding anywhere. Terms with
   *     num ≤ den (df ≥ N/2: in more than half the corpus) carry
   *     negative information and are DROPPED, the classic stop-term
   *     cut. A coarser idf than ln (unit steps), but exact, monotone
   *     in df, and engine-portable.
   *   - the tf saturation `tf·(k1+1) / (tf + k1(1−b+b·dl/avgdl))` at
   *     the standard k1=1.2, b=0.75 multiplies through by 10T (T =
   *     total corpus tokens, so avgdl = T/N never materializes as a
   *     float): `tfn_micro = (22·T·tf·10⁶) div (10·T·tf + 3·T +
   *     9·dl·N)` — exact integer division.
   *   - a term's score is `idf · tfn_micro`; a document's score is
   *     the integer sum over its surviving query terms.
   *
   * Overflow posture — STRUCTURAL (the q124/q216 pattern): the
   * numerator `22·T·tf·10⁶` leaves int64 once T·tf ≥ ~4·10¹¹, so an
   * EAGER pre-pass (one narrow codegen'd scan at DataFrame
   * construction time — count, token total, max doc length; max dl
   * bounds max tf) proves via [[bm25LongSafe]] whether every
   * saturation numerator and denominator fits int64. When it does
   * (any realistic single-shard corpus), the arithmetic runs in
   * codegen'd longs; when it doesn't, the same expressions run over
   * decimal(38,0) and cast the exact quotient back to long — both
   * paths produce identical integers (parity-pinned in
   * TextAnalysisSpec), so ranks and the oracle never change.
   *
   * Spark shape: tokens explode → narrow IN-list filter down to query
   * terms only (the corpus never aggregates un-queried tokens) → ONE
   * (doc, term) tf agg; df and the corpus totals are BOUNDED tables
   * (≤ |Q| rows and 1 row) broadcast back — the per-doc fold is the
   * only real shuffle.
   */
  private def bm25TermScores(docs: DataFrame, queryTerms: Seq[String],
      idCol: String, textCol: String): DataFrame = {
    val g = docs.agg(count(lit(1)).as("__n"),
      sum(size(split(col(textCol), " ")).cast("long")).as("__t"),
      max(size(split(col(textCol), " ")).cast("long")).as("__maxdl"))
      .head()
    val longSafe = g.isNullAt(1) ||
      bm25LongSafe(g.getLong(1), g.getLong(2))
    bm25TermScoresWith(docs, queryTerms, idCol, textCol, wide = !longSafe)
  }

  /** The int64-safety predicate behind [[bm25TermScores]]'s guard:
    * with `maxDl ≥ max tf`, `22·T·maxDl·10⁶ < 2⁶²` bounds every
    * saturation numerator (and a fortiori the denominator
    * `10·T·tf + 3·T + 9·dl·N`) away from long overflow, with one
    * spare bit for the double-precision comparison itself. */
  private[graft] def bm25LongSafe(totalTokens: Long, maxDl: Long): Boolean =
    22.0e6 * totalTokens.toDouble * maxDl.toDouble < math.pow(2.0, 62)

  /** The scoring pipeline behind [[bm25TermScores]], parameterized on
    * the saturation arithmetic width so the spec can pin long/decimal
    * parity. `wide=false` is the codegen'd long fast path;
    * `wide=true` widens the saturation quotient to decimal(38,0) and
    * casts the (exact, ≤ 2.2·10⁶) result back to long. */
  private[graft] def bm25TermScoresWith(docs: DataFrame,
      queryTerms: Seq[String], idCol: String, textCol: String,
      wide: Boolean): DataFrame = {
    require(queryTerms.nonEmpty && queryTerms.distinct == queryTerms,
      "queryTerms must be non-empty and distinct")
    val toks = split(col(textCol), " ")
    val totals = docs.agg(count(lit(1)).as("__N"),
      sum(size(toks).cast("long")).as("__T"))
    val tf = docs
      .select(col(idCol).as("__id"), size(toks).as("__dl"),
        explode(toks).as("__term"))
      .filter(col("__term").isInCollection(queryTerms))
      .groupBy(col("__id"), col("__dl"), col("__term"))
      .agg(count(lit(1)).as("__tf"))
    val dfTbl = tf.groupBy(col("__term")).agg(count(lit(1)).as("__df"))
    tf.join(broadcast(dfTbl), "__term")
      .crossJoin(broadcast(totals))
      .withColumn("__num", lit(2L) * (col("__N") - col("__df")) + lit(1L))
      .withColumn("__den", lit(2L) * col("__df") + lit(1L))
      .filter(col("__num") > col("__den")) // drop df >= N/2 stop terms
      .withColumn("__L",
        (length(bin(col("__num"))) - length(bin(col("__den")))).cast("int"))
      .withColumn("__idf",
        when(expr("shiftleft(__den, __L)") <= col("__num"), col("__L"))
          .otherwise(col("__L") - 1).cast("long"))
      .withColumn("__tfn",
        if (!wide) expr(
          "(22 * __T * __tf * 1000000) div " +
            "(10 * __T * __tf + 3 * __T + 9 * __dl * __N)")
        else expr(
          "cast((22 * cast(__T as decimal(38,0)) * __tf * 1000000) div " +
            "(10 * cast(__T as decimal(38,0)) * __tf + 3 * __T + " +
            "9 * cast(__dl as decimal(38,0)) * __N) as bigint)"))
  }

  /**
   * BM25 top-k retrieval over the corpus for a literal query term set
   * — the targeted-retrieval face of curation ("which training docs
   * answer this eval query"), and the IR classic the keyword/cosine
   * operators (q68, q17) bracket from either side. Integer-exact
   * scoring per [[bm25TermScores]]; rank key is (score desc, id asc),
   * so the top-k SET is total-order deterministic and SQL-replayable.
   *
   * Spark shape: the bounded per-doc fold then a global top-k via
   * orderBy+limit — `TakeOrderedAndProject`, never a full sort.
   */
  def bm25TopK(docs: DataFrame, queryTerms: Seq[String], k: Int = 20,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    bm25TermScores(docs, queryTerms, idCol, textCol)
      .groupBy(col("__id").as(idCol))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("__idf") * col("__tfn")).as("score_micro"))
      .orderBy(col("score_micro").desc, col(idCol).asc)
      .limit(k)

  /**
   * BM25 retrieval-based decontamination: every document MATCHING any
   * discriminative eval-query term, with its exact BM25 score and the
   * `contaminated` verdict at `minScoreMicro` — the ranked-retrieval
   * member of the decontamination family (exact q33, fuzzy-shingle
   * q39, Bloom-shipped q44): n-gram overlap catches verbatim leaks,
   * BM25 catches topically-reworded ones a reviewer should eyeball.
   * Output is bounded by the matching subset, never the corpus;
   * non-matching docs are trivially clean and emit no row.
   */
  def bm25Decontaminate(docs: DataFrame, queryTerms: Seq[String],
      minScoreMicro: Long, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    bm25TermScores(docs, queryTerms, idCol, textCol)
      .groupBy(col("__id").as(idCol))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("__idf") * col("__tfn")).as("score_micro"))
      .withColumn("contaminated", col("score_micro") >= minScoreMicro)

  /**
   * BATCH BM25: top-k retrieval for a whole TABLE of queries in ONE
   * corpus pass — the shape eval-suite decontamination actually runs
   * at 100 TB (thousands of benchmark queries against the corpus;
   * per-query passes would rescan the corpus per query). Scoring is
   * [[bm25TermScores]]'s exact integer chain; term statistics (tf, df,
   * idf) are computed ONCE per distinct term across all queries, then
   * fanned out to queries by a broadcast membership join (fan-out
   * bounded by queries-per-term, never the corpus).
   *
   * `queries`: (queryIdCol, termCol) rows — one row per query term.
   * Null terms/query ids are dropped (a null term matches nothing by
   * IN-list semantics anyway; dropping keeps the collected driver-side
   * term list — a bounded artifact, ≤ distinct query vocabulary —
   * total-order sortable). Output: per (query, doc) the exact score
   * with rank ≤ k; per-query top-k via WindowGroupLimit (map-side
   * partial top-k, plan-pinned in PlanContractSpec), never a global
   * sort. Queries none of whose terms survive the stop-term cut emit
   * no rows.
   */
  def bm25TopKBatch(docs: DataFrame, queries: DataFrame, k: Int = 20,
      idCol: String = "doc_id", textCol: String = "text",
      queryIdCol: String = "query_id", termCol: String = "term"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = queries.select(col(queryIdCol), col(termCol))
      .filter(col(queryIdCol).isNotNull && col(termCol).isNotNull)
      .distinct()
    val termList = terms.select(col(termCol)).distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    require(termList.nonEmpty,
      "queries must contain at least one non-null (query_id, term) row")
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("score_micro").desc, col(idCol).asc)
    bm25TermScores(docs, termList, idCol, textCol)
      .join(broadcast(terms), col("__term") === col(termCol))
      .groupBy(col(queryIdCol), col("__id").as(idCol))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("__idf") * col("__tfn")).as("score_micro"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
