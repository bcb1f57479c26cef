package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Tests for the r6 curation operators: per-domain caps, preference-pair
 * mining over near-dup clusters, LM predictability, tokenizer fertility,
 * and span-corruption planning. Hand fixtures with independently
 * computable expectations; fixture-scale checks ride the oracle gate.
 */
class CurationOpsSpec extends SparkSpec {

  import spark.implicits._

  test("capPerGroup keeps exactly the best-n per group with (score desc, id asc) ties") {
    val df = Seq(
      (1L, "a", 10L), (2L, "a", 30L), (3L, "a", 30L), (4L, "a", 5L),
      (5L, "b", 7L)
    ).toDF("doc_id", "source", "score")
    val out = Sampling.capPerGroup(df, n = 2, groupCol = "source",
      scoreCol = "score").orderBy("source", "rank")
      .select("doc_id", "source", "rank")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    // group a: score 30 ties between ids 2 and 3 → id asc wins; id 1 (10) cut
    assert(out.toSeq == Seq((2L, "a", 1), (3L, "a", 2), (5L, "b", 1)))
  }

  test("preferencePairs: best/worst per component, equal-score clusters and singletons drop") {
    val vertices = Seq(1L, 2L, 3L, 10L, 11L, 20L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val scores = Seq( // component 1: {1,2,3}; component 10: {10,11} equal
      (1L, 50L), (2L, 90L), (3L, 20L), (10L, 30L), (11L, 30L), (20L, 99L)
    ).toDF("doc_id", "score")
    val out = Dedup.preferencePairs(vertices, pairs, scores)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // only component 1 survives: chosen=2 (90), rejected=3 (20), gap=70;
    // {10,11} has no gap; 20 is a singleton
    assert(out.toSeq == Seq((1L, 2L, 3L, 90L, 20L, 70L)))
  }

  test("preferencePairs ties break deterministically by id asc on both ends") {
    val vertices = Seq(1L, 2L, 3L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    // two tied maxima (ids 2,3) and two tied minima below them? No —
    // chosen ties at 9 (ids 2,3) → id 2; rejected unique min 1L (score 1)
    val scores = Seq((1L, 1L), (2L, 9L), (3L, 9L)).toDF("doc_id", "score")
    val out = Dedup.preferencePairs(vertices, pairs, scores)
      .select("chosen_id", "rejected_id").as[(Long, Long)].collect()
    assert(out.toSeq == Seq((2L, 1L)))
  }

  test("lmPredictability: hand-computed corpus counts") {
    // corpus bigrams: (a b) ×3 from docs 1,2,3; (a c) ×1 from doc 4.
    // ctx a total = 4. branch=2: "a b" predictable (3*2 >= 4),
    // "a c" not (1*2 < 4). doc 5 has one token → drops out.
    val docs = Seq(
      (1L, "a b"), (2L, "a b"), (3L, "a b"), (4L, "a c"), (5L, "x")
    ).toDF("doc_id", "text")
    val out = LmFixture.run(docs, branch = 2)
    assert(out == Map(
      1L -> (1L, 1L, 1.0), 2L -> (1L, 1L, 1.0), 3L -> (1L, 1L, 1.0),
      4L -> (1L, 0L, 0.0)))
  }

  test("tokenizerFertility: exact integer sums and ratios") {
    val docs = Seq(
      (1L, "en", "web", "ab cd"),  // chars 5, words 2, bpe 2
      (2L, "en", "web", "a1!"),    // chars 3, words 1, bpe 3 (a|1|!)
      (3L, "de", "web", "xy")      // chars 2, words 1, bpe 1
    ).toDF("doc_id", "lang", "source", "text")
    val out = TextAnalysis.tokenizerFertility(docs)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))).toSet
    assert(out == Set(
      ("en", "web", 2L, 8L, 3L, 5L, 5.0 / 3.0),
      ("de", "web", 1L, 2L, 1L, 1L, 1.0)))
  }

  test("spanCorruptionPlan: budget arithmetic, start bounds, determinism, short docs drop") {
    val text40 = (1 to 40).map(i => s"t$i").mkString(" ") // 40 tokens
    val docs = Seq((7L, text40), (8L, "a b")).toDF("doc_id", "text")
    val out = TextAnalysis.spanCorruptionPlan(docs, spanLen = 3, maskPct = 15)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4)))
    // doc 8: 2 tokens < spanLen → dropped. doc 7: budget = 40*15/100 = 6,
    // spans = 6/3 = 2 → span_idx 0,1
    assert(rows.map(_._1).toSet == Set(7L))
    assert(rows.map(_._2).sorted.toSeq == Seq(0L, 1L))
    rows.foreach { case (_, _, start, len, n) =>
      assert(len == 3L && n == 40L && start >= 1L && start <= n - 3 + 1)
    }
    // rerun-stable (pure hash, no rand)
    val again = TextAnalysis.spanCorruptionPlan(docs, spanLen = 3, maskPct = 15)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(t => (t._1, t._2, t._3)).sorted.toSeq == again.sorted.toSeq)
  }
  test("timeSplitAudit: side counts and the straddle flag") {
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-10 00:00:00"), 100L),
      (2L, java.sql.Timestamp.valueOf("2024-01-25 00:00:00"), 100L),
      (3L, java.sql.Timestamp.valueOf("2024-01-05 00:00:00"), 200L),
      (4L, java.sql.Timestamp.valueOf("2024-01-28 00:00:00"), 300L)
    ).toDF("event_id", "ts", "user_id")
    val out = EventAnalytics.timeSplitAudit(ev, cutoff = "2024-01-22 00:00:00")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out == Map(
      100L -> ((1L, 1L, true)),   // straddles
      200L -> ((1L, 0L, false)),  // train only
      300L -> ((0L, 1L, false)))) // eval only
  }

  test("datasetCard: dup counts, distinct sources, shares") {
    val docs = Seq(
      (1L, "en", "web", "same text here"),
      (2L, "en", "web", "same text here"),   // exact dup of 1
      (3L, "en", "book", "unique text one"),
      (4L, "de", "web", "anders text")
    ).toDF("doc_id", "lang", "source", "text")
    val out = Profiler.datasetCard(docs)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(out == Map(
      "en" -> ((3L, 2L, 9L, 2L, 0.75)), // 3 docs, 2 sources, 9 words, 2 dup docs
      "de" -> ((1L, 1L, 2L, 0L, 0.25))))
  }

  test("qualityDrift: half sizes partition the corpus and rates stay in [0,1]") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val out = TextAnalysis.qualityDrift(docs).collect()
    assert(out.length == 5)
    val total = docs.count()
    out.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) == total) // n_old + n_new
      val (po, pn) = (r.getDouble(3), r.getDouble(4))
      assert(po >= 0.0 && po <= 1.0 && pn >= 0.0 && pn <= 1.0)
      assert(math.abs(r.getDouble(5) - (pn - po)) == 0.0) // drift exact
    }
  }

  test("splitContamination: canonical matrix with shares over a hand graph") {
    val pairs = Seq((1L, 2L), (3L, 4L), (5L, 6L), (7L, 8L)).toDF("id_a", "id_b")
    val splits = Seq(
      1L -> "train", 2L -> "train", 3L -> "test", 4L -> "test",
      5L -> "train", 6L -> "test", 7L -> "test", 8L -> "train"
    ).toDF("doc_id", "split")
    val out = Dedup.splitContamination(pairs, splits)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getBoolean(3), r.getDouble(4))).toSet
    assert(out == Set(
      ("train", "train", 1L, false, 0.25),
      ("test", "test", 1L, false, 0.25),
      ("test", "train", 2L, true, 0.5))) // canonicalized order, 2 leaks
  }

  test("sourceMinhashOverlap: identical sources agree on every position; signature merges") {
    val docs = Seq(
      (1L, "alpha", "one two three four five six"),
      (2L, "beta", "one two three four five six"),  // same content → J = 1
      (3L, "gamma", "totally different words entirely here now")
    ).toDF("doc_id", "source", "text")
    val out = Dedup.sourceMinhashOverlap(docs)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out(("alpha", "beta")) == ((128L, 1.0)))
    assert(out(("alpha", "gamma"))._1 < 128L)
    // union-merge property: a source of BOTH texts has the elementwise
    // min of the two single-text signatures — agreement with "alpha"
    // equals the positions where alpha's perm wins or ties gamma's
    val merged = Seq((4L, "m", "one two three four five six"),
      (5L, "m", "totally different words entirely here now"),
      (6L, "alpha", "one two three four five six"))
      .toDF("doc_id", "source", "text")
    val m = Dedup.sourceMinhashOverlap(merged).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m(("alpha", "m")) >= 1L) // alpha's mins survive in the union often
  }

  test("eventDedupWindow collapses same-window duplicates to the earliest event") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (10L, ts("2024-01-01 00:01:00"), 1L, "click", 5.0),
      (11L, ts("2024-01-01 00:02:00"), 1L, "click", 5.0), // dup, same 5-min window
      (12L, ts("2024-01-01 00:07:00"), 1L, "click", 5.0), // next window — kept
      (13L, ts("2024-01-01 00:01:30"), 1L, "click", 6.0)  // different value — kept
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventAnalytics.eventDedupWindow(ev)
      .select("kept_event_id", "n_events")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(10L -> 2L, 12L -> 1L, 13L -> 1L))
  }

  test("curriculumStages: explicit band formula over a hand group") {
    // difficulties 1..8 in one lang, 4 stages → 2 docs per stage
    val docs = (1 to 8).map(i => (i.toLong, "en", ("x " * i).trim))
      .toDF("doc_id", "lang", "text")
    val out = TextAnalysis.curriculumStages(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L,
      5L -> 3L, 6L -> 3L, 7L -> 4L, 8L -> 4L))
  }

  test("winsorizeReport: pinned-rank bounds and value-exact clamp counts") {
    // key k: values 1..20 → n=20, lo_rank = ceil(1.0)=1 → lo=1,
    // hi_rank = 20+1-1 = 20 → hi=20 → nothing clamps at 5/95 on n=20
    val ev = (1 to 20).map(i => (i.toLong, "k", i.toDouble))
      .toDF("event_id", "event_type", "value")
    val r = Profiler.winsorizeReport(ev, "event_type", "value", "event_id")
      .collect().head
    assert(r.getLong(1) == 20L && r.getDouble(2) == 1.0 && r.getDouble(3) == 20.0)
    assert(r.getLong(4) == 0L && r.getLong(5) == 0L)
    // n=100 → lo_rank=5, hi_rank=96: 4 clamp below, 4 above
    val ev2 = (1 to 100).map(i => (i.toLong, "k", i.toDouble))
      .toDF("event_id", "event_type", "value")
    val r2 = Profiler.winsorizeReport(ev2, "event_type", "value", "event_id")
      .collect().head
    assert(r2.getDouble(2) == 5.0 && r2.getDouble(3) == 96.0)
    assert(r2.getLong(4) == 4L && r2.getLong(5) == 4L)
  }

  test("lengthBandPairs equals the naive all-pairs filter (lossless banding)") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val banded = Dedup.lengthBandPairs(docs, d = 2)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val l = docs.select(col("doc_id"), col("lang"),
      size(split(col("text"), " ")).cast("long").as("len"))
    val naive = l.as("a").join(l.as("b"),
        col("a.lang") === col("b.lang") && col("a.doc_id") < col("b.doc_id") &&
          abs(col("a.len") - col("b.len")) <= 2)
      .select(col("a.doc_id"), col("b.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == naive && banded.nonEmpty)
  }

  test("lengthBandPairs at-scale guard: refuses past the output budget, " +
      "opt-in and a passing budget construct") {
    val spark0 = spark
    import spark0.implicits._
    // 40 same-lang same-length docs -> 40*39 = 1560 same-band ordered pairs
    val dense = (1L to 40L).map(i => (i, "en", "a b c")).toDF(
      "doc_id", "lang", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.lengthBandPairs(dense, d = 2, outputBudget = 1000L)
    }
    assert(e.getMessage.contains("allowLargeOutput"))
    // opt-in emits the full (legitimate) pair set; passing budget is silent
    assert(Dedup.lengthBandPairs(dense, d = 2, outputBudget = 1000L,
      allowLargeOutput = true).count() == 40L * 39 / 2)
    assert(Dedup.lengthBandPairs(dense, d = 2, outputBudget = 2000L)
      .count() == 40L * 39 / 2)
  }

  test("lengthBandPairs guard counts ADJACENT-band pairs: mass straddling " +
      "a band boundary refuses even when each band alone fits") {
    val spark0 = spark
    import spark0.implicits._
    // d=2 -> band width 3: len 2 lands in band 0, len 3 in band 1, and
    // |2-3| <= d means every cross-band pair IS emitted. Same-band
    // ordered estimate alone: 2*20*19 = 760 (would pass 1000); with the
    // cross term 2*c0*c1 = 800 the estimate is 1560 -> must refuse.
    val straddle = ((1L to 20L).map(i => (i, "en", "a b")) ++
      (21L to 40L).map(i => (i, "en", "a b c"))).toDF("doc_id", "lang", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.lengthBandPairs(straddle, d = 2, outputBudget = 1000L)
    }
    assert(e.getMessage.contains("allowLargeOutput"))
    // ...and the output it was protecting against really is the full
    // cross product (every pair within d): 40*39/2
    assert(Dedup.lengthBandPairs(straddle, d = 2, outputBudget = 1000L,
      allowLargeOutput = true).count() == 40L * 39 / 2)
    // n(n-1) <= budget short-circuits without any aggregation (sound:
    // total distinct output can never exceed n(n-1)/2)
    assert(Dedup.lengthBandPairs(straddle, d = 2, outputBudget = 1600L)
      .count() == 40L * 39 / 2)
  }

  test("duplicateNgramCoverage: exact multiset accounting on a hand corpus") {
    val docs = Seq(
      (1L, "en", "a b c d"),   // shingles: abc, bcd
      (2L, "en", "a b c e"),   // shingles: abc, bce → abc df=2
      (3L, "de", "x y z")      // shingle: xyz, df=1
    ).toDF("doc_id", "lang", "text")
    val out = Dedup.duplicateNgramCoverage(docs)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map("en" -> ((4L, 2L)), "de" -> ((1L, 0L))))
  }

  test("transitivityAudit finds exactly the open wedges of a hand graph") {
    // path 1-2-3 (open), triangle 4-5-6 (closed), star 7-{8,9} (open)
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L), (5L, 6L), (4L, 6L),
      (7L, 8L), (7L, 9L)).toDF("id_a", "id_b")
    val out = Dedup.transitivityAudit(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((2L, 1L, 3L), (7L, 8L, 9L)))
  }

  test("lifecycleStages: three-way verdicts on a hand stream") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, ts("2024-01-26 00:00:00"), 1L),  // first within 7d of ref → new
      (2L, ts("2024-01-02 00:00:00"), 2L),  // last long before → churned
      (3L, ts("2024-01-05 00:00:00"), 3L),  // old first, recent last → active
      (4L, ts("2024-01-24 00:00:00"), 3L)
    ).toDF("event_id", "ts", "user_id")
    val out = EventAnalytics.lifecycleStages(ev, reference = "2024-01-28 00:00:00")
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(out == Map(1L -> "new", 2L -> "churned", 3L -> "active"))
  }

  test("distinctiveVocab surfaces a source-exclusive token at rank 1") {
    val docs = (1 to 20).map(i => (i.toLong, "web",
        "common words here " + (if (i <= 10) "zebra" else "other"))) ++
      (21 to 40).map(i => (i.toLong, "book", "common words here filler"))
    val df = docs.toDF("doc_id", "source", "text")
    val out = TextAnalysis.distinctiveVocab(df, k = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(5)))
    // the two web-exclusive tokens (10× each) take both top slots, tie
    // broken by token asc ("other" < "zebra")
    assert(out.contains(("web", "other", 1)) && out.contains(("web", "zebra", 2)))
  }

  test("quantizationErrorReport: zero error for exactly-representable vectors") {
    val exact = Array.fill(64)(0f); exact(0) = 127f; exact(1) = -127f
    val off = Array.fill(64)(0f); off(0) = 127f; off(1) = 0.4f
    val df = Seq((1L, exact.toSeq), (2L, off.toSeq)).toDF("vec_id", "embedding")
    val out = SimilaritySearch.quantizationErrorReport(df)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((0.0, 0.0))) // codes ±127 at scale 1 — exact
    val (mx, mean) = out(2L)
    assert(mx > 0.0 && mean > 0.0 && mx <= 0.5 && mean <= mx)
  }

  test("mixtureSchedule: every prefix tracks the weight mix; zero-weight strata drop") {
    // supply matches the weights (75 en / 25 de): the prefix property
    // only holds while every stratum still has documents to schedule
    val docs = (1 to 100).map(i =>
      (i.toLong, if (i % 4 != 0) "en" else "de", "x")).toDF("doc_id", "lang", "text")
    val out = Sampling.mixtureSchedule(docs,
      weights = Map("en" -> 75, "de" -> 25, "zz" -> 0), nBuckets = 1)
      .orderBy("schedule_pos").collect()
      .map(r => (r.getString(1), r.getLong(3)))
    assert(out.length == 100)
    // proportionality at every prefix: en count within 2 of 75% of k
    (10 to 100 by 10).foreach { k =>
      val en = out.take(k).count(_._1 == "en")
      assert(math.abs(en - 0.75 * k) <= 2.0, s"k=$k en=$en")
    }
  }

  test("interEventGaps: exact gaps on a hand stream; singletons drop") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L), (2L, ts("2024-01-01 00:00:10"), 1L),
      (3L, ts("2024-01-01 00:01:10"), 1L), (4L, ts("2024-01-01 05:00:00"), 2L)
    ).toDF("event_id", "ts", "user_id")
    val out = EventAnalytics.interEventGaps(ev)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    // user 1 gaps: 10s, 60s → median (lower) 10, max 60; user 2 drops
    assert(out == Map(1L -> ((2L, 10L, 60L))))
  }

  test("sourceRankStability: identical halves give zero shifts") {
    // duplicate every doc id into both halves via bucket-symmetric ids?
    // simplest strong property on the fixture: d2 >= 0 and each half's
    // ranks are a permutation of 1..|sources|
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val out = TextAnalysis.sourceRankStability(docs).collect()
    val n = out.length
    assert(out.map(_.getLong(1)).sorted.toSeq == (1L to n).toSeq)
    assert(out.map(_.getLong(2)).sorted.toSeq == (1L to n).toSeq)
    out.foreach { r =>
      assert(r.getLong(4) == r.getLong(3) * r.getLong(3)) // d2 == shift²
    }
  }

  test("dedupSavingsBySource: exact byte accounting on a hand corpus") {
    val docs = Seq(
      (1L, "web", "aaaa"), (2L, "web", "aaaa"), (3L, "web", "aaaa"), // 3× 4B
      (4L, "web", "bb"), (5L, "book", "cc")
    ).toDF("doc_id", "source", "text")
    val out = Dedup.dedupSavingsBySource(docs)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(out("web") == ((4L, 14L, 2L, 8L, 8.0 / 14.0)))
    assert(out("book") == ((1L, 2L, 0L, 0L, 0.0)))
  }

  test("langConfusionMatrix: row shares sum to one per declared label") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val out = TextAnalysis.langConfusionMatrix(docs).collect()
    assert(out.map(_.getLong(2)).sum == docs.count())
    out.groupBy(_.getString(0)).foreach { case (_, rows) =>
      assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-9)
    }
  }

  test("consistentTopKSample: exact k, rerun-stable, nested in k") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select("doc_id", "lang", "source")
    val s50 = Sampling.consistentTopKSample(docs, k = 50)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s80 = Sampling.consistentTopKSample(docs, k = 80)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s50.size == 50 && s80.size == 80)
    assert(s50.subsetOf(s80)) // nested: k-sample is a prefix
    val again = Sampling.consistentTopKSample(docs.repartition(7), k = 50)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == s50) // layout-independent
  }

  test("joinFanoutHistogram: bands partition the key space on a hand multiset") {
    val df = (Seq.fill(1)(1L) ++ Seq.fill(3)(2L) ++ Seq.fill(8)(3L)).toDF("k")
    val out = Profiler.joinFanoutHistogram(df, "k")
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // mult 1 → bin '1' (len 1); mult 3 → '11' (2); mult 8 → '1000' (4)
    assert(out == Map(1 -> ((1L, 1L)), 2 -> ((1L, 3L)), 4 -> ((1L, 8L))))
  }

  test("weeklyTrend: week alignment and deltas on a hand stream") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, ts("2024-01-02 10:00:00")), (2L, ts("2024-01-03 10:00:00")),
      (3L, ts("2024-01-10 10:00:00"))
    ).toDF("event_id", "ts")
    val out = EventAnalytics.weeklyTrend(ev)
      .orderBy("week_start").collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      ("2024-01-01 00:00:00.0", 2L, 2L),  // Monday-aligned, first delta vs 0
      ("2024-01-08 00:00:00.0", 1L, -1L)))
  }

  test("activityHeatmap shares sum to one and cells partition the stream") {
    val events = graft.Tables.loadEvents(spark, sf())
    val out = EventAnalytics.activityHeatmap(events).collect()
    assert(out.map(_.getLong(2)).sum == events.count())
    assert(math.abs(out.map(_.getDouble(3)).sum - 1.0) < 1e-9)
    out.foreach { r =>
      assert(r.getLong(0) >= 1 && r.getLong(0) <= 7)
      assert(r.getLong(1) >= 0 && r.getLong(1) <= 23)
    }
  }

  test("estimatorCalibration: duplicate-heavy corpus puts its mass in the top bin") {
    val docs = Seq(
      (1L, "one two three four five six seven eight"),
      (2L, "one two three four five six seven eight"),
      (3L, "one two three four five six seven eight")
    ).toDF("doc_id", "text")
    val out = Dedup.estimatorCalibration(docs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out == Map(9L -> ((3L, 0.0)))) // all pairs exact J=1 → bin 9, err 0
  }

  test("burstCeiling: banded self-join equals the naive sliding-window max") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    // user 1: 3 events in 40s straddling a minute boundary (aligned
    // windows would see 2+1); user 2: isolated events
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:40"), 1L), (2L, ts("2024-01-01 00:00:55"), 1L),
      (3L, ts("2024-01-01 00:01:10"), 1L), (4L, ts("2024-01-01 02:00:00"), 1L),
      (5L, ts("2024-01-01 00:00:00"), 2L), (6L, ts("2024-01-01 03:00:00"), 2L)
    ).toDF("event_id", "ts", "user_id")
    val out = EventAnalytics.burstCeiling(ev)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 3L, 2L -> 1L)) // straddling burst seen whole
  }

  test("giniConcentration: exact values on hand distributions") {
    // perfectly equal counts → gini 0
    val eq = Seq(1L, 1L, 2L, 2L, 3L, 3L).toDF("user_id")
    val g0 = Profiler.giniConcentration(eq, "user_id").collect().head
    assert(g0.getLong(0) == 3L && g0.getLong(1) == 6L && g0.getDouble(2) == 0.0)
    // counts (1, 3): G = (2*(1*1 + 2*3) - 3*4) / (2*4) = 2/8 = 0.25
    val sk = (Seq.fill(1)(10L) ++ Seq.fill(3)(20L)).toDF("user_id")
    assert(Profiler.giniConcentration(sk, "user_id").collect().head
      .getDouble(2) == 0.25)
  }

  test("vocabGrowthCurve: first-occurrence counting on a hand corpus") {
    // sparse ids used deliberately as raw id thresholds -> strict off
    val docs = Seq(
      (0L, "a b"), (1L, "a c"), (5L, "d"), (9L, "a d e")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.vocabGrowthCurve(docs,
        checkpoints = Seq(1L, 6L, 10L), strict = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // first docs: a→0, b→0, c→1, d→5, e→9
    assert(out.toSeq == Seq((1L, 2L, 2L), (6L, 4L, 2L), (10L, 5L, 1L)))
  }

  test("vocabGrowthCurve: sparse/offset ids fail loudly unless strict is disabled") {
    // With offset ids, "id < c" is NOT "first c documents" — the default
    // must refuse rather than silently measure id space.
    val offset = Seq((100L, "a b"), (101L, "a c"), (102L, "d"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.vocabGrowthCurve(offset, checkpoints = Seq(2L))
    }
    assert(e.getMessage.contains("dense 0-based"))
    // dense 0-based ids pass the assert and count documents
    val dense = Seq((0L, "a b"), (1L, "a c"), (2L, "d")).toDF("doc_id", "text")
    val out = TextAnalysis.vocabGrowthCurve(dense, checkpoints = Seq(2L))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((2L, 3L))) // a, b, c seen in first 2 docs
  }

  test("charClassProfile: exact class counts on a hand corpus") {
    val docs = Seq((1L, "en", "Ab1 c"), (2L, "en", "xy")).toDF("doc_id", "lang", "text")
    val r = TextAnalysis.charClassProfile(docs).collect().head
    // "Ab1 c" + "xy": lower a,b,c,x,y=5? A=1 upper, 1 digit, 1 space; chars 5+2=7
    assert(r.getLong(1) == 2L && r.getLong(2) == 7L)
    assert(r.getLong(3) == 4L && r.getLong(4) == 1L && r.getLong(5) == 1L &&
      r.getLong(6) == 1L && r.getLong(7) == 0L)
    assert(r.getDouble(8) == 5.0 / 7.0)
  }

  test("sessionDurationHistogram buckets are log2 bands and cover all sessions") {
    val events = graft.Tables.loadEvents(spark, sf())
    val sessions = graft.streaming.StreamingOps.sessionize(events)
    val out = EventAnalytics.sessionDurationHistogram(events).collect()
    assert(out.map(_.getLong(1)).sum == sessions.count())
    out.foreach { r =>
      val (b, lo, hi) = (r.getInt(0), r.getLong(2), r.getLong(3))
      // every duration in the bucket has bit-length b
      assert(java.lang.Long.toBinaryString(math.max(lo, 1L)).length == b ||
        (lo == 0L && b == 1))
      assert(java.lang.Long.toBinaryString(math.max(hi, 1L)).length == b ||
        (hi == 0L && b == 1))
    }
  }

  test("minhashEstimatorReport: identical docs estimate 1.0 exactly, error 0") {
    val docs = Seq(
      (1L, "one two three four five six seven eight"),
      (2L, "one two three four five six seven eight"), // exact dup → J=1
      (3L, "nine ten eleven twelve thirteen fourteen fifteen sixteen")
    ).toDF("doc_id", "text")
    val out = Dedup.minhashEstimatorReport(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out((1L, 2L)) == ((1.0, 1.0, 0.0)))
    // non-dup pair only appears if some band collides; if present its
    // exact jaccard must be 0 and the error equals the estimate
    out.get((1L, 3L)).foreach { case (ex, est, err) =>
      assert(ex == 0.0 && err == est)
    }
  }

  test("reshardPlan: cell counts partition the corpus; moves iff shards differ") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val out = Sampling.reshardPlan(docs, oldN = 8, newN = 12).collect()
    assert(out.map(_.getLong(2)).sum == docs.count())
    out.foreach { r =>
      assert(r.getBoolean(3) == (r.getLong(0) != r.getLong(1)))
      // old = b mod 8, new = b mod 12 → both ≡ b (mod 4)
      assert(r.getLong(0) % 4 == r.getLong(1) % 4)
    }
  }

  test("budgetAllocation: floor allocation, deficit only when underfilled") {
    val docs = Seq(
      (1L, "en", "a b c"), (2L, "en", "d e"), // en: 5 tokens
      (3L, "de", "x y z w")                   // de: 4 tokens
    ).toDF("doc_id", "lang", "text")
    val out = Sampling.budgetAllocation(docs, budgetTokens = 10L,
      weights = Map("en" -> 55, "de" -> 45))
      .collect().map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getLong(5)))).toMap
    // en: alloc = 10*55//100 = 5, available 5 → filled, deficit 0
    assert(out("en") == ((5L, 5L, false, 0L)))
    // de: alloc = 10*45//100 = 4, available 4 → filled exactly
    assert(out("de") == ((4L, 4L, false, 0L)))
  }

  test("mediaBudgetReport: lower median and largest pick on a hand fixture") {
    import graft.operators.Multimodal.MediaMeta
    val meta = Seq(
      MediaMeta(1L, "image", 10L, 0L, 1, 1, 1),
      MediaMeta(2L, "image", 30L, 0L, 1, 1, 1),
      MediaMeta(3L, "image", 20L, 0L, 1, 1, 1),
      MediaMeta(4L, "audio", 7L, 0L, 1, 1, 1),
      MediaMeta(5L, "audio", 7L, 0L, 1, 1, 1)
    ).toDF()
    val out = Multimodal.mediaBudgetReport(meta)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out("image") == ((3L, 60L, 20L, 2L, 30L)))
    // audio: tie at 7 bytes → largest = smaller id (4); lower median n=2 → rank 1
    assert(out("audio") == ((2L, 14L, 7L, 4L, 7L)))
  }

  test("normAudit: exact norms on a hand fixture") {
    val v34 = Array.fill(64)(0f); v34(0) = 3f; v34(1) = 4f // norm 5
    val v1 = Array.fill(64)(0f); v1(5) = 1f               // norm 1
    val emb = Seq((1L, "en", v34.toSeq), (2L, "en", v1.toSeq))
      .toDF("vec_id", "lang", "embedding")
    val out = SimilaritySearch.normAudit(emb).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(0) == "en" && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 5.0)
    assert(r.getDouble(4) == 3.0) // (5e6 + 1e6) / (2 * 1e6)
  }
}

/** Helper keeping the predictability collect tidy. */
private object LmFixture {
  def run(docs: org.apache.spark.sql.DataFrame, branch: Int)
      : Map[Long, (Long, Long, Double)] =
    TextAnalysis.lmPredictability(docs, branch = branch)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
}
