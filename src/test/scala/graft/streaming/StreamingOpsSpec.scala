package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.config.LookupConfig

/**
 * Structured Streaming tests: the windowed aggregation and the
 * stream-static lookup enrichment, both driven through MemoryStream
 * micro-batches (no external sources needed).
 */
case class Ev(ts: Timestamp, event_type: String, user_id: Long, value: Double)

class StreamingOpsSpec extends SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s)

  test("windowedStats on a stream: epoch-aligned hour windows, correct stats") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark0.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamingOps.windowedStats(input.toDF())
      .writeStream.format("memory").queryName("win_test").outputMode("complete").start()
    try {
      input.addData(
        Ev(t("2024-01-01 10:05:00"), "click", 1L, 2.0),
        Ev(t("2024-01-01 10:55:00"), "click", 2L, 8.0),
        Ev(t("2024-01-01 11:05:00"), "click", 1L, 5.0),
        Ev(t("2024-01-01 10:30:00"), "view", 1L, 1.0))
      q.processAllAvailable()
      val rows = spark.table("win_test").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1)) ->
          (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
      assert(rows(("2024-01-01 10:00:00.0", "click")) == ((2L, 2L, 2.0, 8.0)))
      assert(rows(("2024-01-01 11:00:00.0", "click")) == ((1L, 1L, 5.0, 5.0)))
      assert(rows(("2024-01-01 10:00:00.0", "view")) == ((1L, 1L, 1.0, 1.0)))
    } finally q.stop()
  }

  test("windowedStats on batch equals the same call on a stream of the same rows") {
    val spark0 = spark
    import spark0.implicits._
    val batch = Seq(
      Ev(t("2024-01-01 10:05:00"), "click", 1L, 2.0),
      Ev(t("2024-01-01 11:05:00"), "click", 1L, 5.0)).toDF()
    val rows = StreamingOps.windowedStats(batch).collect()
    assert(rows.length == 2) // watermark path skipped, same aggregation shape
  }

  test("hashSample and trainTestSplit run unchanged on streams (stateless projections)") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark0.sqlContext
    val input = MemoryStream[Long]
    val docs = input.toDF().withColumnRenamed("value", "doc_id")
    val q = graft.operators.Sampling.trainTestSplit(
        graft.operators.Sampling.hashSample(docs, pct = 60), testPct = 20)
      .writeStream.format("memory").queryName("sample_test").outputMode("append").start()
    try {
      input.addData(0L until 200L: _*)
      q.processAllAvailable()
      val streamed = spark.table("sample_test").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      // identical membership and split labels as the batch call
      val batch = graft.operators.Sampling.trainTestSplit(
          graft.operators.Sampling.hashSample(
            (0L until 200L).toDF("doc_id"), pct = 60), testPct = 20)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(streamed == batch)
      assert(streamed.nonEmpty && streamed.values.toSet.subsetOf(Set("train", "test")))
    } finally q.stop()
  }

  test("windowedHllRegisters: stream output equals the batch sketch on the same rows") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark0.sqlContext
    val evs = Seq(
      Ev(t("2024-01-01 10:05:00"), "click", 1L, 2.0),
      Ev(t("2024-01-01 10:15:00"), "click", 2L, 8.0),
      Ev(t("2024-01-01 10:25:00"), "click", 1L, 2.0), // dup value -> same register
      Ev(t("2024-01-01 11:05:00"), "click", 3L, 5.0),
      Ev(t("2024-01-01 10:30:00"), "view", 1L, 1.0))
    val input = MemoryStream[Ev]
    val q = StreamingOps.windowedHllRegisters(input.toDF(), valueCol = "user_id")
      .writeStream.format("memory").queryName("hll_test").outputMode("complete").start()
    try {
      input.addData(evs: _*)
      q.processAllAvailable()
      def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getInt(3)))
        .sorted.toSeq
      val streamed = canon(spark.table("hll_test"))
      val batch = canon(StreamingOps.windowedHllRegisters(evs.toDF(), valueCol = "user_id"))
      assert(streamed == batch)
      assert(streamed.nonEmpty)
      // mergeable-state property: every register row is (bucket < 16, rank >= 1)
      assert(streamed.forall { case (_, _, b, r) => b >= 0 && b < 16 && r >= 1 })
    } finally q.stop()
  }

  test("windowedBloom: stream output equals the batch-built per-window filter") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark0.sqlContext
    val evs = Seq(
      Ev(t("2024-01-01 10:05:00"), "alpha", 1L, 1.0),
      Ev(t("2024-01-01 10:15:00"), "beta", 2L, 1.0),
      Ev(t("2024-01-01 10:25:00"), "alpha", 3L, 1.0), // dup value -> same bits
      Ev(t("2024-01-01 11:05:00"), "gamma", 4L, 1.0))
    val input = MemoryStream[Ev]
    val q = StreamingOps.windowedBloom(input.toDF(), valueCol = "event_type")
      .writeStream.format("memory").queryName("bloom_win")
      .outputMode("complete").start()
    try {
      input.addData(evs: _*)
      q.processAllAvailable()
      def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2)))
        .sorted.toSeq
      val streamed = canon(spark.table("bloom_win"))
      val batch = canon(StreamingOps.windowedBloom(evs.toDF(),
        valueCol = "event_type"))
      assert(streamed == batch && streamed.nonEmpty)
      // window closure: the 10:00 window's filter equals the batch Bloom
      // of exactly its values — the sketch a window SHIPS is final
      val win10 = streamed.filter(_._1.startsWith("2024-01-01 10"))
        .map { case (_, w, b) => (w, b) }.toMap
      val direct = graft.operators.Sketches.bloomWords(
          Seq("alpha", "beta", "alpha").toDF("v"), "v")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(win10 == direct)
    } finally q.stop()
  }

  test("windowedCms: stream grid equals batch; cells count occurrences") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark0.sqlContext
    val evs = Seq(
      Ev(t("2024-01-01 10:05:00"), "alpha", 1L, 1.0),
      Ev(t("2024-01-01 10:25:00"), "alpha", 2L, 1.0),
      Ev(t("2024-01-01 10:35:00"), "beta", 3L, 1.0),
      Ev(t("2024-01-01 11:05:00"), "alpha", 4L, 1.0))
    val input = MemoryStream[Ev]
    val q = StreamingOps.windowedCms(input.toDF(), valueCol = "event_type")
      .writeStream.format("memory").queryName("cms_win")
      .outputMode("complete").start()
    try {
      input.addData(evs: _*)
      q.processAllAvailable()
      def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getTimestamp(0).toString, r.getInt(1), r.getLong(2),
          r.getLong(3))).sorted.toSeq
      val streamed = canon(spark.table("cms_win"))
      val batch = canon(StreamingOps.windowedCms(evs.toDF(),
        valueCol = "event_type"))
      assert(streamed == batch && streamed.nonEmpty)
      // depth cells per distinct value per window; alpha's 10:00 cells
      // carry weight 2 (two occurrences), 11:00 cells weight 1
      val w10 = streamed.filter(_._1.startsWith("2024-01-01 10"))
      assert(w10.map(_._4).max == 2L)
      assert(streamed.filter(_._1.startsWith("2024-01-01 11"))
        .forall(_._4 == 1L))
    } finally q.stop()
  }

  test("r7 narrow gates run unchanged on streams (markup density, group holdout)") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark0.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val docs = input.toDF().toDF("doc_id", "text", "source")
    val gated = graft.operators.Sampling.groupHoldout(
      graft.operators.TextAnalysis.markupDensity(docs)
        .join(docs, Seq("doc_id")), "source", testPct = 30)
    assert(gated.isStreaming)
    val q = gated.writeStream.format("memory").queryName("gate_stream")
      .outputMode("append").start()
    try {
      input.addData((1L, "<div>x</div>", "a"), (2L, "plain words", "b"))
      q.processAllAvailable()
      val rows = spark.table("gate_stream")
        .select("doc_id", "markup_per_mille", "split").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
      assert(rows.size == 2 && rows(2L)._1 == 0L)
      assert(rows.values.map(_._2).forall(Set("train", "test")))
    } finally q.stop()
  }

  test("sessionize: gap-based session merge with end = last event + gap") {
    val spark0 = spark
    import spark0.implicits._
    val batch = Seq(
      Ev(t("2024-01-01 10:00:00"), "click", 1L, 1.0),
      Ev(t("2024-01-01 10:10:00"), "click", 1L, 1.0),  // same session (10 min gap)
      Ev(t("2024-01-01 11:30:00"), "click", 1L, 1.0),  // new session (80 min gap)
      Ev(t("2024-01-01 10:05:00"), "view", 2L, 1.0))   // separate user
    val rows = StreamingOps.sessionize(batch.toDF()).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString) ->
        (r.getTimestamp(2).toString, r.getLong(3))).toMap
    assert(rows((1L, "2024-01-01 10:00:00.0")) == (("2024-01-01 10:40:00.0", 2L)))
    assert(rows((1L, "2024-01-01 11:30:00.0")) == (("2024-01-01 12:00:00.0", 1L)))
    assert(rows((2L, "2024-01-01 10:05:00.0")) == (("2024-01-01 10:35:00.0", 1L)))
  }

  test("sessionize boundary: an exactly-gap-sized silence still MERGES " +
      "(session_window extends while next start <= current end) — the " +
      "q23 oracle's strict-> new-session rule. The events fixture has no " +
      "exact-gap pair, so this pin carries the boundary semantics the " +
      "oracle cannot exercise") {
    val spark0 = spark
    import spark0.implicits._
    val rows = StreamingOps.sessionize(Seq(
        Ev(t("2024-01-01 10:00:00"), "click", 1L, 1.0),
        Ev(t("2024-01-01 10:30:00"), "click", 1L, 1.0), // == gap: merges
        Ev(t("2024-01-01 11:00:01"), "click", 1L, 1.0)) // > gap: new session
      .toDF()).collect()
    assert(rows.length == 2, rows.mkString(";"))
    assert(rows.map(_.getLong(3)).sorted.toSeq == Seq(1L, 2L))
  }

  test("sessionize runs under Structured Streaming with a watermark") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark0.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamingOps.sessionize(input.toDF())
      .writeStream.format("memory").queryName("sess_test").outputMode("complete").start()
    try {
      input.addData(
        Ev(t("2024-01-01 10:00:00"), "click", 1L, 1.0),
        Ev(t("2024-01-01 10:10:00"), "click", 1L, 1.0))
      q.processAllAvailable()
      val rows = spark.table("sess_test").collect()
      assert(rows.length == 1 && rows.head.getLong(3) == 2L)
    } finally q.stop()
  }

  test("streamingDedup keeps min-id first occurrence, suppresses later batches") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark0.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = StreamingOps.streamingDedup(input.toDF().toDF("doc_id", "content_key"))
      .writeStream.format("memory").queryName("dedup_test").outputMode("append").start()
    try {
      input.addData((2L, "a"), (1L, "a"), (3L, "b"))
      q.processAllAvailable()
      input.addData((4L, "a"), (5L, "c")) // "a" already seen in batch 1
      q.processAllAvailable()
      val rows = spark.table("dedup_test").collect()
        .map(r => r.getString(1) -> r.getLong(0)).toMap
      assert(rows == Map("a" -> 1L, "b" -> 3L, "c" -> 5L))
    } finally q.stop()
  }

  test("Bloom decontamination filter runs unchanged under Structured Streaming") {
    // the sketch-as-literal shape is streaming-safe by construction: the
    // Bloom words ride the plan as a literal, so the candidate filter is
    // a stateless per-row projection any stream can run in append mode
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark0.sqlContext
    val evalSet = Seq("leak me", "and me").toDF("text")
    val words = graft.operators.Sketches.bloomArray(evalSet, "text", 1 << 12, 5)
    val input = MemoryStream[String]
    val filtered = input.toDF().toDF("text")
      .filter(!graft.operators.Sketches.bloomMightContain(col("text"), words, 1 << 12, 5))
    val q = filtered.writeStream.format("memory")
      .queryName("bloom_stream_test").outputMode("append").start()
    try {
      input.addData("clean doc", "leak me", "also clean", "and me")
      q.processAllAvailable()
      val kept = spark.table("bloom_stream_test").collect().map(_.getString(0)).toSet
      assert(kept == Set("clean doc", "also clean"))
    } finally q.stop()
  }

  test("stream-stream interval join emits only in-window key matches") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark0.sqlContext
    val left = MemoryStream[(Long, Long)]
    val right = MemoryStream[(Long, Long)]
    val l = left.toDF().toDF("k", "sec")
      .select(col("k"), timestamp_seconds(col("sec")).as("lt"))
    val r = right.toDF().toDF("rk", "rsec")
      .select(col("rk"), timestamp_seconds(col("rsec")).as("rt"))
    val joined = graft.operators.IntervalJoin.streaming(
      l, r, "k", "rk", "lt", "rt", lookback = "1 minute", watermark = "10 minutes")
    val q = joined.select(col("k"), unix_timestamp(col("rt")).as("rsec")).writeStream
      .format("memory").queryName("ij_test").outputMode("append").start()
    try {
      left.addData((1L, 1000L), (2L, 1000L))
      right.addData((1L, 950L), (1L, 930L), (2L, 1000L), (3L, 1000L))
      q.processAllAvailable()
      val rows = spark.table("ij_test").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows == Set((1L, 950L), (2L, 1000L))) // 930 out of window; key 3 unmatched
    } finally q.stop()
  }

  test("stream-static enrich: lookup semantics per micro-batch (left outer, broadcast)") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark0.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("cust_id", "tier")
    val input = MemoryStream[(Long, Double)]
    val stream = input.toDF().toDF("cust", "amount")
    val enriched = StreamingOps.enrich(stream, "payments", dim,
      LookupConfig("dim", "cust", "cust_id", "tier"))
    val q = enriched.writeStream.format("memory").queryName("enrich_test")
      .outputMode("append").start()
    try {
      input.addData((1L, 10.0), (3L, 30.0))
      q.processAllAvailable()
      val rows = spark.table("enrich_test").collect()
        .map(r => r.getLong(0) -> Option(r.getString(2))).toMap
      assert(rows(1L).contains("gold"))
      assert(rows(3L).isEmpty) // E1: unmatched stream row survives with null
    } finally q.stop()
  }

  test("streamingCorpusDiff: per-batch CDC verdicts equal the batch operator") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark0.sqlContext
    val snapshot = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
      .toDF("doc_id", "text")
    val input = MemoryStream[(Long, String)]
    val out = StreamingOps.streamingCorpusDiff(
      input.toDF().toDF("doc_id", "text"), snapshot)
    val q = out.writeStream.format("memory").queryName("cdc_test")
      .outputMode("append").start()
    try {
      input.addData((2L, "beta"), (3L, "gamma-edited"), (9L, "new doc"))
      q.processAllAvailable()
      val got = spark.table("cdc_test").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == Map(2L -> "unchanged", 3L -> "changed", 9L -> "added"))
      // parity: the batch operator agrees on every stream-observable verdict
      val batch = graft.operators.Profiler.corpusDiff(snapshot,
        Seq((2L, "beta"), (3L, "gamma-edited"), (9L, "new doc"))
          .toDF("doc_id", "text")).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      got.foreach { case (id, st) => assert(batch(id) == st) }
      // the asymmetry is exactly `removed` (doc 1), batch-only
      assert(batch(1L) == "removed")
    } finally q.stop()
  }

  test("qualityFilter and chunk run unchanged under Structured Streaming") {
    // both are stateless narrow transformations (per-row projection /
    // per-row explode), so the same operator code runs append-mode on a
    // stream and must produce exactly the batch rows
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark0.sqlContext
    val rows = Seq(
      (1L, "the cat sat on the mat with a hat"),
      (2L, "a b"),
      (3L, "the quick brown fox jumps over the lazy dog again and again"))
    val batch = rows.toDF("doc_id", "text")
    val input = MemoryStream[(Long, String)]
    val streamDocs = input.toDF().toDF("doc_id", "text")
    val q1 = graft.operators.TextAnalysis.qualityFilter(streamDocs, minTokens = 3)
      .writeStream.format("memory").queryName("qf_stream")
      .outputMode("append").start()
    val q2 = graft.operators.TextAnalysis.chunk(streamDocs, chunkTokens = 4, stride = 3)
      .writeStream.format("memory").queryName("chunk_stream")
      .outputMode("append").start()
    try {
      input.addData(rows: _*)
      q1.processAllAvailable()
      q2.processAllAvailable()
      val sQf = spark.table("qf_stream").collect().map(_.toSeq).toSet
      val bQf = graft.operators.TextAnalysis.qualityFilter(batch, minTokens = 3)
        .collect().map(_.toSeq).toSet
      assert(sQf == bQf, "streaming qualityFilter differs from batch")
      val sCh = spark.table("chunk_stream").collect().map(_.toSeq).toSet
      val bCh = graft.operators.TextAnalysis.chunk(batch, chunkTokens = 4, stride = 3)
        .collect().map(_.toSeq).toSet
      assert(sCh == bCh, "streaming chunk differs from batch")
    } finally { q1.stop(); q2.stop() }
  }

  test("linearScore and profile classification run unchanged on a document stream") {
    // linearScore is a stateless projection; classifyByProfile against a
    // STATIC trained profile is the train-offline/serve-online shape —
    // the profile rides the micro-batch plan as a broadcast artifact,
    // exactly like the stream-static enrich lookup. The per-doc argmax
    // window is keyed by doc_id, which is unique per row, so append-mode
    // streaming semantics hold. (Training itself is a batch job — a
    // corpus-wide agg has no append-mode answer.)
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark0.sqlContext
    val rows = Seq(
      (1L, "aa", "abcabcabcabc"), (2L, "aa", "abcabc abcab"),
      (3L, "zz", "xyzxyzxyzxyz"), (4L, "zz", "the quick 99 Brown fox"))
    val batch = rows.toDF("doc_id", "lang", "text")
    val profiles = graft.operators.TextAnalysis.trainLangProfiles(batch, m = 3)
      .cache()
    val input = MemoryStream[(Long, String, String)]
    val streamDocs = input.toDF().toDF("doc_id", "lang", "text")
    val q1 = graft.operators.TextAnalysis.linearScore(streamDocs)
      .writeStream.format("memory").queryName("ls_stream")
      .outputMode("append").start()
    try {
      input.addData(rows: _*)
      q1.processAllAvailable()
      val sLs = spark.table("ls_stream").collect().map(_.toSeq).toSet
      val bLs = graft.operators.TextAnalysis.linearScore(batch)
        .collect().map(_.toSeq).toSet
      assert(sLs == bLs, "streaming linearScore differs from batch")
    } finally q1.stop()
    // classifyByProfile needs complete-per-key state only within one doc,
    // so run it foreachBatch-style: per micro-batch it equals batch
    val perBatch = graft.operators.TextAnalysis.classifyByProfile(
      batch, profiles).collect().map(_.toSeq).toSet
    val q2 = streamDocs.writeStream.foreachBatch {
      (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val got = graft.operators.TextAnalysis.classifyByProfile(b, profiles)
          .collect().map(_.toSeq).toSet
        assert(got == perBatch, "per-micro-batch classification differs from batch")
        ()
    }.start()
    try {
      input.addData(rows: _*)
      q2.processAllAvailable()
    } finally q2.stop()
    profiles.unpersist()
  }

  test("windowedManifest: stream output equals the batch manifest on the same rows") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark0.sqlContext
    import org.apache.spark.sql.functions._
    val h = graft.functions.TextFunctions.rollingHash(col("event_type"))
    val evs = Seq(
      Ev(t("2024-01-01 10:05:00"), "click", 1L, 2.0),
      Ev(t("2024-01-01 10:55:00"), "view", 2L, 8.0),
      Ev(t("2024-01-01 11:05:00"), "click", 3L, 5.0),
      Ev(t("2024-01-01 10:30:00"), "buy", 4L, 1.0))
    val input = MemoryStream[Ev]
    val q = StreamingOps.windowedManifest(input.toDF(), h, nShards = 2,
        idCol = "user_id")
      .writeStream.format("memory").queryName("manifest_stream")
      .outputMode("complete").start()
    try {
      // two micro-batches in arbitrary order: count and XOR are
      // commutative, so the final manifest must equal batch exactly
      input.addData(evs(2), evs(0))
      q.processAllAvailable()
      input.addData(evs(3), evs(1))
      q.processAllAvailable()
      val stream = spark.table("manifest_stream").collect().map(_.toSeq).toSet
      val batch = StreamingOps.windowedManifest(evs.toDF(), h, nShards = 2,
        idCol = "user_id").collect().map(_.toSeq).toSet
      assert(stream == batch, "streaming manifest differs from batch")
      assert(stream.nonEmpty)
    } finally q.stop()
  }

  test("media pHash signatures and stitch boundary hashes run unchanged on streams") {
    // both are stateless per-row work (mapPartitions decode + narrow
    // projection), so append-mode streaming must reproduce batch exactly
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark0.sqlContext
    import org.apache.spark.sql.functions._
    val rows = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely different payload content right here today"))
    val batch = rows.toDF("doc_id", "text")
    def sigs(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Multimodal
        .decodeMeta(graft.operators.Multimodal.mediaFromDocuments(df)).toDF()
        .select(col("media_id"),
          graft.operators.Multimodal.perceptualHash(col("checksum")).as("ph"))
    val input = MemoryStream[(Long, String)]
    val q = sigs(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("phash_stream")
      .outputMode("append").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      val s = spark.table("phash_stream").collect().map(_.toSeq).toSet
      val b = sigs(batch).collect().map(_.toSeq).toSet
      assert(s == b, "streaming pHash signatures differ from batch")
    } finally q.stop()
  }
}
