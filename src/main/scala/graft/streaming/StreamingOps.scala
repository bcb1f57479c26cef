package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.config.LookupConfig
import graft.operators.LookupTransform

/**
 * Streaming surface of the engine (Structured Streaming). The reference
 * plugin declares streaming-pipeline compatibility but contains no
 * streaming logic of its own (`pom.xml:30`, SURVEY.md §1.1) — the host
 * platform would run the same join on a streaming dataset. In Spark that
 * is literal: the SAME DataFrame compositions run under `readStream`, so
 * both operators here work unchanged on batch and streaming frames.
 *
 * Scale notes:
 *   - `enrich` is the classic stream-static join: the static lookup side
 *     is broadcast once per micro-batch plan, the stream side is never
 *     shuffled. This is the streaming face of the reference's lookup
 *     operator (`Lookup.java:59-64`).
 *   - `windowedStats` is a watermarked tumbling-window aggregation:
 *     watermark bounds state (late events beyond it are dropped), windows
 *     align to the epoch — equivalent to `date_trunc` bucketing in batch.
 *     Aggregates are integer counts and min/max only, so results are
 *     independent of partitioning and arrival order.
 */
object StreamingOps {

  /** Stream-static lookup enrichment: `stream` rows enriched from a static
    * `lookup` dimension via the engine's Lookup operator (broadcast
    * left-outer equi-join; all E1-E8 semantics apply per micro-batch). */
  def enrich(stream: DataFrame, streamName: String, lookup: DataFrame,
      cfg: LookupConfig): DataFrame =
    LookupTransform(Map(streamName -> stream, cfg.lookupDataset -> lookup), cfg)

  /** Streaming CDC verdicts against a static snapshot: each arriving doc
    * labelled `added` (id unseen in the snapshot), `changed` (id present,
    * content hash differs) or `unchanged` — the incremental-ingest face of
    * `Profiler.corpusDiff`. `removed` requires observing the ABSENCE of an
    * id, which an unbounded stream cannot do; compute it batch-side from
    * the snapshot anti-join when the stream epoch closes (documented
    * asymmetry, parity spec pins the three observable verdicts equal the
    * batch operator's). Per micro-batch this is one broadcast-able
    * stream-static left join on the id — the snapshot reduces to
    * (id, md5) once, nothing stateful. */
  def streamingCorpusDiff(stream: DataFrame, snapshot: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val snap = snapshot.select(col(idCol), md5(col(textCol)).as("__ha"))
    stream.select(col(idCol), md5(col(textCol)).as("__hb"))
      .join(snap, Seq(idCol), "left_outer")
      .select(col(idCol),
        when(col("__ha").isNull, "added")
          .when(col("__ha") === col("__hb"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Watermarked tumbling-window statistics per key: event count, distinct
    * users, min/max value. On a batch frame the watermark is a no-op and
    * this is plain `date_trunc`-style bucketing — the property the DuckDB
    * oracle exploits. */
  def windowedStats(events: DataFrame, tsCol: String = "ts",
      keyCol: String = "event_type", valueCol: String = "value",
      userCol: String = "user_id", windowDuration: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark(tsCol, watermark) else events
    // Streaming state stores cannot hold exact distinct sets; use the HLL
    // sketch there (the standard streaming trade-off) and exact distinct in
    // batch (what the DuckDB oracle checks).
    val distinctUsers =
      if (events.isStreaming) approx_count_distinct(col(userCol))
      else count_distinct(col(userCol))
    withWm
      .groupBy(window(col(tsCol), windowDuration).as("w"), col(keyCol))
      .agg(
        count(lit(1)).as("n_events"),
        distinctUsers.as("n_users"),
        min(col(valueCol)).as("min_value"),
        max(col(valueCol)).as("max_value"))
      .select(col("w.start").as("window_start"), col(keyCol),
        col("n_events"), col("n_users"), col("min_value"), col("max_value"))
  }

  /**
   * Watermarked windowed HLL register table: per (window, key, bucket) the
   * max rank — the deterministic distinct-count sketch (graft.operators
   * .Sketches) under Structured Streaming. The register table is exactly
   * the mergeable state streaming aggregation wants: `max` is
   * associative/commutative, so late-but-in-watermark events fold in
   * correctly, and downstream consumers merge register tables across
   * windows/jobs (element-wise max) before estimating. State per key is
   * one integer per non-empty bucket — at most `2^p` rows per (window,
   * key) regardless of event volume. On a batch frame the watermark is a
   * no-op and the output equals `Sketches.hllRegisters` over the same
   * window buckets (the property the spec pins).
   */
  def windowedHllRegisters(events: DataFrame, valueCol: String,
      tsCol: String = "ts", keyCol: String = "event_type",
      windowDuration: String = "1 hour", watermark: String = "2 hours",
      p: Int = 4): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark(tsCol, watermark) else events
    val (bucket, r) = graft.operators.Sketches.bucketAndRank(col(valueCol), p)
    withWm
      .select(window(col(tsCol), windowDuration).as("w"), col(keyCol),
        bucket.as("bucket"), r.as("r"))
      .groupBy(col("w"), col(keyCol), col("bucket"))
      .agg(max(col("r")).as("register"))
      .select(col("w.start").as("window_start"), col(keyCol),
        col("bucket"), col("register"))
  }

  /**
   * Streaming exact dedup with custom state: the first row per content key
   * is emitted, later arrivals (same or later micro-batches) are dropped.
   * `KeyValueGroupedDataset.flatMapGroupsWithState` holds one boolean of
   * state per key — the designated Structured Streaming extension point
   * for custom state machines.
   *
   * Scale notes: state is partitioned by key across the cluster (grows
   * with distinct keys, not rows). With `stateTimeout = Some(d)` a key's
   * state expires after `d` of processing-time inactivity, bounding the
   * store — the standard dedup-window trade-off (a key re-appearing after
   * expiry is treated as new). Caveats of `ProcessingTimeTimeout`: the
   * engine schedules extra micro-batches to fire expirations (every
   * execution "requires another batch"), so give the query a real trigger
   * interval, and note `processAllAvailable()` never returns on such a
   * query — tests use the default `None` (no expiry). For event-time
   * bounded dedup prefer the built-in
   * `withWatermark(...).dropDuplicatesWithinWatermark(key)`; this operator
   * exists for the min-id keep rule + the custom-state extension point.
   * Within a micro-batch the kept row is the minimum id (deterministic
   * under shuffle order). Batch analog: `Dedup.exact`.
   *
   * Input contract: (`idCol`: long, `keyCol`: string) — key on a content
   * hash (e.g. `TextFunctions.rollingHash`/md5) for text dedup.
   */
  /**
   * Watermarked windowed shard manifest — the streaming face of
   * `graft.sources.IO.shardManifest`: per (event-time window,
   * content-addressed shard), the row count and order-insensitive XOR
   * content checksum. Count and XOR are associative/commutative, so
   * late-but-in-watermark rows fold in correctly and a window's manifest
   * is FINAL once the watermark passes — the integrity artifact a
   * continuous exporter publishes alongside each window's files, diffed
   * by the importer exactly like the batch manifest. State per key is
   * two longs regardless of row volume. On a batch frame the watermark
   * is a no-op and the output equals the same grouped aggregation over
   * window buckets (the property the spec pins).
   */
  def windowedManifest(rows: DataFrame, contentHash: Column,
      nShards: Int = 8, tsCol: String = "ts", idCol: String = "event_id",
      windowDuration: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    val withWm =
      if (rows.isStreaming) rows.withWatermark(tsCol, watermark) else rows
    withWm.select(window(col(tsCol), windowDuration).as("w"),
        (graft.operators.Sampling.bucket(col(idCol)) % nShards).as("shard_id"),
        contentHash.as("__h"))
      .groupBy(col("w"), col("shard_id"))
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(__h)").as("checksum"))
      .select(col("w.start").as("window_start"), col("shard_id"),
        col("n_rows"), col("checksum"))
  }

  /**
   * Watermarked windowed Bloom word table: per (window, word_idx) the
   * OR-folded bit mask over the window's content keys — a per-window
   * membership sketch a downstream decontamination/lookup step ships
   * instead of the window's raw keys (the q44/q150 sketch-shipping
   * pattern, built incrementally). `bit_or` is commutative and
   * idempotent, so the window's filter is FINAL at watermark close and
   * merging across windows (or with a batch-built filter over the same
   * rows) is element-wise OR — stream == batch spec-pinned.
   */
  def windowedBloom(rows: DataFrame, valueCol: String,
      tsCol: String = "ts", mBits: Int = 1 << 16, k: Int = 5,
      windowDuration: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    // Batch twin: conditional probe-side parallelism (r16 opt, guide
    // §2.6) — the Bloom positions explode + mask arithmetic run as
    // map-side work BEFORE the grid groupBy, so a one-row-group local
    // scan serialized the whole sketch build on one task (measured:
    // q255's heavy stage was 1 task, 1.05 s). No-op at scale; the
    // streaming twin's state partitioning is the engine's. Applied only
    // here and in windowedCms, where the map-side sketch arithmetic is
    // the cost (q255 1.23 → 0.98 s matched focused): the light-map
    // twins measured WORSE with the extra exchange (q257 manifest
    // 0.33 → 0.77, q23 sessionize 0.48 → 0.80 — their per-row work is
    // one hash/bucket and the downstream groupBy shuffles anyway), so
    // they keep the bare scan.
    val withWm =
      if (rows.isStreaming) rows.withWatermark(tsCol, watermark)
      else graft.SparkUtil.ensureParallelism(rows)
    val bits = graft.operators.Sketches.BloomWordBits
    withWm.where(col(valueCol).isNotNull)
      .select(window(col(tsCol), windowDuration).as("w"),
        explode(array(graft.operators.Sketches.bloomPositions(
          col(valueCol), mBits, k): _*)).as("__pos"))
      .select(col("w"), expr(s"__pos div $bits").as("word_idx"),
        expr(s"shiftleft(CAST(1 AS BIGINT), CAST(__pos % $bits AS INT))")
          .as("__mask"))
      .groupBy(col("w"), col("word_idx"))
      .agg(expr("bit_or(__mask)").as("bits"))
      .select(col("w.start").as("window_start"), col("word_idx"),
        col("bits"))
  }

  /**
   * Watermarked windowed CMS grid: per (window, row_idx, col_idx) the
   * summed cell count over the window's values — the per-window
   * frequency sketch (hot-key / trending-token detection without a
   * full per-value aggregation downstream). SUM cells are mergeable
   * across windows and with batch-built grids; stream == batch
   * spec-pinned. Unlike the batch [[graft.operators.Sketches.cmsTable]]
   * there is no pre-aggregation by value (streaming state is the grid
   * itself, bounded at depth×width cells per window regardless of the
   * value space — which is the point).
   */
  def windowedCms(rows: DataFrame, valueCol: String,
      tsCol: String = "ts", width: Int = 1024, depth: Int = 4,
      windowDuration: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    val withWm =
      if (rows.isStreaming) rows.withWatermark(tsCol, watermark)
      else graft.SparkUtil.ensureParallelism(rows)
    withWm.where(col(valueCol).isNotNull)
      .select(window(col(tsCol), windowDuration).as("w"),
        explode(array(graft.operators.Sketches.bloomPositions(
          col(valueCol), width, depth).zipWithIndex.map {
          case (pos, i) => struct(lit(i).as("i"), pos.as("pos"))
        }: _*)).as("__c"))
      .select(col("w"), col("__c.i").as("row_idx"),
        col("__c.pos").as("col_idx"))
      .groupBy(col("w"), col("row_idx"), col("col_idx"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("window_start"), col("row_idx"),
        col("col_idx"), col("cnt"))
  }

  def streamingDedup(stream: DataFrame, idCol: String = "doc_id",
      keyCol: String = "content_key",
      stateTimeout: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val spark = stream.sparkSession
    import spark.implicits._
    val timeoutConf = if (stateTimeout.isDefined) {
      GroupStateTimeout.ProcessingTimeTimeout()
    } else GroupStateTimeout.NoTimeout()
    val pairs = stream
      .select(col(idCol).cast("long"), col(keyCol).cast("string"))
      .as[(Long, String)]
    pairs
      .groupByKey(_._2)
      .flatMapGroupsWithState[Boolean, (Long, String)](
        OutputMode.Append, timeoutConf) {
        (_: String, rows: Iterator[(Long, String)], state) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else if (state.exists) {
            Iterator.empty // key already seen in an earlier batch
          } else {
            state.update(true)
            stateTimeout.foreach(state.setTimeoutDuration)
            val first = rows.minBy(_._1) // deterministic within-batch pick
            Iterator.single(first)
          }
      }
      .toDF(idCol, keyCol)
  }

  /** Gap-based sessionization per user via Spark's native `session_window`
    * (merges events closer than `gap`; session end = last event + gap).
    * The same call runs under Structured Streaming with a watermark —
    * session windows are the canonical stateful-merge use case. One
    * shuffle on (user, session); deterministic because session boundaries
    * depend only on event times, not arrival/partition order. */
  def sessionize(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts", gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark(tsCol, watermark) else events
    withWm
      .groupBy(session_window(col(tsCol), gap).as("sw"), col(userCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col(userCol),
        col("sw.start").as("session_start"),
        col("sw.end").as("session_end"),
        col("n_events"))
  }
}
