package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Batch analytics over the event stream table: per-entity anomaly
 * flagging and behavioral sequence mining. North-star extensions
 * (SURVEY.md §2.3 Tier B) — the operational face of the same corpus a
 * training pipeline ingests (crawl logs, interaction streams).
 *
 * Determinism: counts are exact integers; the only floats are the
 * shared-interpolation `percentile` (== DuckDB `quantile_cont`) and one
 * multiply in the spike compare — both bit-stable cross-engine. Orderings
 * are total (explicit tiebreaks), so every cut is deterministic.
 */
object EventAnalytics {

  /**
   * Activity-spike detection: per (entity, hour) event counts flagged
   * against `factor ×` the entity's own median hourly count — the
   * self-calibrating burst detector (bot bursts, scraper storms, runaway
   * clients) that needs no global threshold.
   *
   * Spark shape: one hash agg to (entity, hour) counts — map-side
   * partial counts, so raw events never shuffle — then a per-entity
   * median (a second agg over the already-small hourly table) joined
   * back on the entity key. At 100 TB the hourly table is |entities|×|hours|
   * — orders of magnitude under the event count — and AQE broadcasts the
   * median side when it fits. The spike rule compares an exact integer
   * count against `factor · median` (one multiply of the shared
   * interpolated double): deterministic cross-engine.
   */
  def activitySpikes(events: DataFrame, factor: Int = 3,
      tsCol: String = "ts", userCol: String = "user_id"): DataFrame = {
    val hourly = events
      .groupBy(col(userCol), date_trunc("hour", col(tsCol)).as("hour"))
      .agg(count(lit(1)).as("n_events"))
    val med = hourly.groupBy(col(userCol))
      .agg(percentile(col("n_events"), lit(0.5)).as("median_hourly"))
    hourly.join(med, userCol)
      .select(col(userCol), col("hour"), col("n_events"), col("median_hourly"),
        (col("n_events") >= lit(factor) * col("median_hourly")).as("spike"))
  }

  /**
   * Behavioral sequence mining: the `k` most frequent (event_type →
   * next event_type) transitions, ordered per entity by event time (id
   * tiebreak for a total order). The classic first-order Markov summary
   * of an interaction stream — funnels, loops, abandonment edges.
   *
   * Spark shape: one (entity)-partitioned `lead` window (the shuffle is
   * on the entity key — the same partitioning sessionization uses), a
   * hash agg over the tiny (type, type) key space with map-side partial
   * counts, and a `TakeOrderedAndProject` top-k cut under the total
   * (count desc, from asc, to asc) order.
   */
  def eventTransitions(events: DataFrame, k: Int = 20,
      tsCol: String = "ts", userCol: String = "user_id",
      typeCol: String = "event_type", idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    events
      .select(col(userCol), col(typeCol),
        lead(col(typeCol), 1).over(w).as("__next"))
      .filter(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
      .orderBy(col("n_transitions").desc, col("from_type").asc, col("to_type").asc)
      .limit(k)
  }

  /**
   * Windowed funnel analysis: how many entities progress through the
   * ordered `stages` sequence, where each stage must occur strictly
   * after the previous one and within `maxGapMinutes` of it. Semantics
   * are the standard greedy first-match funnel (Amplitude/GA style):
   * stage 1 anchors at the entity's EARLIEST stage-1 event, stage i+1 at
   * the earliest qualifying event after stage i — deterministic, and the
   * policy every funnel tool documents. Output: one row per stage with
   * the reached-entity count.
   *
   * Spark shape: stage 1 is one hash agg (min ts per entity); each later
   * stage is one equi-join on the entity key against the (shrinking)
   * reached set plus a min agg. All joins share the entity-key hash
   * partitioning (Exchange reuse), the event side is filtered to one
   * stage's type before joining (scan-side pushdown), and the reached
   * set only ever shrinks — at 100 TB the funnel tail is broadcast-sized
   * and AQE switches those joins to broadcast automatically. The final
   * per-stage counts are k scalar aggs unioned (k = |stages|, tiny).
   */
  def funnel(events: DataFrame, stages: Seq[String], maxGapMinutes: Int = 60,
      tsCol: String = "ts", userCol: String = "user_id",
      typeCol: String = "event_type"): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct == stages, "funnel stages must be distinct")
    val first = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
    val reached = stages.tail.scanLeft(first) { (prev, stage) =>
      events.filter(col(typeCol) === stage).as("e")
        .join(prev.as("p"), col(s"e.$userCol") === col(s"p.$userCol"))
        .filter(col(s"e.$tsCol") > col("__t") &&
          col(s"e.$tsCol") <= col("__t") +
            expr(s"INTERVAL $maxGapMinutes MINUTES"))
        .groupBy(col(s"e.$userCol").as(userCol))
        .agg(min(col(s"e.$tsCol")).as("__t"))
    }
    reached.zip(stages).zipWithIndex.map { case ((df, stage), i) =>
      df.agg(count(lit(1)).as("users_reached"))
        .select(lit(stage).as("stage"), lit(i).as("stage_index"),
          col("users_reached"))
    }.reduce(_ unionAll _)
  }

  /**
   * Cohort retention: entities grouped by first-active week (their
   * cohort), then for each (cohort, periods-since-cohort) the number of
   * still-active entities and the retention rate vs the cohort's size —
   * the standard product-analytics retention triangle, and in corpus
   * operations the contributor/source survival curve.
   *
   * Spark shape: events reduce to DISTINCT (entity, week) in one hash
   * agg (map-side partial dedup — raw events never shuffle twice); the
   * cohort is a second agg over that already-small activity table; one
   * entity-key join back (reusing the activity table's partitioning) and
   * one (cohort, period) count. Cohort sizes come from the period-0 rows
   * themselves (every entity is active in its own cohort week, so
   * period 0 always exists) — a broadcast-sized self-join, no extra
   * pass. Rate is one double division of exact counts.
   */
  def retentionCohorts(events: DataFrame, tsCol: String = "ts",
      userCol: String = "user_id"): DataFrame = {
    val weekly = events
      .select(col(userCol), date_trunc("week", col(tsCol)).as("__wk"))
      .distinct()
    val cohort = weekly.groupBy(col(userCol)).agg(min(col("__wk")).as("__cohort"))
    val counts = weekly.join(cohort, userCol)
      .select(col("__cohort").as("cohort_week"),
        expr("datediff(__wk, __cohort) div 7").cast("int").as("period"))
      .groupBy(col("cohort_week"), col("period"))
      .agg(count(lit(1)).as("n_active"))
    val base = counts.filter(col("period") === 0)
      .select(col("cohort_week"), col("n_active").as("__n0"))
    counts.join(broadcast(base), "cohort_week")
      .select(col("cohort_week"), col("period"), col("n_active"),
        (col("n_active").cast("double") / col("__n0").cast("double"))
          .as("retention"))
  }

  /**
   * Co-engagement graph: the `k` most frequent item pairs engaged by the
   * same entity — the item-item co-occurrence edge list behind
   * collaborative filtering, related-content linking, and (in corpus
   * curation) co-citation analysis. `itemExpr` extracts the item key
   * from an event row (e.g. a JSON property).
   *
   * Skew posture (the classic failure is one power user generating
   * |items|² pairs): each entity's DISTINCT items are capped at
   * `maxItemsPerUser` by first-engagement order (min event time, item
   * tiebreak — deterministic, keeps the entity's earliest interests), so
   * the per-entity pair fan-out is structurally bounded at cap². Spark
   * shape: one hash agg to (entity, item, first_ts), one entity-key
   * window for the cap, one self-equi-join on the entity key (reusing
   * that window's partitioning), and a map-side-partial count over the
   * pair key space — then a distributed TakeOrdered top-k cut under the
   * total (count desc, item_a, item_b) order. Raw events shuffle once.
   */
  def coEngagement(events: DataFrame, itemExpr: Column, k: Int = 20,
      maxItemsPerUser: Int = 30, tsCol: String = "ts",
      userCol: String = "user_id"): DataFrame =
    coPairs(events, itemExpr, maxItemsPerUser, tsCol, userCol)
      .orderBy(col("n_users").desc, col("item_a").asc, col("item_b").asc)
      .limit(k)

  /**
   * Co-engagement EDGE LIST: every item pair engaged by at least
   * `minUsers` distinct entities — [[coEngagement]]'s top-k cut replaced
   * by a support threshold, producing the full (support-filtered) graph
   * a downstream graph operator ([[GraphOps.pageRank]],
   * [[ConnectedComponents]]) consumes rather than a leaderboard. Same
   * per-entity cap² skew bound; the HAVING filter runs inside the final
   * map-side-partial count, so the full pair space never materializes.
   */
  def coEngagementEdges(events: DataFrame, itemExpr: Column,
      minUsers: Int, maxItemsPerUser: Int = 30, tsCol: String = "ts",
      userCol: String = "user_id"): DataFrame =
    coPairs(events, itemExpr, maxItemsPerUser, tsCol, userCol)
      .filter(col("n_users") >= minUsers)

  private def coPairs(events: DataFrame, itemExpr: Column,
      maxItemsPerUser: Int, tsCol: String, userCol: String): DataFrame = {
    val firstSeen = events
      .select(col(userCol), itemExpr.as("__item"), col(tsCol))
      .filter(col("__item").isNotNull)
      .groupBy(col(userCol), col("__item"))
      .agg(min(col(tsCol)).as("__first"))
    val capped = firstSeen
      .withColumn("__rn", row_number().over(Window.partitionBy(col(userCol))
        .orderBy(col("__first").asc, col("__item").asc)))
      .filter(col("__rn") <= maxItemsPerUser)
      .select(col(userCol), col("__item"))
    // NOT cached (r16 opt, measured and rejected — q106 1.48 -> 2.26 s):
    // equality self-join; both sides already share one shuffle via
    // ReusedExchange, a cache only adds a materialization barrier.
    capped.as("a").join(capped.as("b"),
        col(s"a.$userCol") === col(s"b.$userCol") &&
          col("a.__item") < col("b.__item"))
      .groupBy(col("a.__item").as("item_a"), col("b.__item").as("item_b"))
      .agg(count(lit(1)).as("n_users"))
  }

  /**
   * Top session journeys: sessionize by inactivity gap (the q23
   * semantics, event-level), take each session's first `pathLen` event
   * types in time order as its path string, count sessions per path,
   * return the top `topK` under the (count desc, path asc) total order
   * — the "what do users actually do" report product analytics runs
   * daily.
   *
   * Spark shape: session ids from one lag+running-sum window pair per
   * user partition (no global sort); the path string is an ordered-
   * frame `collect_list` over ≤ pathLen rows per session; the top-k cut
   * is a distributed TakeOrderedAndProject over the path-count agg —
   * paths are bounded by the event-type alphabet^pathLen, counts by
   * sessions.
   */
  def sessionPaths(events: DataFrame, gapMinutes: Int = 30,
      pathLen: Int = 5, topK: Int = 20, userCol: String = "user_id",
      tsCol: String = "ts", idCol: String = "event_id",
      typeCol: String = "event_type"): DataFrame = {
    require(pathLen >= 1 && topK >= 1, "pathLen and topK must be >= 1")
    val gapUs = gapMinutes.toLong * 60 * 1000000
    val wLag = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    val sess = events
      .select(col(userCol), col(idCol), col(tsCol), col(typeCol))
      .withColumn("__new",
        when(lag(expr(s"unix_micros($tsCol)"), 1).over(wLag).isNull ||
          expr(s"unix_micros($tsCol)") -
            lag(expr(s"unix_micros($tsCol)"), 1).over(wLag) > gapUs, 1L)
          .otherwise(0L))
      .withColumn("__sid", sum(col("__new")).over(
        wLag.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val wSess = Window.partitionBy(col(userCol), col("__sid"))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    val firstK = sess
      .withColumn("__rn", row_number().over(wSess))
      .filter(col("__rn") <= pathLen)
    val wFull = Window.partitionBy(col(userCol), col("__sid"))
      .orderBy(col(tsCol).asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    firstK
      .withColumn("__path",
        concat_ws(">", collect_list(col(typeCol)).over(wFull)))
      .filter(col("__rn") === 1)
      .groupBy(col("__path").as("path"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path").asc)
      .limit(topK)
  }

  /**
   * Robust per-entity outlier report via MAD (median absolute
   * deviation): an event is an outlier when its deviation from the
   * entity's own median value exceeds `k ×` the entity's MAD — the
   * self-calibrating cousin of the q74 spike detector, immune to the
   * mean-dragging a z-score suffers on heavy tails. Medians are the
   * deterministic LOWER median (value at rank ⌊(n+1)/2⌋ under the
   * (value, id) total order) so every arithmetic step replays exactly;
   * deviations and the k·MAD compare are single IEEE ops, bit-identical
   * on both engines.
   *
   * Spark shape: two rank-window passes per entity partition (median,
   * then MAD) with the per-entity medians joined back on the entity key
   * — no global sort anywhere; output is one row per entity.
   */
  def madOutliers(events: DataFrame, k: Int = 3,
      userCol: String = "user_id", valueCol: String = "value",
      idCol: String = "event_id"): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val base = events.select(col(userCol), col(idCol),
        col(valueCol).cast("double").as("__v"))
      .where(col("__v").isNotNull)
    def lowerMedian(df: DataFrame, v: String, out: String): DataFrame = {
      val w = Window.partitionBy(col(userCol))
        .orderBy(col(v).asc, col(idCol).asc)
      df.withColumn("__rn", row_number().over(w))
        .withColumn("__n", count(lit(1)).over(Window.partitionBy(col(userCol))))
        .filter(col("__rn") === expr("(__n + 1) div 2")) // lower median
        .select(col(userCol), col(v).as(out))
    }
    val med = lowerMedian(base, "__v", "__med")
    val dev = base.join(med, userCol)
      .withColumn("__dev", abs(col("__v") - col("__med")))
    val mad = lowerMedian(dev, "__dev", "__mad")
    dev.join(mad, userCol)
      .groupBy(col(userCol))
      .agg(count(lit(1)).as("n_events"),
        min(col("__med")).as("median_v"),
        min(col("__mad")).as("mad"),
        count(when(col("__dev") > lit(k.toDouble) * col("__mad"), 1))
          .as("n_outliers"))
  }

  /**
   * Event-time disorder audit — the measurement that SIZES a streaming
   * watermark (`StreamingOps`' `withWatermark` bounds): per entity, how
   * many events arrive after a later-timestamped event has already been
   * seen, and the worst such lateness. An event is late iff its event
   * time is below the running max event time over everything that
   * ARRIVED before it; `max_late_us` is the watermark that would have
   * admitted every event.
   *
   * The fixture's event_id order is perfectly time-sorted, so arrival
   * order is derived by a deterministic per-event network delay (the
   * q53/q88 injection pattern — same integer-hash jitter on both
   * engines): `arrival = ts + ((event_id mod 2³¹)·Mix mod 2³²) mod
   * maxDelayUs`.
   *
   * Spark shape: ONE window per entity partition (running max over
   * arrival order — no global sort), then ONE hash agg to per-entity
   * stats; everything integer micros end-to-end.
   */
  def disorderAudit(events: DataFrame, maxDelayUs: Long,
      userCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame = {
    require(maxDelayUs >= 1, s"maxDelayUs=$maxDelayUs must be >= 1")
    val mix = graft.functions.TextFunctions.Mix
    val two32 = graft.functions.TextFunctions.TwoPow32
    val fold = Sampling.IdFold
    val delay =
      expr(s"((($idCol % $fold) * $mix) % $two32) % $maxDelayUs")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col("__arrival").asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .select(col(userCol), col(idCol),
        expr(s"unix_micros($tsCol)").as("__ev_us"),
        (expr(s"unix_micros($tsCol)") + delay).as("__arrival"))
      .withColumn("__seen", max(col("__ev_us")).over(w))
      .withColumn("__late_us",
        when(col("__seen") > col("__ev_us"), col("__seen") - col("__ev_us")))
      .groupBy(col(userCol))
      .agg(count(lit(1)).as("n_events"),
        count(col("__late_us")).as("n_late"),
        coalesce(max(col("__late_us")), lit(0L)).as("max_late_us"))
  }

  /**
   * User lifecycle stages at a reference instant: per entity, first/
   * last activity and the classic three-way verdict — `new` (first
   * event within `windowDays` of the reference), `churned` (last event
   * more than `windowDays` before it), `active` otherwise — the
   * segmentation every growth/retention report starts from, pinned to
   * integer epoch-day arithmetic so the cut replays exactly.
   *
   * Spark shape: ONE hash aggregation per entity (min/max timestamps,
   * map-side partials), then a per-row CASE — the event table never
   * shuffles raw.
   */
  def lifecycleStages(events: DataFrame, reference: String,
      windowDays: Int = 7, userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    require(windowDays >= 1, s"windowDays=$windowDays must be >= 1")
    val refUs = expr(s"unix_micros(CAST('$reference' AS TIMESTAMP))")
    val winUs = windowDays * 86400L * 1000000L
    events.groupBy(col(userCol))
      .agg(min(col(tsCol)).as("first_seen"), max(col(tsCol)).as("last_seen"),
        count(lit(1)).as("n_events"))
      .select(col(userCol), col("first_seen"), col("last_seen"),
        col("n_events"),
        when(expr("unix_micros(first_seen)") >= refUs - winUs, lit("new"))
          .when(expr("unix_micros(last_seen)") < refUs - winUs, lit("churned"))
          .otherwise(lit("active")).as("stage"))
  }

  /**
   * Engagement cadence report: per-entity inter-event gap statistics —
   * gap count, rank-exact lower-median gap, max gap (the dormancy
   * ceiling), all in integer seconds — the input to churn definitions
   * ("inactive = silent for 3× their median gap") and session-gap
   * tuning, self-calibrated per entity like q74/q159. Entities with a
   * single event have no gaps and drop out.
   *
   * Spark shape: one lag window and one rank window over the same
   * (entity) partitioning — Spark reuses the Exchange, re-sorting
   * locally; then ONE per-entity aggregation. Integer-exact
   * throughout, so the report replays bit-identically.
   */
  def interEventGaps(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts", idCol: String = "event_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gaps = events
      .select(col(userCol), col(idCol), expr(s"unix_micros($tsCol)").as("__us"))
      .withColumn("__gap",
        expr(s"(__us - lag(__us, 1) over (partition by $userCol" +
          s" order by __us, $idCol)) div 1000000"))
      .filter(col("__gap").isNotNull)
    val rankW = Window.partitionBy(col(userCol))
      .orderBy(col("__gap").asc, col(idCol).asc)
    gaps
      .withColumn("__rn", row_number().over(rankW).cast("long"))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col(userCol))))
      .groupBy(col(userCol))
      .agg(count(lit(1)).as("n_gaps"),
        min(when(col("__rn") * 2 === col("__n") + pmod(col("__n"), lit(2L)),
          col("__gap"))).as("median_gap_s"),
        max(col("__gap")).as("max_gap_s"))
  }

  /**
   * Weekly trend report: events per Monday-aligned calendar week with
   * the week-over-week delta and relative change — the smallest
   * honest trend table (daily is too noisy, monthly too slow for
   * ingest monitoring). The relative change is one division of exact
   * integer counts; the first week's delta is against 0.
   *
   * Spark shape: ONE hash aggregation on the truncated week (map-side
   * partials; output bounded by the time span), then a lag window over
   * those few rows.
   */
  def weeklyTrend(events: DataFrame, tsCol: String = "ts"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val weekly = events
      .groupBy(date_trunc("week", col(tsCol)).as("week_start"))
      .agg(count(lit(1)).as("n_events"))
    val prev = lag(col("n_events"), 1).over(Window.orderBy(col("week_start")))
    weekly
      .withColumn("wow_delta", col("n_events") - coalesce(prev, lit(0L)))
      .withColumn("wow_pct", when(prev.isNull, lit(null).cast("double"))
        .otherwise((col("n_events") - prev).cast("double") /
          prev.cast("double")))
  }

  /**
   * Activity heatmap: event counts by (day-of-week, hour-of-day) with
   * each cell's share of the total — the ops-calendar view (when do
   * users actually show up) and the input to maintenance-window and
   * rate-limit schedules. Day 1 = Sunday (Spark's `dayofweek`
   * convention, mirrored explicitly in the oracle).
   *
   * Spark shape: ONE hash aggregation over the ≤ 168 cell keys
   * (map-side partials); the total folds out of the cell table
   * with a metadata-scale window, so the event table is scanned once.
   */
  def activityHeatmap(events: DataFrame, tsCol: String = "ts"): DataFrame = {
    val cells = events.select(dayofweek(col(tsCol)).cast("long").as("dow"),
      hour(col(tsCol)).cast("long").as("hour_of_day"))
    // total via a window over the ≤ 168 cell rows — one event-table scan
    val totalW = Window.partitionBy()
    cells.groupBy(col("dow"), col("hour_of_day"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("dow"), col("hour_of_day"), col("n_events"),
        (col("n_events").cast("double") /
          sum(col("n_events")).over(totalW).cast("double")).as("share"))
  }

  /**
   * Session-duration histogram: sessions from the shared
   * `session_window` sessionizer, durations bucketed into power-of-two
   * SECONDS bands (the q47 log-histogram trick — `length(bin(x))` is
   * floor(log2)+1, pure integer arithmetic) — the engagement-shape
   * report ("are sessions seconds or hours?") at a bounded output size
   * regardless of session count.
   *
   * Spark shape: the sessionizer's one (user, session) aggregation,
   * then ONE bounded hash aggregation on the bucket key (≤ 64 rows).
   */
  def sessionDurationHistogram(events: DataFrame,
      gap: String = "30 minutes"): DataFrame = {
    val sessions = graft.streaming.StreamingOps.sessionize(events, gap = gap)
    val durS = expr(
      "(unix_micros(session_end) - unix_micros(session_start)) div 1000000")
    sessions
      .select(durS.as("__dur"), col("n_events"))
      .withColumn("bucket", expr("length(bin(__dur))"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_sessions"),
        min(col("__dur")).as("min_dur_s"), max(col("__dur")).as("max_dur_s"),
        sum(col("n_events")).as("sum_events"))
  }

  /**
   * Exact sliding-window burst ceiling: per entity, the maximum number
   * of its events inside ANY `windowSeconds` sliding window — the
   * rate-limit / bot-detection number an aligned (tumbling) count
   * understates by up to 2× when a burst straddles a boundary. Exact
   * via a range-frame window: each event anchors a frame of its own
   * user's events in `[t, t + window)` (`rangeBetween` on the
   * microsecond key), and the per-user max of the frame counts is the
   * ceiling. Spark's range frame advances two sliding pointers over the
   * sorted partition, so the cost is one shuffle on the entity plus an
   * amortized-linear per-partition scan — m events packed into a single
   * window (precisely the bot case the operator exists to flag) cost
   * O(m log m) sort, not the m² join rows a banded self-join degenerates
   * to on that input.
   */
  def burstCeiling(events: DataFrame, windowSeconds: Int = 60,
      userCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame = {
    require(windowSeconds >= 1, s"windowSeconds=$windowSeconds must be >= 1")
    val winUs = windowSeconds * 1000000L
    val frame = Window.partitionBy(col("u")).orderBy(col("us"))
      .rangeBetween(Window.currentRow, winUs - 1L)
    events.select(col(userCol).as("u"), expr(s"unix_micros($tsCol)").as("us"))
      .withColumn("__w", count(lit(1)).over(frame))
      .groupBy(col("u").as(userCol))
      .agg(max(col("__w")).as("burst_max"))
  }

  /**
   * Temporal train/eval split audit: events before `cutoff` train, the
   * rest evaluate, and the report is per-entity — how many rows land on
   * each side and whether the entity STRADDLES the boundary. The
   * straddle set is the thing a forecasting/sequence pipeline must know
   * before claiming out-of-time evaluation: a user with history on both
   * sides leaks identity-level signal across the cut even though no
   * single event does (the temporal analogue of q111's cluster-leakage
   * contract — there the graph straddles, here the entity does).
   *
   * Spark shape: ONE hash aggregation with map-side partial conditional
   * counts — the event table never shuffles raw, output is one row per
   * entity. The cutoff compare is timestamp-vs-literal under the UTC
   * session contract, integer-exact on both engines.
   */
  /**
   * Windowed exact-duplicate suppression — the telemetry-dedup step of
   * an event ingest: within each epoch-aligned tumbling window, events
   * with identical (user, type, value) collapse to their FIRST
   * occurrence (min (ts, event_id) — deterministic, no tie race), with
   * the collapse multiplicity kept for the ingest report. The batch
   * twin of the streaming `flatMapGroupsWithState` dedup: same key,
   * same keep-first contract, replayable because the window is
   * epoch-aligned integer arithmetic, not session state.
   *
   * Spark shape: ONE aggregation on the (window, key) tuple with
   * map-side partials — the struct-min trick holds two values per group
   * regardless of duplicate multiplicity, and the partial collapse
   * before the exchange is what bounds the shuffle at telemetry scale.
   * Struct-typed min is not hash-aggregable, so Spark plans a
   * SortAggregate: the sorts are PER-PARTITION (pre-partial and
   * post-shuffle), never a global range sort — plan-pinned.
   */
  def eventDedupWindow(events: DataFrame,
      windowMinutes: Int = 5): DataFrame = {
    require(windowMinutes >= 1, s"windowMinutes=$windowMinutes must be >= 1")
    val winUs = windowMinutes * 60L * 1000000L
    val us = expr("unix_micros(ts)")
    val winStart = timestamp_micros(us - pmod(us, lit(winUs)))
    events.groupBy(col("user_id"), col("event_type"), col("value"),
        winStart.as("window_start"))
      .agg(min(struct(col("ts"), col("event_id"))).as("__f"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("event_type"), col("value"),
        col("window_start"), col("__f.event_id").as("kept_event_id"),
        col("n_events"))
  }

  /**
   * Corpus-level daily-volume anomaly report — the ingest-pipeline
   * heartbeat check ("did Tuesday's crawl partially fail / double-
   * deliver?"): per calendar day, the event count against the rank-
   * exact lower median and MAD of ALL daily counts, flagging days whose
   * absolute deviation exceeds k·MAD. The corpus-level sibling of
   * [[madOutliers]] (per-entity values) and [[activitySpikes]]
   * (per-entity hours) — self-calibrating, immune to mean-dragging by
   * the anomalous days themselves, and exact-integer end to end.
   *
   * Spark shape: ONE hash aggregation to per-day counts (output bounded
   * by the calendar span — ≤ 366 rows/year at ANY corpus scale), then
   * rank windows and the MAD join all over that bounded table. The
   * event table never shuffles raw.
   */
  def dailyVolumeAnomalies(events: DataFrame, k: Int = 3,
      tsCol: String = "ts"): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val daily = events
      .groupBy(date_trunc("day", col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n_events"))
    def lowerMedian(df: DataFrame, v: String, out: String): DataFrame = {
      val w = Window.orderBy(col(v).asc, col("day").asc)
      val all = Window.partitionBy()
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      df.withColumn("__rn", row_number().over(w))
        .withColumn("__n", count(lit(1)).over(all))
        .filter(col("__rn") === expr("(__n + 1) div 2"))
        .select(col(v).as(out))
    }
    val med = lowerMedian(daily, "n_events", "median_daily")
    val dev = daily.crossJoin(broadcast(med))
      .withColumn("deviation", abs(col("n_events") - col("median_daily")))
    val mad = lowerMedian(dev.select(col("day"), col("deviation")),
      "deviation", "mad")
    dev.crossJoin(broadcast(mad))
      .select(col("day"), col("n_events"), col("median_daily"), col("mad"),
        col("deviation"),
        (col("deviation") > lit(k.toLong) * col("mad")).as("is_anomaly"))
  }

  /**
   * Event-type audience overlap: for every unordered type pair, the
   * exact count of entities active in both and the Jaccard of their
   * audiences — the feature-adoption cross-sell map ("do purchasers
   * also search?") and the redundancy check before merging event
   * taxonomies. The inverted-index shape of q14 applied to (type,
   * entity) incidence: a shared entity costs one join row per type
   * pair it supports, never |entities|².
   *
   * Spark shape: events reduce to DISTINCT (type, entity) in one
   * map-side-partial aggregation (bounded by types × entities); the
   * self-equi-join on the entity key and all counts run over that
   * reduced table; output is bounded by |types|². One double division
   * per pair.
   */
  def typeAudienceOverlap(events: DataFrame,
      typeCol: String = "event_type",
      userCol: String = "user_id"): DataFrame = {
    val inc = graft.SparkUtil.trackCache(
      events.select(col(typeCol).as("t"), col(userCol).as("u")).distinct())
    val sizes = inc.groupBy(col("t")).agg(count(lit(1)).as("nu"))
    val shared = inc.as("x").join(inc.as("y"),
        col("x.u") === col("y.u") && col("x.t") < col("y.t"))
      .groupBy(col("x.t").as("type_a"), col("y.t").as("type_b"))
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(sizes.select(col("t").as("type_a"), col("nu").as("users_a")),
        Seq("type_a"))
      .join(sizes.select(col("t").as("type_b"), col("nu").as("users_b")),
        Seq("type_b"))
      .select(col("type_a"), col("type_b"), col("users_a"), col("users_b"),
        col("n_shared"),
        (col("n_shared").cast("double") /
          (col("users_a") + col("users_b") - col("n_shared")).cast("double"))
          .as("jaccard"))
  }

  /**
   * Activation-lag cohort report: per first-activity week (Monday-
   * aligned, the q187 convention), how many entities ever appeared, how
   * many came back for a second event, and the rank-exact lower-median
   * seconds between first and second event among those who did — the
   * "time to second visit" product metric, and for an ingest stream the
   * source-revisit cadence that sizes incremental-crawl scheduling.
   *
   * Spark shape: ONE rank window per entity partition extracts the
   * first two event times as a two-struct aggregation state (min and
   * conditional min — no collect, no full sort beyond the entity
   * partition); the per-user (cohort, lag) table is entity-bounded, and
   * the cohort median window runs over THAT. Integer micros → seconds
   * by integer division, exact end to end.
   */
  def activationLag(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts", idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    val firstTwo = events
      .select(col(userCol), col(tsCol), col(idCol))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= 2)
      .groupBy(col(userCol))
      .agg(min(when(col("__rn") === 1, col(tsCol))).as("__t1"),
        min(when(col("__rn") === 2, col(tsCol))).as("__t2"))
      .select(col(userCol),
        date_trunc("week", col("__t1")).as("cohort_week"),
        expr("(unix_micros(__t2) - unix_micros(__t1)) div 1000000")
          .as("__lag"))
    val totals = firstTwo.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("n_users"),
        count(col("__lag")).as("n_activated"))
    // median ranks ONLY over activated rows — ranking the full table
    // would interleave null-lag (single-event) users into the ranks
    val wm = Window.partitionBy(col("cohort_week"))
      .orderBy(col("__lag").asc, col(userCol).asc)
    val wc = Window.partitionBy(col("cohort_week"))
    val med = firstTwo.filter(col("__lag").isNotNull)
      .withColumn("__rn", row_number().over(wm))
      .withColumn("__na", count(lit(1)).over(wc))
      .filter(col("__rn") === expr("(__na + 1) div 2"))
      .select(col("cohort_week"), col("__lag").as("median_lag_s"))
    totals.join(med, Seq("cohort_week"), "left_outer")
      .select(col("cohort_week"), col("n_users"), col("n_activated"),
        col("median_lag_s"))
  }

  /**
   * DAU / trailing-WAU stickiness: per calendar day, distinct active
   * entities that day, distinct entities active in the trailing 7-day
   * window, and the DAU/WAU per-mille ratio — the engagement-frequency
   * dial every product and crawl-freshness report carries.
   *
   * Spark shape: events reduce to DISTINCT (entity, day) once
   * (map-side partials); each activity day then explodes into the <= 7
   * future window-days it supports (narrow `sequence` fan-out — the
   * q182 pigeonhole idea run forward), so the trailing-window distinct
   * is a plain (window-day, entity) distinct aggregation — an
   * EQUI-join shape, never a range self-join. The final equi-join with
   * the DAU table keeps exactly the observed days (fan-out days past
   * the span, or spanning a zero-event gap day, have no DAU row and
   * drop — the report is per ACTIVE day by contract).
   */
  def dauStickiness(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val act = graft.SparkUtil.trackCache(events
      .select(col(userCol).as("u"), date_trunc("day", col(tsCol)).as("d"))
      .distinct())
    val dau = act.groupBy(col("d")).agg(count(lit(1)).as("dau"))
    val win = act
      .select(col("u"), explode(expr(
        "sequence(d, d + interval 6 days, interval 1 day)")).as("d"))
      .distinct()
      .groupBy(col("d")).agg(count(lit(1)).as("wau7"))
    dau.join(win, Seq("d"))
      .select(col("d").as("day"), col("dau"), col("wau7"),
        expr("(dau * 1000) div wau7").as("stickiness_per_mille"))
  }

  /**
   * Semi-structured payload rollup: a JSON field extracted from the
   * event `props` column (`get_json_object` — codegen'd, no UDF) and
   * profiled per event type with exact counts and integer stats — the
   * first query anyone runs against a telemetry stream whose payload
   * schema is still soft. At 100 TB the same shape applies after
   * promoting hot fields to real columns with `from_json`; this is the
   * exploration step that decides WHICH fields to promote.
   *
   * Spark shape: one narrow projection (JSON path + cast) and ONE hash
   * aggregation on the type key with map-side partials; distincts are
   * bounded by the field's value cardinality.
   */
  def propsFieldStats(events: DataFrame, jsonPath: String = "$.k",
      typeCol: String = "event_type"): DataFrame =
    events
      .select(col(typeCol),
        get_json_object(col("props"), jsonPath).cast("long").as("__v"))
      .groupBy(col(typeCol))
      .agg(count(lit(1)).as("n_events"),
        count(col("__v")).as("n_with_field"),
        min(col("__v")).as("min_v"), max(col("__v")).as("max_v"),
        sum(col("__v")).as("sum_v"),
        countDistinct(col("__v")).as("n_distinct_v"))

  /**
   * Freshness SLA audit per stream: last event time, staleness against
   * a literal reference instant in integer minutes, and the SLA
   * verdict — the first data-quality gate every pipeline dashboard
   * shows ("is yesterday's partition actually there"), per event type
   * so one stalled producer can't hide behind the others. Reference
   * passed literally (the q196 convention) so the report replays
   * exactly.
   *
   * Spark shape: ONE hash aggregation on the type key (max + count,
   * map-side partials); the verdict is a per-row projection.
   */
  def freshnessAudit(events: DataFrame, reference: String,
      maxStalenessMinutes: Long = 120L, typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    events.groupBy(col(typeCol))
      .agg(max(col(tsCol)).as("last_ts"), count(lit(1)).as("n_events"))
      // integer division — Spark's double-div-then-cast truncates while
      // DuckDB's BIGINT cast rounds; `div` agrees everywhere
      .withColumn("staleness_minutes",
        expr(s"(unix_micros(CAST('$reference' AS TIMESTAMP))" +
          " - unix_micros(last_ts)) div 60000000"))
      .withColumn("fresh", col("staleness_minutes") <= maxStalenessMinutes)
  }

  /**
   * Active-day regularity per entity: days active, span days (first to
   * last activity inclusive), and the per-mille active-day share — the
   * habit-strength segmentation next to [[lifecycleStages]]' verdicts
   * (two users with 30 events differ enormously if one spread them
   * over 30 days and the other over 2).
   *
   * Spark shape: events reduce to DISTINCT (entity, day) once, then
   * ONE per-entity aggregation; span arithmetic is exact integer
   * epoch-day subtraction.
   */
  def activeDayRatio(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame =
    events
      .select(col(userCol),
        expr(s"unix_micros(date_trunc('day', $tsCol)) div 86400000000")
          .as("__d"))
      .distinct()
      .groupBy(col(userCol))
      .agg(count(lit(1)).as("active_days"),
        (max(col("__d")) - min(col("__d")) + 1L).as("span_days"))
      .withColumn("active_per_mille",
        expr("(active_days * 1000) div span_days"))

  /**
   * Weekly event-type mix drift: per (week, type) cell, observed vs
   * expected counts under the whole-period type mix, with the exact
   * chi-square contribution — which weeks' traffic composition moved,
   * and which type moved it (the q101 corpus-drift machinery pointed
   * at the time axis; a deploy that silently killed one event type
   * lights up as that type's row in that week). Expected-count and
   * contribution chains are the identical left-assoc double spellings
   * on both engines.
   *
   * Spark shape: events reduce to (week, type) cells in ONE map-side-
   * partial aggregation (output bounded by weeks × types); row/column
   * totals come from windows over that bounded table, never a second
   * scan.
   */
  def weeklyMixDrift(events: DataFrame, typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    val cells = events
      .groupBy(date_trunc("week", col(tsCol)).as("week_start"),
        col(typeCol))
      .agg(count(lit(1)).as("n"))
    val wWeek = Window.partitionBy(col("week_start"))
    val wType = Window.partitionBy(col(typeCol))
    val wAll = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cells
      .withColumn("__wt", sum(col("n")).over(wWeek))
      .withColumn("__tt", sum(col("n")).over(wType))
      .withColumn("__gt", sum(col("n")).over(wAll))
      .withColumn("expected",
        expr("CAST(__wt * __tt AS DOUBLE) / CAST(__gt AS DOUBLE)"))
      .select(col("week_start"), col(typeCol), col("n"), col("expected"),
        expr("(CAST(n AS DOUBLE) - expected) * (CAST(n AS DOUBLE) - expected)" +
          " / expected").as("chi2_contribution"))
  }

  /**
   * FIRST-touch attribution: each converting event takes the EARLIEST
   * qualifying touch in the preceding window (vs [[AsOfJoin]]-based
   * last-touch in q129 — marketing's other canonical model: last-touch
   * credits the closer, first-touch credits the discoverer; run both
   * and the difference IS the attribution-model sensitivity). Ties at
   * equal touch time break by (touch id asc) — deterministic via one
   * struct-min aggregation state, no window.
   *
   * Spark shape: type filters push to both scans, the window bound
   * shrinks the join to O(window history), and the pick is ONE
   * aggregation on the converting-event key whose state is a single
   * struct regardless of how many touches qualify.
   */
  def firstTouchAttribution(events: DataFrame,
      convertType: String = "purchase",
      touchTypes: Seq[String] = Seq("click", "view"),
      windowMinutes: Long = 60L, userCol: String = "user_id",
      typeCol: String = "event_type", tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame = {
    val conv = events.filter(col(typeCol) === convertType)
      .select(col(idCol), col(tsCol), col(userCol))
    val touches = events.filter(col(typeCol).isin(touchTypes: _*))
      .select(col(userCol).as("__u"), col(tsCol).as("__tts"),
        col(idCol).as("__tid"), col(typeCol).as("__tty"))
    conv.join(touches,
        col(userCol) === col("__u") && col("__tts") <= col(tsCol) &&
          col("__tts") >= col(tsCol) -
            expr(s"INTERVAL $windowMinutes MINUTES"),
        "left_outer")
      .groupBy(col(idCol), col(tsCol), col(userCol))
      .agg(min(struct(col("__tts").as("t"), col("__tid").as("i"),
        col("__tty").as("y"))).as("__f"))
      .select(col(idCol), col(tsCol), col(userCol),
        col("__f.i").as("touch_id"), col("__f.y").as("touch_type"),
        col("__f.t").as("touch_ts"))
  }

  /**
   * Inter-event gap histogram in power-of-two second bands — the
   * corpus-level cadence distribution behind session-gap tuning (the
   * bounded-output rollup of [[interEventGaps]]' per-entity medians):
   * the valley between the intra-session band mass and the
   * between-visit mass IS the right session gap. Zero-second gaps
   * (same-timestamp events) band at 0.
   *
   * Spark shape: one lag window per entity partition, ONE bounded
   * (≤ 64-row) band aggregation.
   */
  def gapHistogram(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts", idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    events
      .select(col(userCol), col(idCol),
        expr(s"unix_micros($tsCol)").as("__us"))
      .withColumn("__gap", expr(
        s"(__us - lag(__us, 1) over (partition by $userCol" +
          s" order by __us, $idCol)) div 1000000"))
      .filter(col("__gap").isNotNull)
      .select(when(col("__gap") === 0, 0)
        .otherwise(length(bin(col("__gap"))).cast("int")).as("band"),
        col("__gap"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_gaps"), min(col("__gap")).as("min_gap_s"),
        max(col("__gap")).as("max_gap_s"))
  }

  /**
   * Transition determinism per state: for each from-type, the total
   * outgoing transitions, the most likely next type, and its exact
   * per-mille share — the predictability summary of the q75 Markov
   * edge list (a state whose top edge carries 900‰ is a scripted flow
   * or a bot; a flat distribution is organic exploration). Tie-break
   * for the argmax is (count desc, to-type desc) — deterministic via
   * one struct-max aggregation state, no window.
   *
   * Spark shape: the q75 per-entity lead window, ONE (from, to) hash
   * aggregation on the tiny type² space, ONE from-key fold with a
   * one-struct state, a scalar division.
   */
  def transitionDeterminism(events: DataFrame,
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts", idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    val edges = events
      .select(col(userCol), col(typeCol).as("from_type"),
        lead(col(typeCol), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("__c"))
    edges.groupBy(col("from_type"))
      .agg(sum(col("__c")).as("n_transitions"),
        max(struct(col("__c").as("c"), col("to_type").as("t"))).as("__b"))
      .select(col("from_type"), col("n_transitions"),
        col("__b.t").as("top_to"), col("__b.c").as("top_count"),
        expr("(__b.c * 1000) div n_transitions").as("det_per_mille"))
  }

  /**
   * Session conversion by day: gap-based sessions (the q23
   * `session_window` semantics) flagged for containing a converting
   * event type, rolled up to per-day session counts and an exact
   * per-mille conversion rate — the product funnel's denominator done
   * right (per SESSION, not per event or per user). Runs under
   * Structured Streaming unchanged (session windows + watermark).
   *
   * Spark shape: ONE (session_window, user) aggregation carrying both
   * the event count and the conversion flag (max of an indicator — no
   * second pass over events), then ONE day-key rollup of the bounded
   * session table.
   */
  def sessionConversion(events: DataFrame, convertType: String = "purchase",
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type", gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark(tsCol, watermark)
      else events
    withWm
      .groupBy(session_window(col(tsCol), gap).as("sw"), col(userCol))
      .agg(count(lit(1)).as("n_events"),
        max(when(col(typeCol) === convertType, 1L).otherwise(0L))
          .as("__conv"))
      .groupBy(date_trunc("day", col("sw.start")).as("day"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("__conv")).as("n_converting"))
      .withColumn("conversion_per_mille",
        expr("(n_converting * 1000) div n_sessions"))
  }

  /**
   * Diurnal periodicity probe: the exact Pearson correlation between
   * the corpus-level hourly event counts and the same series shifted
   * by `lagHours` (24 = same-hour-tomorrow) — high lag-24
   * autocorrelation means traffic is diurnal (schedule maintenance
   * windows and rate limits by hour), near-zero means arrivals are
   * pattern-free. Pairs where either hour is unobserved drop — the
   * statistic is over observed-hour pairs by contract. Moment sums are
   * exact integers (hour counts ARE integers); only the final q124
   * combination chain is floating point, mirrored verbatim in SQL.
   *
   * Spark shape: events reduce to ≤ |span-hours| hourly rows in ONE
   * map-side-partial aggregation; the lag join and the moment fold run
   * over that calendar-bounded table (AQE broadcasts it). At 10⁹+
   * rows/hour the integer products approach 2^63 and the q124 decimal
   * regime applies.
   */
  def hourlyAutocorrelation(events: DataFrame, lagHours: Int = 24,
      tsCol: String = "ts"): DataFrame = {
    require(lagHours >= 1, s"lagHours=$lagHours must be >= 1")
    val hourly = events
      .groupBy(expr(s"unix_micros(date_trunc('hour', $tsCol))" +
        " div 3600000000").as("t"))
      .agg(count(lit(1)).as("c"))
    hourly.as("a")
      .join(hourly.as("b"), col("b.t") === col("a.t") + lagHours)
      .select(col("a.c").as("x"), col("b.c").as("y"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .select(lit(lagHours).as("lag_hours"), col("n").as("n_pairs"),
        (expr("CAST(n * sxy - sx * sy AS DOUBLE)") /
          (sqrt(expr("CAST(n * sxx - sx * sx AS DOUBLE)")) *
            sqrt(expr("CAST(n * syy - sy * sy AS DOUBLE)"))))
          .as("autocorr"))
  }

  /**
   * Per-entity burstiness via the Fano factor (index of dispersion,
   * Fano 1947): variance/mean of the entity's per-hour event counts
   * over its ACTIVE hours — ≈1 is Poisson-like arrival, >1 bursty
   * (bot bursts, retry storms), <1 metronomic (schedulers, health
   * checks). The distribution-shape companion to [[burstCeiling]]'s
   * worst-window maximum and [[interEventGaps]]' gap quantiles.
   * Absent hours are NOT zero-filled — the statistic describes
   * intensity while active, by contract.
   *
   * Spark shape: ONE (entity, hour) aggregation with map-side partials
   * (events never shuffle raw), ONE per-entity fold of exact integer
   * moment sums; mean/variance/Fano are final double chains mirrored
   * verbatim in SQL. Entities with a single active hour have no
   * variance and report Fano 0.
   */
  def fanoBurstiness(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame =
    events
      .groupBy(col(userCol),
        date_trunc("hour", col(tsCol)).as("__h"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col(userCol))
      .agg(count(lit(1)).as("n_hours"), sum(col("c")).as("__s"),
        sum(col("c") * col("c")).as("__ss"))
      .select(col(userCol), col("n_hours"),
        (col("__s").cast("double") / col("n_hours").cast("double"))
          .as("mean_hourly"),
        (expr("CAST(n_hours * __ss - __s * __s AS DOUBLE)") /
          expr("CAST(n_hours AS DOUBLE) * CAST(n_hours AS DOUBLE)") /
          (col("__s").cast("double") / col("n_hours").cast("double")))
          .as("fano"))

  def timeSplitAudit(events: DataFrame, cutoff: String,
      userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    val cut = lit(cutoff).cast("timestamp")
    events.groupBy(col(userCol))
      .agg(
        sum(when(col(tsCol) < cut, 1L).otherwise(0L)).as("n_train"),
        sum(when(col(tsCol) >= cut, 1L).otherwise(0L)).as("n_eval"))
      .select(col(userCol), col("n_train"), col("n_eval"),
        (col("n_train") > 0 && col("n_eval") > 0).as("straddles"))
  }
}
