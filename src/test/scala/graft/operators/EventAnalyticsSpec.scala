package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{col, concat, lit}
import org.apache.spark.sql.types._

import graft.SparkSpec

/**
 * Tests for event-stream analytics on hand-built fixtures with known
 * hourly counts and transition structure.
 */
class EventAnalyticsSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false)))

  private def t(s: String) = Timestamp.valueOf(s)

  private def events(rows: (Long, String, Long, String)*) =
    spark.createDataFrame(rows.map { case (id, ts, u, ty) =>
      Row(id, t(ts), u, ty)
    }.asJava, schema)

  test("activitySpikes flags only hours at >= factor x the user's median") {
    // user 1: hourly counts 1, 1, 4 -> median 1; the 4-event hour spikes
    // user 2: hourly counts 2, 2 -> median 2; nothing reaches 6
    val df = events(
      (1L, "2024-01-01 10:00:00", 1L, "a"),
      (2L, "2024-01-01 11:00:00", 1L, "a"),
      (3L, "2024-01-01 12:00:00", 1L, "a"),
      (4L, "2024-01-01 12:10:00", 1L, "a"),
      (5L, "2024-01-01 12:20:00", 1L, "a"),
      (6L, "2024-01-01 12:30:00", 1L, "a"),
      (7L, "2024-01-01 10:00:00", 2L, "a"),
      (8L, "2024-01-01 10:30:00", 2L, "a"),
      (9L, "2024-01-01 11:00:00", 2L, "a"),
      (10L, "2024-01-01 11:30:00", 2L, "a"))
    val out = EventAnalytics.activitySpikes(df).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString) ->
        ((r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(out((1L, "2024-01-01 12:00:00.0")) == ((4L, 1.0, true)))
    assert(out((1L, "2024-01-01 10:00:00.0")) == ((1L, 1.0, false)))
    assert(out((2L, "2024-01-01 10:00:00.0")) == ((2L, 2.0, false)))
    assert(out.values.count(_._3) == 1)
  }

  test("eventTransitions counts per-user time-ordered pairs with a total-order cut") {
    // user 1: a->b->a->b (transitions ab, ba, ab); user 2: b->c (bc)
    val df = events(
      (1L, "2024-01-01 10:00:00", 1L, "a"),
      (2L, "2024-01-01 10:01:00", 1L, "b"),
      (3L, "2024-01-01 10:02:00", 1L, "a"),
      (4L, "2024-01-01 10:03:00", 1L, "b"),
      (5L, "2024-01-01 10:00:00", 2L, "b"),
      (6L, "2024-01-01 10:01:00", 2L, "c"))
    val out = EventAnalytics.eventTransitions(df, k = 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // (a,b):2 wins; then (b,a):1 beats (b,c):1 on the to_type tiebreak
    assert(out.toSeq == Seq(("a", "b", 2L), ("b", "a", 1L)))
  }

  test("eventTransitions breaks same-timestamp ties by event_id") {
    val df = events(
      (2L, "2024-01-01 10:00:00", 1L, "x"),
      (1L, "2024-01-01 10:00:00", 1L, "y"),
      (3L, "2024-01-01 10:01:00", 1L, "z"))
    val out = EventAnalytics.eventTransitions(df, k = 10).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // order is (ts, event_id): y (id 1) -> x (id 2) -> z
    assert(out == Set(("y", "x"), ("x", "z")))
  }

  test("funnel: greedy first-match with strict order and gap window") {
    val df = events(
      // user 1 completes a -> b -> c inside the window
      (1L, "2024-01-01 10:00:00", 1L, "a"),
      (2L, "2024-01-01 10:20:00", 1L, "b"),
      (3L, "2024-01-01 10:40:00", 1L, "c"),
      // user 2: b precedes its a anchor, so stage 2 never fires
      (4L, "2024-01-01 09:00:00", 2L, "b"),
      (5L, "2024-01-01 10:00:00", 2L, "a"),
      // user 3: b arrives past the 60-minute gap
      (6L, "2024-01-01 10:00:00", 3L, "a"),
      (7L, "2024-01-01 11:30:00", 3L, "b"),
      // user 4: anchor is the EARLIEST a (greedy), so the 10:30 b that
      // only qualifies against the 10:15 a is still within 60min of 10:00
      (8L, "2024-01-01 10:00:00", 4L, "a"),
      (9L, "2024-01-01 10:15:00", 4L, "a"),
      (10L, "2024-01-01 10:30:00", 4L, "b"))
    val out = EventAnalytics.funnel(df, Seq("a", "b", "c"), maxGapMinutes = 60)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out == Map("a" -> 4L, "b" -> 2L, "c" -> 1L))
  }

  test("funnel stage joins stay on the entity key (no cartesian)") {
    val d = graft.Tables.loadEvents(spark, sf())
    val plan = EventAnalytics.funnel(d, Seq("signup", "view", "click"),
      maxGapMinutes = 1440).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"), s"expected equi-joins:\n$plan")
  }

  test("retentionCohorts: min-week cohorts, week periods, period-0 base rates") {
    // cohort 2024-01-01 (Mon): users 1,2 active wk0; user 1 also wk1, wk2
    // cohort 2024-01-08: user 3 active wk1 only (its own period 0)
    val df = events(
      (1L, "2024-01-02 10:00:00", 1L, "a"),
      (2L, "2024-01-03 10:00:00", 2L, "a"),
      (3L, "2024-01-09 10:00:00", 1L, "a"),
      (4L, "2024-01-16 10:00:00", 1L, "a"),
      (5L, "2024-01-09 12:00:00", 3L, "a"),
      // duplicate activity in the same week: still one (user, week) row
      (6L, "2024-01-09 13:00:00", 3L, "a"))
    val out = EventAnalytics.retentionCohorts(df).collect()
      .map(r => (r.getTimestamp(0).toString, r.getInt(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out(("2024-01-01 00:00:00.0", 0)) == ((2L, 1.0)))
    assert(out(("2024-01-01 00:00:00.0", 1)) == ((1L, 0.5)))
    assert(out(("2024-01-01 00:00:00.0", 2)) == ((1L, 0.5)))
    assert(out(("2024-01-08 00:00:00.0", 0)) == ((1L, 1.0)))
    assert(out.size == 4)
  }

  test("funnel on the real event stream: counts decline monotonically from stage 0") {
    val d = graft.Tables.loadEvents(spark, sf("sf0.01"))
    val out = EventAnalytics.funnel(d,
      Seq("signup", "view", "click", "purchase"), maxGapMinutes = 1440)
      .collect().sortBy(_.getInt(1)).map(_.getLong(2))
    assert(out.length == 4)
    assert(out.zip(out.tail).forall { case (a, b) => b <= a },
      s"funnel must be non-increasing: ${out.toSeq}")
    assert(out.head > 0 && out.last < out.head,
      s"fixture funnel must discriminate: ${out.toSeq}")
  }

  test("retention on the real stream: period 0 rates are 1.0, all rates in (0, 1]") {
    val d = graft.Tables.loadEvents(spark, sf("sf0.01"))
    val rows = EventAnalytics.retentionCohorts(d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p, rate) = (r.getInt(1), r.getDouble(3))
      assert(rate > 0.0 && rate <= 1.0, s"rate out of range: $r")
      if (p == 0) assert(rate == 1.0, s"period-0 rate must be 1.0: $r")
    }
  }

  test("coEngagement counts co-engaging users per item pair, capped per user") {
    import org.apache.spark.sql.functions.col
    val df = events(
      (1L, "2024-01-01 10:00:00", 1L, "x"),
      (2L, "2024-01-01 10:01:00", 1L, "y"),
      (3L, "2024-01-01 10:02:00", 1L, "z"),
      (4L, "2024-01-01 11:00:00", 2L, "x"),
      (5L, "2024-01-01 11:01:00", 2L, "y"),
      // duplicate engagement: still ONE (x,y) edge for user 2
      (6L, "2024-01-01 11:02:00", 2L, "x"))
    val out = EventAnalytics.coEngagement(df, col("event_type"), k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(("x", "y", 2L), ("x", "z", 1L), ("y", "z", 1L)))
  }

  test("coEngagement cap bounds a hot user's pair fan-out deterministically") {
    import org.apache.spark.sql.functions.col
    // user 1 engages items a,b,c,d in that order; cap 2 keeps {a,b} only
    val df = events(
      (1L, "2024-01-01 10:00:00", 1L, "a"),
      (2L, "2024-01-01 10:01:00", 1L, "b"),
      (3L, "2024-01-01 10:02:00", 1L, "c"),
      (4L, "2024-01-01 10:03:00", 1L, "d"))
    val out = EventAnalytics.coEngagement(df, col("event_type"), k = 10,
      maxItemsPerUser = 2).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(out.toSeq == Seq(("a", "b")))
  }

  test("sessionPaths: gap splits sessions, paths truncate, top-k total order") {
    val df = events(
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (2L, "2024-01-01 10:05:00", 1L, "click"),
      (3L, "2024-01-01 12:00:00", 1L, "view"),   // new session (gap > 30m)
      (4L, "2024-01-01 12:01:00", 1L, "purchase"),
      (5L, "2024-01-01 09:00:00", 2L, "view"),
      (6L, "2024-01-01 09:10:00", 2L, "click"))
    val out = EventAnalytics.sessionPaths(df, gapMinutes = 30, pathLen = 2,
        topK = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(out == Seq("view>click" -> 2L, "view>purchase" -> 1L))
  }

  test("sessionPaths truncates to pathLen even inside one long session") {
    val df = events((1L, "2024-01-01 10:00:00", 1L, "a"),
      (2L, "2024-01-01 10:01:00", 1L, "b"),
      (3L, "2024-01-01 10:02:00", 1L, "c"))
    val out = EventAnalytics.sessionPaths(df, gapMinutes = 30, pathLen = 2,
      topK = 5).collect().map(r => r.getString(0)).toSeq
    assert(out == Seq("a>b"))
  }

  test("madOutliers: exact lower medians and k·MAD verdicts on a hand fixture") {
    val spark0 = spark
    import spark0.implicits._
    // user 1 values: 1,2,3,4,100 -> lower median 3; devs 2,1,0,1,97 ->
    // sorted 0,1,1,2,97 -> MAD 1; outliers: dev > 3 -> only 97
    val df = Seq((1L, 1L, 1.0), (2L, 1L, 2.0), (3L, 1L, 3.0),
        (4L, 1L, 4.0), (5L, 1L, 100.0), (6L, 2L, 7.0))
      .toDF("event_id", "user_id", "value")
    val out = EventAnalytics.madOutliers(df, k = 3)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))))
      .toMap
    assert(out(1L) == ((5L, 3.0, 1.0, 1L)))
    // single-event user: median = value, MAD 0, no outliers (0 > 0 false)
    assert(out(2L) == ((1L, 7.0, 0.0, 0L)))
  }

  test("disorderAudit counts late arrivals against the running event-time max") {
    val events = graft.Tables.loadEvents(spark, sf("sf0.01"))
    val out = EventAnalytics.disorderAudit(events, maxDelayUs = 600000000L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    assert(out.map(_._2).sum == events.count())
    out.foreach { case (_, n, nLate, maxLate) =>
      assert(nLate < n) // first arrival per user can never be late
      // lateness is bounded by the injected delay ceiling: an event can
      // only be beaten by an event-time at most maxDelayUs newer that
      // arrived earlier
      assert(maxLate >= 0L && maxLate < 600000000L)
      assert((nLate == 0L) == (maxLate == 0L))
    }
    // the injected jitter must actually create disorder somewhere
    assert(out.map(_._3).sum > 0L)
  }

  test("disorderAudit on an already-ordered stream reports zero lateness") {
    val events = graft.Tables.loadEvents(spark, sf("sf0.01"))
    // delay ceiling 1 us -> delay is identically 0 -> arrival == event time
    val out = EventAnalytics.disorderAudit(events, maxDelayUs = 1L).collect()
    out.foreach { r =>
      assert(r.getLong(2) == 0L && r.getLong(3) == 0L)
    }
  }

  test("dailyVolumeAnomalies: median/MAD over daily counts, MAD-zero edge") {
    val spark0 = spark
    import spark0.implicits._
    // 4 days of 2 events, one day of 6: median 2, deviations {0,0,0,0,4},
    // MAD 0 -> any positive deviation is an anomaly
    val rows = (1 to 4).flatMap(d => Seq.fill(2)(s"2024-03-0$d 10:00:00")) ++
      Seq.fill(6)("2024-03-05 10:00:00")
    val events = rows.toDF("s").select(col("s").cast("timestamp").as("ts"))
    val out = EventAnalytics.dailyVolumeAnomalies(events).collect()
      .map(r => (r.getTimestamp(0).toString.take(10),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(5))))
      .toMap
    assert(out("2024-03-01") == ((2L, 2L, 0L, false)))
    assert(out("2024-03-05") == ((6L, 2L, 0L, true)))
  }

  test("typeAudienceOverlap: exact shared counts and audience Jaccard") {
    val spark0 = spark
    import spark0.implicits._
    val events = Seq(("a", 1L), ("a", 2L), ("a", 2L), ("b", 2L), ("b", 3L))
      .toDF("event_type", "user_id")
    val out = EventAnalytics.typeAudienceOverlap(events).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    assert(out.keySet == Set(("a", "b")))
    val (ua, ub, sh, j) = out(("a", "b"))
    assert(ua == 2L && ub == 2L && sh == 1L)
    assert(math.abs(j - 1.0 / 3.0) < 1e-15)
    graft.SparkUtil.unpersistTrackedCaches()
  }

  test("activationLag: single-event users counted but never ranked into the median") {
    val spark0 = spark
    import spark0.implicits._
    val events = Seq(
      (1L, 10L, "2024-03-04 00:00:00", "2024-03-04 00:00:10"), // lag 10
      (2L, 20L, "2024-03-05 00:00:00", "2024-03-05 00:05:00"), // lag 300
      (3L, 30L, "2024-03-06 00:00:00", null)                   // single event
    ).flatMap { case (u, id, t1, t2) =>
      Seq((id, u, t1)) ++ Option(t2).map(t => (id + 1L, u, t))
    }.toDF("event_id", "user_id", "s")
      .select(col("event_id"), col("user_id"),
        col("s").cast("timestamp").as("ts"))
    val out = EventAnalytics.activationLag(events).collect()
    assert(out.length == 1) // all first-events fall in the same Monday week
    val r = out.head
    assert(r.getLong(1) == 3L && r.getLong(2) == 2L && r.getLong(3) == 10L)
  }

  test("dauStickiness: forward fan-out equals the trailing-window definition") {
    val spark0 = spark
    import spark0.implicits._
    // u1 active d1+d3, u2 d3, u3 d1: DAU d1=2 d3=2; trailing-7 d1={u1,u3},
    // d3={u1,u2,u3} -> stickiness 1000 and 666
    val events = Seq((1L, "2024-03-01"), (1L, "2024-03-03"),
        (2L, "2024-03-03"), (3L, "2024-03-01"))
      .toDF("user_id", "s")
      .select(col("user_id"), col("s").cast("timestamp").as("ts"))
    val out = EventAnalytics.dauStickiness(events).collect()
      .map(r => r.getTimestamp(0).toString.take(10) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map("2024-03-01" -> ((2L, 2L, 1000L)),
      "2024-03-03" -> ((2L, 3L, 666L))))
    graft.SparkUtil.unpersistTrackedCaches()
  }

  test("freshnessAudit: integer-minute staleness, both verdicts") {
    val df = events(
      (1L, "2024-01-01 10:00:00", 1L, "fresh_type"),
      (2L, "2024-01-01 06:30:00", 1L, "stale_type"))
    val out = EventAnalytics.freshnessAudit(df,
        reference = "2024-01-01 11:00:00").collect()
      .map(r => r.getString(0) -> ((r.getLong(3), r.getBoolean(4)))).toMap
    assert(out("fresh_type") == ((60L, true)))
    assert(out("stale_type") == ((270L, false)))
  }

  test("activeDayRatio: distinct days over inclusive span") {
    val df = events(
      (1L, "2024-01-01 10:00:00", 1L, "a"),
      (2L, "2024-01-01 11:00:00", 1L, "a"), // same day: still 1 active day
      (3L, "2024-01-05 10:00:00", 1L, "a"), // span 5 days, 2 active
      (4L, "2024-01-03 10:00:00", 2L, "a")) // singleton: span 1
    val out = EventAnalytics.activeDayRatio(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(out(1L) == ((2L, 5L, 400L)))
    assert(out(2L) == ((1L, 1L, 1000L)))
  }

  test("weeklyMixDrift: uniform mix contributes zero; totals conserved") {
    // two weeks, identical type mix -> expected == observed everywhere
    val df = events(
      (1L, "2024-01-02 10:00:00", 1L, "a"), (2L, "2024-01-03 10:00:00", 1L, "b"),
      (3L, "2024-01-09 10:00:00", 1L, "a"), (4L, "2024-01-10 10:00:00", 1L, "b"))
    val out = EventAnalytics.weeklyMixDrift(df).collect()
    assert(out.length == 4)
    out.foreach { r =>
      assert(r.getDouble(3) == 1.0 && r.getDouble(4) == 0.0)
    }
  }

  test("firstTouchAttribution picks the EARLIEST window touch; last-touch the latest") {
    val df = events(
      (1L, "2024-01-01 10:00:00", 1L, "click"),
      (2L, "2024-01-01 10:30:00", 1L, "view"),
      (3L, "2024-01-01 10:45:00", 1L, "purchase"),
      (4L, "2024-01-01 08:00:00", 2L, "click"), // outside the window
      (5L, "2024-01-01 10:00:00", 2L, "purchase"))
    val out = EventAnalytics.firstTouchAttribution(df).collect()
      .map(r => r.getLong(0) -> Option(r.getString(4))).toMap
    assert(out(3L) == Some("click")) // first touch, not the closer view
    assert(out(5L) == None)          // stale touch never credited
  }

  test("gapHistogram: log2 second bands with the zero-gap band") {
    val df = events(
      (1L, "2024-01-01 10:00:00", 1L, "a"),
      (2L, "2024-01-01 10:00:00", 1L, "a"),  // 0 s -> band 0
      (3L, "2024-01-01 10:00:03", 1L, "a"),  // 3 s -> band 2
      (4L, "2024-01-01 10:00:11", 1L, "a"))  // 8 s -> band 4
    val out = EventAnalytics.gapHistogram(df).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out == Map(0 -> ((1L, 0L, 0L)), 2 -> ((1L, 3L, 3L)),
      4 -> ((1L, 8L, 8L))))
  }

  test("transitionDeterminism: top next-type share with struct-max ties") {
    val spark0 = spark
    import spark0.implicits._
    // user 1: a->b, b->a, a->b ; user 2: a->c
    val events = Seq(
      (1L, 1L, "a", "10:00:00"), (2L, 1L, "b", "10:01:00"),
      (3L, 1L, "a", "10:02:00"), (4L, 1L, "b", "10:03:00"),
      (5L, 2L, "a", "10:00:00"), (6L, 2L, "c", "10:01:00"))
      .toDF("event_id", "user_id", "event_type", "hm")
      .select(col("event_id"), col("user_id"), col("event_type"),
        concat(lit("2024-03-01 "), col("hm")).cast("timestamp").as("ts"))
    val out = EventAnalytics.transitionDeterminism(events).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(out("a") == ((3L, "b", 2L, 666L))) // a->b twice, a->c once
    assert(out("b") == ((1L, "a", 1L, 1000L)))
  }

  test("sessionConversion: per-session flag, gap split, exact day rollup") {
    val spark0 = spark
    import spark0.implicits._
    val events = Seq(
      (1L, "view", "2024-03-01 10:00:00"),
      (1L, "purchase", "2024-03-01 10:10:00"), // session 1: converts
      (1L, "view", "2024-03-01 12:00:00"),     // > 30 min later: session 2
      (2L, "view", "2024-03-01 11:00:00"))     // session 3: no purchase
      .toDF("user_id", "event_type", "s")
      .select(col("user_id"), col("event_type"),
        col("s").cast("timestamp").as("ts"))
    val out = EventAnalytics.sessionConversion(events).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(1) == 3L && r.getLong(2) == 1L && r.getLong(3) == 333L)
  }

  test("hourlyAutocorrelation: perfectly periodic counts correlate to 1.0") {
    val spark0 = spark
    import spark0.implicits._
    // hourly counts 1,3,1,3,1,3 with lag 2 -> every pair is (1,1)/(3,3)
    val rows = (0 until 6).flatMap { h =>
      val n = if (h % 2 == 0) 1 else 3
      Seq.fill(n)(s"2024-03-01 0$h:10:00")
    }
    val events = rows.toDF("s").select(col("s").cast("timestamp").as("ts"))
    val out = EventAnalytics.hourlyAutocorrelation(events, lagHours = 2)
      .collect().head
    assert(out.getInt(0) == 2 && out.getLong(1) == 4L)
    assert(out.getDouble(2) == 1.0)
  }

  test("fanoBurstiness: exact dispersion with the single-hour zero edge") {
    val spark0 = spark
    import spark0.implicits._
    val events = Seq(
      (1L, "2024-03-01 10:00:00"), (1L, "2024-03-01 10:30:00"),
      (1L, "2024-03-01 11:00:00"), (1L, "2024-03-01 11:30:00"), // [2,2] -> 0
      (2L, "2024-03-01 10:00:00"),
      (2L, "2024-03-01 11:00:00"), (2L, "2024-03-01 11:20:00"),
      (2L, "2024-03-01 11:40:00"),                              // [1,3] -> 0.5
      (3L, "2024-03-01 10:00:00"))                              // single hour
      .toDF("user_id", "s")
      .select(col("user_id"), col("s").cast("timestamp").as("ts"))
    val out = EventAnalytics.fanoBurstiness(events).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    assert(out(1L) == ((2L, 2.0, 0.0)))
    assert(out(2L) == ((2L, 2.0, 0.5)))
    assert(out(3L) == ((1L, 1.0, 0.0)))
  }

  test("propsFieldStats: JSON field extraction with missing-field rows") {
    val spark0 = spark
    import spark0.implicits._
    val events = Seq(("a", """{"k": 5}"""), ("a", """{"k": 7}"""),
        ("a", """{"x": 1}"""), ("b", """{"k": 5}"""))
      .toDF("event_type", "props")
    val out = EventAnalytics.propsFieldStats(events).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(out == Map("a" -> ((3L, 2L, 5L, 7L, 12L, 2L)),
      "b" -> ((1L, 1L, 5L, 5L, 5L, 1L))))
  }
}
