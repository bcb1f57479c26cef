package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Interval-join semantics: bounds inclusive on both ends, key must match,
 * rows multiply (unlike AsOfJoin's latest-only pick), and the plan keeps
 * the equi-key (hash join, not a cross product).
 */
class IntervalJoinSpec extends SparkSpec {

  private def ts(sec: Long) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))

  test("inclusive bounds, key match, row multiplication") {
    val spark0 = spark
    import spark0.implicits._
    val left = Seq((1L, ts(1000)), (2L, ts(1000))).toDF("k", "lt")
    val right = Seq(
      (1L, ts(1000), "at"), (1L, ts(940), "edge"), (1L, ts(939), "before"),
      (1L, ts(1001), "after"), (9L, ts(1000), "wrong_key"))
      .toDF("rk", "rt", "tag")
    val out = IntervalJoin(left, right, "k", "rk", "lt", "rt", lookback = "1 minute")
      .select("k", "tag").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((1L, "at"), (1L, "edge"))) // both ends inclusive; rest excluded
  }

  test("declared q36 is non-vacuous: the self-lookback matches real rows") {
    // Round-1 regression guard: the original q36 joined events (Jan 2024)
    // against orders (1995-2001) — zero overlap, so the oracle verified
    // 0 == 0. The self-lookback shape must keep producing matches (every
    // event matches at least itself).
    val out = graft.SparkEntry.queries("q36_interval_join")(spark, sf())
    val events = graft.Tables.loadEvents(spark, sf())
    val n = out.count()
    assert(n >= events.count()) // self-match plus real prior-event matches
    // spot-check semantics: prior_ts within (ts - 7 days, ts] for all rows
    val bad = out.filter(
      col("prior_ts") > col("ts") ||
        col("prior_ts") < col("ts") - expr("INTERVAL 7 DAYS")).count()
    assert(bad == 0)
  }

  test("plans as an equi hash join with range filter, not a cross product") {
    val spark0 = spark
    import spark0.implicits._
    val left = Seq((1L, ts(1000))).toDF("k", "lt")
    val right = Seq((1L, ts(990), "x")).toDF("rk", "rt", "tag")
    val p = IntervalJoin(left, right, "k", "rk", "lt", "rt")
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("bucketed == plain on a boundary-exact fixture and the real events table") {
    val spark0 = spark
    import spark0.implicits._
    // L = 60 s buckets; rows sit exactly ON bucket edges (960, 1020) and
    // exactly at the lookback edge (T-L) to pin the inclusive bounds
    // across the bucket split
    val left = Seq((1L, ts(1000)), (1L, ts(1020)), (2L, ts(960))).toDF("k", "lt")
    val right = Seq(
      (1L, ts(940), "edge"), (1L, ts(941), "in"), (1L, ts(1000), "at"),
      (1L, ts(960), "bucket_edge"), (1L, ts(1020), "later_at"),
      (2L, ts(900), "k2_edge"), (2L, ts(961), "k2_after"))
      .toDF("rk", "rt", "tag")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf)).sortBy(_.toString()).toSeq
    val plain = canon(IntervalJoin(left, right, "k", "rk", "lt", "rt", "1 minute"))
    val bucketed = canon(IntervalJoin.bucketed(left, right, "k", "rk", "lt", "rt", "1 minute"))
    assert(bucketed == plain)

    // and on the real self-lookback (q36's shape) at sf0.001
    val events = graft.Tables.loadEvents(spark, sf()).select("event_id", "ts", "user_id")
    val prior = events.select(col("user_id").as("pk"), col("event_id").as("pid"),
      col("ts").as("pts"))
    val p1 = canon(IntervalJoin(events, prior, "user_id", "pk", "ts", "pts", "7 days"))
    val p2 = canon(IntervalJoin.bucketed(events, prior, "user_id", "pk", "ts", "pts", "7 days"))
    assert(p2 == p1)
  }

  test("bucketed shuffles on the composite (key, time-bucket) equi-key") {
    val spark0 = spark
    import spark0.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val left = Seq((1L, ts(1000))).toDF("k", "lt")
      val right = Seq((1L, ts(990), "x")).toDF("rk", "rt", "tag")
      val p = IntervalJoin.bucketed(left, right, "k", "rk", "lt", "rt")
        .queryExecution.executedPlan.toString
      // both exchanges must partition on (key, bucket) — the whole point
      assert("hashpartitioning\\(k#\\d+L, __lb#\\d+".r.findFirstIn(p).isDefined, p)
      assert("hashpartitioning\\(rk#\\d+L, __rb#\\d+".r.findFirstIn(p).isDefined, p)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("bucketed rejects calendar-ambiguous and colliding inputs") {
    val spark0 = spark
    import spark0.implicits._
    val left = Seq((1L, ts(1000))).toDF("k", "lt")
    val right = Seq((1L, ts(990), "x")).toDF("rk", "rt", "tag")
    assert(intercept[IllegalArgumentException] {
      IntervalJoin.bucketed(left, right, "k", "rk", "lt", "rt", "1 month")
    }.getMessage.contains("day-time"))
    val clash = Seq((1L, ts(1000), 0L)).toDF("k", "lt", "__lb")
    assert(intercept[IllegalArgumentException] {
      IntervalJoin.bucketed(clash, right, "k", "rk", "lt", "rt")
    }.getMessage.contains("__lb"))
  }
}
