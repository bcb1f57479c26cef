package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

case class L(id: Long, k: Long, t: Timestamp)
case class R(k: Long, t: Timestamp, rid: Long, v: String)

/** Unit tests for the as-of join over hand-built temporal fixtures:
  * latest-at-or-before pick, exact-time inclusion, null padding, and
  * deterministic tie-breaking. */
class AsOfJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def join(ls: Seq[L], rs: Seq[R]) = {
    val spark0 = spark
    import spark0.implicits._
    AsOfJoin(ls.toDF(), rs.toDF(),
      leftKey = "k", rightKey = "k", leftTime = "t", rightTime = "t",
      leftId = "id", rightCols = Seq("rid" -> "rid", "v" -> "v"),
      tieBreakCols = Seq("rid"))
  }

  test("picks the latest right row at or before the left time, per key") {
    val out = join(
      Seq(L(1, 10, ts("2024-01-05 00:00:00")), L(2, 10, ts("2024-01-02 00:00:00"))),
      Seq(R(10, ts("2024-01-01 00:00:00"), 100, "old"),
        R(10, ts("2024-01-03 00:00:00"), 101, "new"),
        R(10, ts("2024-01-09 00:00:00"), 102, "future")))
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(out(1L) == "new")  // latest <= Jan 5 is Jan 3
    assert(out(2L) == "old")  // latest <= Jan 2 is Jan 1; Jan 3 is in the future
  }

  test("a right row at exactly the left time is included") {
    val out = join(
      Seq(L(1, 10, ts("2024-01-03 00:00:00"))),
      Seq(R(10, ts("2024-01-03 00:00:00"), 100, "exact")))
      .collect()
    assert(out.head.getString(4) == "exact")
  }

  test("left rows with no match survive null-padded; keys never cross") {
    val out = join(
      Seq(L(1, 10, ts("2024-01-01 00:00:00")), L(2, 99, ts("2024-01-05 00:00:00"))),
      Seq(R(10, ts("2024-01-02 00:00:00"), 100, "late"),
        R(55, ts("2024-01-01 00:00:00"), 101, "other-key")))
      .collect().map(r => r.getLong(0) -> Option(r.getString(4))).toMap
    assert(out(1L).isEmpty) // only right row for key 10 is later
    assert(out(2L).isEmpty) // key 99 has no right rows at all
  }

  test("equal right times break ties by the tie-break column, descending") {
    val out = join(
      Seq(L(1, 10, ts("2024-01-05 00:00:00"))),
      Seq(R(10, ts("2024-01-03 00:00:00"), 100, "low"),
        R(10, ts("2024-01-03 00:00:00"), 200, "high")))
      .collect()
    assert(out.length == 1 && out.head.getString(4) == "high")
  }

  test("tolerance bound: stale history null-pads; inside-window picks normally") {
    val spark0 = spark
    import spark0.implicits._
    def joinTol(ls: Seq[L], rs: Seq[R], tolMin: Long) =
      AsOfJoin(ls.toDF(), rs.toDF(),
        leftKey = "k", rightKey = "k", leftTime = "t", rightTime = "t",
        leftId = "id", rightCols = Seq("rid" -> "rid", "v" -> "v"),
        tieBreakCols = Seq("rid"), maxStalenessMinutes = Some(tolMin))
    val ls = Seq(L(1, 10, ts("2024-01-05 00:00:00")))
    val rs = Seq(R(10, ts("2024-01-01 00:00:00"), 100, "stale"))
    // 4 days back, tolerance 3 days -> null-padded
    val strict = joinTol(ls, rs, 3L * 24 * 60).collect().head
    assert(strict.isNullAt(4), s"stale row must not be picked: $strict")
    // tolerance 5 days -> picked; exactly-at-the-bound is inclusive
    assert(joinTol(ls, rs, 5L * 24 * 60).collect().head.getString(4) == "stale")
    assert(joinTol(ls, rs, 4L * 24 * 60).collect().head.getString(4) == "stale")
    // a huge tolerance degrades to the plain as-of join
    val plain = join(ls, rs).collect().head.getString(4)
    assert(joinTol(ls, rs, 1000000L).collect().head.getString(4) == plain)
  }

  test("unionSorted (merge formulation) == join+pick on fixtures and real tables") {
    val spark0 = spark
    import spark0.implicits._
    // crafted fixture covering ties, exact-time inclusion, null padding
    val ls = Seq(
      L(1, 10, ts("2024-01-05 00:00:00")), L(2, 10, ts("2024-01-02 00:00:00")),
      L(3, 10, ts("2024-01-03 00:00:00")), L(4, 99, ts("2024-01-05 00:00:00")))
    val rs = Seq(
      R(10, ts("2024-01-01 00:00:00"), 100, "old"),
      R(10, ts("2024-01-03 00:00:00"), 101, "tie-low"),
      R(10, ts("2024-01-03 00:00:00"), 200, "tie-high"),
      R(55, ts("2024-01-01 00:00:00"), 102, "other-key"))
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(_.toSeq.map(String.valueOf)).sortBy(_.toString()).toSeq
    val viaJoin = canon(join(ls, rs))
    val viaMerge = canon(AsOfJoin.unionSorted(ls.toDF(), rs.toDF(),
      leftKey = "k", rightKey = "k", leftTime = "t", rightTime = "t",
      rightCols = Seq("rid" -> "rid", "v" -> "v"), tieBreakCols = Seq("rid")))
    assert(viaMerge == viaJoin)

    // the real q22 inputs: events x orders at sf0.001
    val events = graft.Tables.loadEvents(spark, sf()).select("event_id", "ts", "user_id")
    val orders = spark.read.parquet(s"${sf()}/orders.parquet")
      .withColumn("o_orderdate",
        org.apache.spark.sql.functions.col("o_orderdate").cast("timestamp"))
    val rcols = Seq("o_orderkey" -> "last_order_key",
      "o_orderdate" -> "last_order_date", "o_totalprice" -> "last_order_price")
    val big1 = canon(AsOfJoin(events, orders, "user_id", "o_custkey", "ts",
      "o_orderdate", "event_id", rcols, Seq("o_orderkey")))
    val big2 = canon(AsOfJoin.unionSorted(events, orders, "user_id", "o_custkey",
      "ts", "o_orderdate", rcols, Seq("o_orderkey")))
    assert(big2 == big1)
  }

  test("forward direction: earliest at-or-after pick, forward window expiry") {
    val spark0 = spark
    import spark0.implicits._
    val ls = Seq(L(1, 10, ts("2024-01-05 00:00:00")),
      L(2, 10, ts("2024-01-08 00:00:00")),
      L(3, 20, ts("2024-01-05 00:00:00")))
    val rs = Seq(
      R(10, ts("2024-01-04 00:00:00"), 100, "past"),     // before: never picked
      R(10, ts("2024-01-05 00:00:00"), 101, "now"),      // exact time included
      R(10, ts("2024-01-06 00:00:00"), 102, "later"),
      R(20, ts("2024-01-09 00:00:00"), 103, "too_far")) // beyond the window
    val out = AsOfJoin(ls.toDF(), rs.toDF(),
      leftKey = "k", rightKey = "k", leftTime = "t", rightTime = "t",
      leftId = "id", rightCols = Seq("rid" -> "rid", "v" -> "v"),
      tieBreakCols = Seq("rid"),
      maxStalenessMinutes = Some(2L * 24 * 60), forward = true)
      .collect().map(r => r.getLong(0) -> Option(r.getString(4))).toMap
    assert(out(1L) == Some("now"))   // earliest >= Jan 5 is the exact hit
    assert(out(2L) == None)          // nothing at or after Jan 8 for key 10
    assert(out(3L) == None)          // Jan 9 is outside the 2-day window
  }

  test("nearest direction: closest wins, equal-distance ties break backward") {
    val spark0 = spark
    import spark0.implicits._
    val ls = Seq(L(1, 10, ts("2024-01-05 12:00:00")),
      L(2, 10, ts("2024-01-07 12:00:00")),
      L(3, 20, ts("2024-01-05 12:00:00")))
    val rs = Seq(
      R(10, ts("2024-01-05 11:50:00"), 100, "ten_before"),
      R(10, ts("2024-01-05 12:03:00"), 101, "three_after"),   // closest to L1
      R(10, ts("2024-01-07 11:30:00"), 102, "thirty_before"), // tie for L2...
      R(10, ts("2024-01-07 12:30:00"), 103, "thirty_after"),  // ...backward wins
      R(20, ts("2024-01-05 14:00:00"), 104, "too_far"))       // outside 30 min
    val out = AsOfJoin.nearest(ls.toDF(), rs.toDF(),
      leftKey = "k", rightKey = "k", leftTime = "t", rightTime = "t",
      leftId = "id", rightCols = Seq("rid" -> "rid", "v" -> "v"),
      tieBreakCols = Seq("rid"), toleranceMinutes = 30L)
      .collect().map(r => r.getLong(0) -> Option(r.getString(4))).toMap
    assert(out(1L) == Some("three_after"))
    assert(out(2L) == Some("thirty_before"))
    assert(out(3L) == None)
  }

  test("unionSorted fails fast when an input uses a reserved internal name") {
    val spark0 = spark
    import spark0.implicits._
    val ls = Seq((10L, ts("2024-01-05 00:00:00"), "x")).toDF("k", "t", "__side")
    val rs = Seq((10L, ts("2024-01-01 00:00:00"), 1L)).toDF("k", "t", "rid")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.unionSorted(ls, rs, "k", "k", "t", "t",
        rightCols = Seq("rid" -> "rid"), tieBreakCols = Seq("rid"))
    }
    assert(e.getMessage.contains("__side"))
  }
}
