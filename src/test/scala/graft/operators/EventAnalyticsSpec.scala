package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.Row
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
}
