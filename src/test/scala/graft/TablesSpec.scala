package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the `Tables.loadEvents` schema contract across fixture encodings.
  *
  * The driver has regenerated `events.parquet` with different `ts` physical
  * types across rounds (nanosecond INT64, then native microsecond TIMESTAMP).
  * A loader hard-wired to one encoding silently zeroes out the whole
  * temporal/event query family when the fixture changes, so this spec writes
  * both encodings in-test and asserts the loader normalizes each to a real
  * TimestampType column with identical values.
  */
class TablesSpec extends SparkSpec {

  private val t0 = Timestamp.valueOf("2024-03-01 12:34:56.789")
  private val t1 = Timestamp.valueOf("2024-03-02 01:02:03.004")

  private def writeDir(): String = {
    val d = Files.createTempDirectory("graft_tables_spec").toString
    new java.io.File(d).deleteOnExit()
    d
  }

  private def assertLoaded(dir: String): Unit = {
    val df = Tables.loadEvents(spark, dir)
    assert(df.schema("ts").dataType == TimestampType)
    val got = df.orderBy("event_id").select("ts").collect().map(_.getTimestamp(0))
    assert(got.toSeq == Seq(t0, t1))
  }

  test("loadEvents reads native micros TIMESTAMP fixtures directly") {
    val dir = writeDir()
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, t0, 10L), Row(2L, t1, 11L)),
      StructType(Seq(
        StructField("event_id", LongType),
        StructField("ts", TimestampType),
        StructField("user_id", LongType))))
    df.repartition(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    assertLoaded(dir)
  }

  test("loadEvents casts TIMESTAMP_NTZ ts fixtures to plain TIMESTAMP") {
    // The current driver fixtures are pandas-written timestamp[us] without a
    // timezone, which Spark infers as TIMESTAMP_NTZ; under the UTC session
    // timezone the cast must preserve the wall-clock values exactly.
    val dir = writeDir()
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        // wall-clock = the instant rendered in UTC, so the UTC-session cast
        // recovers exactly t0/t1 regardless of the JVM default timezone
        Row(1L, java.time.LocalDateTime.ofInstant(t0.toInstant, java.time.ZoneOffset.UTC), 10L),
        Row(2L, java.time.LocalDateTime.ofInstant(t1.toInstant, java.time.ZoneOffset.UTC), 11L)),
      StructType(Seq(
        StructField("event_id", LongType),
        StructField("ts", TimestampNTZType),
        StructField("user_id", LongType))))
    df.repartition(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    assertLoaded(dir)
  }

  test("loadEvents converts long (nanos-as-long) ts fixtures to timestamps") {
    // Spark cannot write TIMESTAMP(NANOS) parquet; with the legacy
    // nanosAsLong conf such a column arrives as LongType, which is exactly
    // what a plain INT64 nanos column gives — so writing longs exercises
    // the same loader branch the nanos fixtures hit.
    val dir = writeDir()
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, t0.getTime * 1000000L + (t0.getNanos % 1000000L), 10L),
        Row(2L, t1.getTime * 1000000L + (t1.getNanos % 1000000L), 11L)),
      StructType(Seq(
        StructField("event_id", LongType),
        StructField("ts", LongType),
        StructField("user_id", LongType))))
    df.repartition(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    assertLoaded(dir)
  }
}
