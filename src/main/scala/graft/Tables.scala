package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md). */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The events table's `ts` encoding has varied across fixture generations:
    * nanosecond INT64 (which Spark's parquet reader rejects outright —
    * [PARQUET_TYPE_ILLEGAL] INT64 TIMESTAMP(NANOS) — unless read as long via
    * the legacy conf) and native microsecond TIMESTAMP without a timezone
    * (which Spark infers as TIMESTAMP_NTZ). Be schema-adaptive: enable the
    * legacy nanos-as-long read (a no-op for non-nanos files), then normalize
    * whatever `ts` arrives as to a plain TIMESTAMP — long nanos via integer
    * division (double math would lose precision above 2^53 ns), NTZ via a
    * cast (exact under the UTC session timezone all entry points set). */
  def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                => raw // already a plain TIMESTAMP
    }
  }
}
