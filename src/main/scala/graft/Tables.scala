package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md). */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The events table is written with nanosecond timestamps, which Spark's
    * parquet reader rejects ([PARQUET_TYPE_ILLEGAL] INT64 TIMESTAMP(NANOS)).
    * Read nanos as long (legacy conf) and convert to a micros timestamp with
    * integer division — double math would lose precision above 2^53 ns. */
  def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts DIV 1000")))
  }
}
