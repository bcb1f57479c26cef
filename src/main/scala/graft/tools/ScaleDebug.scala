package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: SRP bucket-occupancy statistics for the q58/q264 LSH
  * index at a given corpus — prints Σ size² (the candidate-pair volume
  * the bucket self-join generates) per table, plus the occupancy tail.
  * Usage: runMain graft.tools.ScaleDebug <sfDir> [targetBucket]
  */
object ScaleDebug {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"${args(0)}/embeddings.parquet")
    val n = e.count()
    val (planes, tables) = graft.operators.SimilaritySearch.lshPlanesFor(
      n, if (args.length > 1) args(1).toInt else 64)
    println(s"n=$n planes=$planes tables=$tables")
    val keyed = graft.operators.SimilaritySearch
      .lshKeyedForDebug(e, planes, tables)
    val occ = keyed.groupBy("__tb").count().cache()
    occ.agg(
      count(lit(1)).as("buckets"),
      sum(col("count")).as("rows"),
      sum(col("count") * col("count")).as("sum_sq"),
      max(col("count")).as("max_bucket"),
      expr("percentile_approx(count, 0.99)").as("p99")).show(false)
    // candidate volume under an occupancy cap: Σ size·min(size, cap)
    val capCols = Seq(256, 512, 1024, 2048).map(c =>
      sum(col("count") * least(col("count"), lit(c))).as(s"cap$c"))
    occ.agg(capCols.head, capCols.tail: _*).show(false)
    occ.orderBy(col("count").desc).show(20, false)
    spark.stop()
  }
}
