package graft.tools

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{pigeonholeDepthFor, simhash, simhashBlocksAt, tokens}

/** Dev probe: pigeonhole-block occupancy for the q16/q99 SimHash pair
  * join — prints Σ size² per block table (the candidate-pair volume the
  * blocked self-join generates) and the hot-bucket tail, the same
  * statistics ScaleDebug prints for the SRP-LSH family.
  * Usage: runMain graft.tools.SimhashDebug <sfDir> [depth]
  */
object SimhashDebug {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = spark.read.parquet(s"${args(0)}/documents.parquet")
    val n = d.count()
    val depth = if (args.length > 1) args(1).toInt else pigeonholeDepthFor(n)
    val phashMode = args.length > 2 && args(2) == "phash"
    val hashed = (if (phashMode) {
      import graft.operators.Multimodal
      Multimodal.decodeMeta(Multimodal.mediaFromDocuments(d)).toDF()
        .select(col("media_id").as("doc_id"),
          Multimodal.perceptualHash(col("checksum")).as("sh"))
    } else d.select(col("doc_id"),
      simhash(tokens(col("text"))).as("sh"))).cache()
    val dict = hashed.groupBy("sh").count().cache()
    println(s"docs=$n depth=$depth distinct_sh=${dict.count()}")
    dict.orderBy(col("count").desc)
      .limit(10).show(false)
    val blocked = dict
      .select(explode(simhashBlocksAt(col("sh"), depth)).as("b"))
      .select(col("b.block_id"), col("b.block_val"))
    val occ = blocked.groupBy("block_id", "block_val").count().cache()
    occ.agg(
      count(lit(1)).as("buckets"),
      sum(col("count")).as("rows"),
      sum(col("count") * col("count")).as("sum_sq"),
      max(col("count")).as("max_bucket"),
      expr("percentile_approx(count, 0.99)").as("p99")).show(false)
    occ.orderBy(col("count").desc).show(20, false)
    spark.stop()
  }
}
