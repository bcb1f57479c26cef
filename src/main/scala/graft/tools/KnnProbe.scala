package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.{cosineWithNorms, dot, lshBucket, norm2}
import graft.operators.{Sampling, SimilaritySearch}

/** Dev probe: stage-level attribution of the q264 auto-sized LSH kNN
  * graph ([[SimilaritySearch.knnJoinLshAuto]]) at a given corpus scale
  * — the TextProbe treatment for the one family whose top decade ran
  * ~7.5×/decade in the round-10 100× probe. Rebuilds the operator's
  * exact plan in CUT-POINT prefixes so the deltas attribute wall time
  * to candidate enumeration vs exact-cosine verify vs dedup agg vs the
  * top-k rank window, and prints the bucket-occupancy integrals
  * (Σ size², Σ size·min(size,cap)) that predict candidate volume.
  *
  * Usage: runMain graft.tools.KnnProbe <sfDir> [k] [targetBucket]
  */
object KnnProbe {
  private val taskMs =
    new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()

  private def timed(name: String)(f: => Long): Unit = {
    for (i <- 1 to 2) {
      taskMs.clear()
      val t0 = System.nanoTime(); val out = f
      val wall = (System.nanoTime() - t0) / 1e9
      import scala.jdk.CollectionConverters._
      val ts = taskMs.asScala.toSeq.map(_._2).sorted
      val stat = if (ts.isEmpty) "" else
        f"tasks ${ts.size}%4d sum ${ts.sum / 1e3}%8.2f max ${ts.max / 1e3}%6.2f s"
      println(f"$name%-34s run$i $wall%7.2f s  (rows $out%12d)  $stat")
    }
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          taskMs.add((e.stageId, e.taskInfo.duration))
      })

    val k = if (args.length > 1) args(1).toInt else 5
    val targetBucket = if (args.length > 2) args(2).toInt else 64
    val dim = 64
    val emb = spark.read.parquet(s"${args(0)}/embeddings.parquet")
    val n = emb.count()
    val (nPlanes, nTables) =
      SimilaritySearch.lshPlanesFor(n, targetBucket, maxTables = 8)
    val cap = SimilaritySearch.lshBucketCapFor(n, targetBucket)
    println(s"n=$n nPlanes=$nPlanes nTables=$nTables bucketCap=$cap " +
      s"k=$k targetBucket=$targetBucket")

    // The operator's own cut points, rebuilt verbatim (knnJoinLsh body).
    def keyed: DataFrame = graft.SparkUtil.ensureParallelism(emb)
      .select(col("vec_id").as("id"), col("embedding").as("v"),
        norm2(col("embedding"), dim).as("n2"),
        lshBucket(col("embedding"), dim, nPlanes * nTables).as("__bits"))
      .select(col("id"), col("v"), col("n2"),
        SimilaritySearch.srpTableKeys(col("__bits"), nPlanes, nTables).as("__tb"))
    def candSide: DataFrame = if (cap == Int.MaxValue) keyed else {
      val cw = Window.partitionBy(col("__tb")).orderBy(
        graft.functions.TextFunctions.mix32(
          pmod(col("id"), lit(Sampling.IdFold))), col("id"))
      keyed.withColumn("__cr", row_number().over(cw))
        .filter(col("__cr") <= cap).drop("__cr")
    }
    def joined: DataFrame = keyed.as("x").join(candSide.as("y"),
      col("x.__tb") === col("y.__tb") && col("x.id") =!= col("y.id"))
    def scored: DataFrame = joined
      .select(col("x.id").as("query_id"), col("y.id").as("cand_id"),
        cosineWithNorms(dot(col("x.v"), col("y.v"), dim),
          col("x.n2"), col("y.n2")).as("score"))
    def dedup: DataFrame = scored
      .groupBy(col("query_id"), col("cand_id"))
      .agg(max(col("score")).as("score"))

    // Occupancy integrals: Σ size² is the UNCAPPED per-table candidate
    // volume; Σ size·min(size,cap) is what the cap admits.
    val occ = keyed.groupBy("__tb").count()
      .agg(count(lit(1)).as("buckets"), max("count").as("max_bucket"),
        sum(col("count") * col("count")).as("sum_sq"),
        sum(col("count") * least(col("count"), lit(cap.toLong)))
          .as("sum_capped")).head()
    println(s"buckets=${occ.getLong(0)} max_bucket=${occ.getLong(1)} " +
      s"sum_sq=${occ.getLong(2)} sum_capped=${occ.getLong(3)}")

    def noop(df: DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save(); -1L
    }
    timed("A index (key explode)") { noop(keyed) }
    timed("B cand side (cap window)") { noop(candSide) }
    timed("C1 join, ids only") {
      joined.select(col("x.id"), col("y.id")).count()
    }
    timed("C2 join + cosine verify") { noop(scored) }
    timed("D + dedup agg") { noop(dedup) }
    timed("E full knnJoinLshAuto (q264)") {
      noop(SimilaritySearch.knnJoinLshAuto(emb, k,
        targetBucket = targetBucket))
    }
    spark.stop()
  }
}
