package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.SimilaritySearch

/** Dev probe (r16): prices the residual-multiprobe second pass of the
  * kNN-graph face against pass 1 alone, ABAB in ONE JVM — cold-run
  * variance on the dev box is ±2×, so only same-JVM alternation
  * isolates the pass's cost. This probe is what adjudicated the r16
  * mechanism change: deriving the residual slice by anti-join against
  * the cached pass-1 graph cost a full cache-materialization barrier
  * (demonstrated at 2 M vectors: 125 → 230 s quiet), while the
  * analytic occupancy rule ("every bucket a singleton") prices at
  * warm-noise zero (72.6/112.8 s full plan vs 125.0 s pass 1 alone,
  * row-identical output, `records/rescost_r16_1000x.log`).
  *
  * Usage: runMain graft.tools.ResidualCostProbe <sfDir> */
object ResidualCostProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"${args(0)}/embeddings.parquet").cache()
    val n = emb.count()
    println(s"n=$n")

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def drain(df: org.apache.spark.sql.DataFrame): Long =
      timedCount(df)
    def timedCount(df: org.apache.spark.sql.DataFrame): Long =
      df.groupBy().count().head().getLong(0)

    // the measured width at this corpus (stamped): (30, 2, cap 1024)
    val (p, t, cap) = (30, 2, 1024)

    // ABAB: cold-run variance on this box is ±2×, so only same-JVM
    // alternation isolates the residual pass's cost; read the SECOND
    // pair (both warm).
    for (round <- 1 to 2) {
      val c1 = timed(s"[$round] pass1 only (r15 shipped)") {
        drain(SimilaritySearch.knnJoinLsh(emb, 5, nPlanes = p, nTables = t,
          bucketCap = cap, allowFixedWidth = true))
      }
      println(s"  rows=$c1")
      graft.SparkUtil.unpersistTrackedCaches()

      val c2 = timed(s"[$round] pass1 + analytic residual") {
        drain(SimilaritySearch.knnJoinLsh(emb, 5, nPlanes = p, nTables = t,
          bucketCap = cap, allowFixedWidth = true,
          residualMultiprobe = true, residualBucketCap = 16))
      }
      println(s"  rows=$c2")
      graft.SparkUtil.unpersistTrackedCaches()
    }
    spark.stop()
  }
}
