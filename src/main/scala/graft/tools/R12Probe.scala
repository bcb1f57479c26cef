package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the round-12 guard short-circuits: verifies
  * [[graft.SparkUtil.cheapRowCountUpperBound]] resolves on the real
  * tables and times the guarded operators' PLAN-CONSTRUCTION alone
  * (where the eager guard cost lives — the VERDICT r11 "guard tax").
  * Usage: runMain graft.tools.R12Probe <sfDir>
  */
object R12Probe {
  private def tms[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"$name%-44s ${(System.nanoTime() - t0) / 1e6}%8.1f ms")
    r
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val sup = spark.read.parquet(s"$dir/supplier.parquet")

    println("ub(documents)  = " + graft.SparkUtil.cheapRowCountUpperBound(docs))
    println("ub(embeddings) = " + graft.SparkUtil.cheapRowCountUpperBound(emb))
    println("ub(emb filter) = " + graft.SparkUtil.cheapRowCountUpperBound(
      emb.filter(col("label") >= 5)))

    tms("cheapUB cold")(graft.SparkUtil.cheapRowCountUpperBound(docs))
    tms("cheapUB memoized")(graft.SparkUtil.cheapRowCountUpperBound(docs))
    tms("plan: cosineNearDupPairs (q18 guard)")(
      graft.operators.SimilaritySearch.cosineNearDupPairs(emb, threshold = 0.4))
    tms("plan: semanticDedup (q67 guard+codebook)")(
      graft.operators.SimilaritySearch.semanticDedup(emb, threshold = 0.4))
    tms("plan: knnJoin (q140 guard)")(
      graft.operators.SimilaritySearch.knnJoin(emb.filter(col("label") >= 5),
        emb.filter(col("label") === 0), k = 3))
    tms("plan: lengthBandPairs (q174 guard)")(
      graft.operators.Dedup.lengthBandPairs(docs))
    tms("plan: fuzzy pairs (q147 guard)")(
      graft.operators.FuzzyMatch.pairs(sup, "s_suppkey", "s_name", maxDist = 1))
    graft.SparkUtil.unpersistTrackedCaches()
    spark.stop()
  }
}
