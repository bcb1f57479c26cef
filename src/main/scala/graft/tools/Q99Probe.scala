package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{ConnectedComponents, Dedup, Multimodal}

/** Dev probe: per-stage wall time of the q99 multisignal-components
  * composition (SimHash edges, pHash edges, union, CC) so base-scale
  * regressions can be attributed to a stage instead of re-guessed from
  * the end-to-end number. Usage: runMain graft.tools.Q99Probe <sfDir>
  */
object Q99Probe {
  private def timed[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"${args(0)}/documents.parquet")

    for (round <- 1 to 2) {
      println(s"-- round $round")
      val textEdges = timed("simhashComponentEdges") {
        val e = Dedup.simhashComponentEdges(docs); e.count(); e
      }
      val mediaEdges = timed("phashComponentEdges") {
        val e = Multimodal.phashComponentEdges(
          Multimodal.mediaFromDocuments(docs)); e.count(); e
      }
      val edges = timed("union.distinct") {
        val e = textEdges.union(mediaEdges).distinct(); e.count(); e
      }
      timed("ConnectedComponents") {
        ConnectedComponents(edges, vertices = Some(docs.select("doc_id")))
          .count()
      }
      timed("full q99 recomputed") {
        graft.SparkEntry.queries("q99_multisignal_components")(spark, args(0))
          .count()
      }
      graft.SparkUtil.unpersistTrackedCaches()
    }
    spark.stop()
  }
}
