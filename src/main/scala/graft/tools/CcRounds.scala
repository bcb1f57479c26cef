package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal}

/** Dev probe: min-label propagation round count + per-round wall time on
  * the q99 edge graph, for the star/edge form vs the legacy pair form —
  * attributes the CC cost to diameter (rounds) vs per-round overhead.
  * Usage: runMain graft.tools.CcRounds <sfDir> [pairs]
  */
object CcRounds {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"${args(0)}/documents.parquet")
    val pairForm = args.length > 1 && args(1) == "pairs"

    val edges =
      if (pairForm)
        Dedup.simhashPairs64(docs).select("id_a", "id_b").union(
          Multimodal.phashPairs(Multimodal.mediaFromDocuments(docs))
            .select(col("media_id_a").as("id_a"), col("media_id_b").as("id_b")))
          .distinct()
      else
        Dedup.simhashComponentEdges(docs).union(
          Multimodal.phashComponentEdges(Multimodal.mediaFromDocuments(docs)))
          .distinct()

    var t0 = System.nanoTime()
    val sym = edges.select(col("id_a").as("a"), col("id_b").as("b"))
      .union(edges.select(col("id_b").as("a"), col("id_a").as("b")))
      .distinct().localCheckpoint(true)
    println(f"sym build+ckpt: ${(System.nanoTime() - t0) / 1e9}%.2f s, edges=${sym.count()}")

    val doubling = args.contains("doubling")
    var labels = docs.select(col("doc_id").as("id"), col("doc_id").as("component"))
      .localCheckpoint(true)
    var converged = false
    var iter = 0
    while (!converged && iter < 40) {
      t0 = System.nanoTime()
      val prev = labels.agg(sum("component")).head().getLong(0)
      val prop = labels.as("l")
        .join(sym.as("e"), col("l.id") === col("e.a"), "left")
        .join(labels.as("n"), col("e.b") === col("n.id"), "left")
        .groupBy(col("l.id").as("id"))
        .agg(least(min(col("l.component")), min(col("n.component"))).as("component"))
        .select(col("id"), coalesce(col("component"), col("id")).as("component"))
      val next = (if (!doubling) prop else {
        prop.as("p")
          .join(prop.select(col("id").as("__jid"), col("component").as("__jc")).as("j"),
            col("p.component") === col("__jid"), "left")
          .select(col("p.id").as("id"),
            coalesce(col("__jc"), col("p.component")).as("component"))
      }).localCheckpoint(true)
      val cur = next.agg(sum("component")).head().getLong(0)
      labels = next
      converged = cur == prev
      iter += 1
      println(f"round $iter: ${(System.nanoTime() - t0) / 1e9}%.2f s (labelsum=$cur)")
    }
    println(s"rounds=$iter converged=$converged doubling=$doubling")
    spark.stop()
  }
}
