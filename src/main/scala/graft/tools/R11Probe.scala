package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the round-11 100× outliers: stage attribution for
  * q111 (leakage-safe split), candidate/output volumes for q174
  * (length-band pairs), q147 (fuzzy pairs), q113 (similarity
  * histogram), and side counts for q140 (bipartite kNN).
  * Usage: runMain graft.tools.R11Probe <sfDir>
  */
object R11Probe {
  private def timed[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"$name%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
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
    spark.sparkContext.setLogLevel("WARN")
    val dir = args(0)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")

    // ---- q140 sides
    val nPos = emb.filter(col("label") === 0).count()
    val nNeg = emb.filter(col("label") >= 5).count()
    println(s"q140: |queries|=$nPos |corpus|=$nNeg product=${nPos * nNeg}")

    // ---- q111 stages
    val pairs = timed("q111 stage A: minhashLshPairs build+persist") {
      val p = graft.operators.Dedup.minhashLshPairs(docs)
        .select("id_a", "id_b")
      p.write.mode("overwrite").parquet("target/r11probe_pairs")
      spark.read.parquet("target/r11probe_pairs")
    }
    val nEdges = timed("q111 stage B: pair count") { pairs.count() }
    println(s"q111: edges=$nEdges (CC fast-path cutoff " +
      s"${graft.operators.ConnectedComponents.LocalEdgeCutoff})")
    timed("q111 stage C: CC + split (pairs pre-built)") {
      graft.operators.Sampling.leakageSafeSplit(docs, pairs, testPct = 20)
        .write.format("noop").mode("overwrite").save()
    }
    timed("q111 stage C2: CC alone") {
      graft.operators.ConnectedComponents(pairs,
        vertices = Some(docs.select(col("doc_id"))))
        .write.format("noop").mode("overwrite").save()
    }

    // ---- q174 expected output volume, from the bounded (g, band) table
    val width = 3L // d=2
    val cells = docs
      .select(col("lang").as("g"),
        size(graft.functions.TextFunctions.tokens(col("text")))
          .cast("long").as("len"))
      .withColumn("b", expr(s"len div $width"))
      .groupBy("g", "b").count()
    val sameCell = cells.agg(sum(col("count") * (col("count") - 1))).head().getLong(0)
    println(s"q174: same-band ordered pairs (upper bound incl. len-diff " +
      s"filter) = $sameCell over ${cells.count()} (lang, band) cells")

    // ---- q147 name-block volume (supplier names replicate per replica)
    val cust = spark.read.parquet(s"$dir/customer.parquet")
    println("q147: customer rows = " + cust.count())

    // ---- q113 candidate volume: what does pairSimilarityHistogram join?
    timed("q14 (threshold 0.6) for reference") {
      graft.operators.Dedup.ngramJaccardPairs(docs, threshold = 0.6)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
