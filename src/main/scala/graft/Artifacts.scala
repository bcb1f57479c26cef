package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Process-lifetime shared derived artifacts for the pair-graph
 * composition family.
 *
 * A dozen declared queries (cluster survivors, histograms, provenance,
 * effective size, leakage-safe split, label propagation, preference
 * pairs, graph stats, transitivity, split contamination, incremental
 * components) all take the SAME deterministic near-dup pair table as
 * input. In a real pipeline that table is computed ONCE and persisted;
 * every report then reads the artifact (the operators take the pair
 * table as an argument precisely so they compose without
 * recomputation). Re-deriving it per query made the query-isolated
 * bench re-measure the q14/q15 generator a dozen times (~40 s of the
 * 145 s round-6 quiet sweep) instead of the operators themselves.
 *
 * Mechanics: the first access per (key, process) materializes the
 * builder's result to `target/shared_artifacts/<key>` and every access
 * returns a plain parquet scan of it. The memo is per-JVM, so a fresh
 * process always rewrites (stale files from older code can never leak
 * across builds), while within one Verify/Bench sweep the generator
 * runs exactly once. A parquet file — not a cached DataFrame — because
 * the bench's between-queries reset (`unpersistTrackedCaches` +
 * `clearCache`) must drop per-query caches without losing the shared
 * artifact, and because "persisted table on disk" is exactly the shape
 * this has at 100 TB (yesterday's pair table is storage, not executor
 * memory).
 *
 * Correctness is unaffected: both generators are deterministic, the
 * artifact equals the inline derivation row-for-row, and every
 * consumer's DuckDB oracle still replays the FULL derivation from the
 * raw tables.
 */
object Artifacts {
  private val written = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def shared(s: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val path = written.computeIfAbsent(key, _ => {
      val p = s"target/shared_artifacts/$key"
      build.write.mode("overwrite").parquet(p)
      p
    })
    s.read.parquet(path)
  }

  private def dirTag(dir: String): String =
    dir.replaceAll("[^A-Za-z0-9._-]", "_")

  /** The canonical 3-gram Jaccard >= 0.6 near-dup pair table over the
    * full `documents` table, WITH the similarity column (one parquet
    * artifact serves both the edge-list consumers and the
    * weight-reading ones). */
  def jaccardPairsWithSim(s: SparkSession, dir: String): DataFrame =
    shared(s, s"jacc06_${dirTag(dir)}") {
      operators.Dedup.ngramJaccardPairs(
        Tables.load(s, dir, "documents"), threshold = 0.6)
    }

  /** The edge-list view of [[jaccardPairsWithSim]] — what the
    * component/graph consumers take. */
  def jaccardPairs(s: SparkSession, dir: String): DataFrame =
    jaccardPairsWithSim(s, dir).select("id_a", "id_b")

  /** The MinHash-LSH near-dup pair table (k=128, 32 bands, exact
    * verify) over the full `documents` table. */
  def lshPairs(s: SparkSession, dir: String): DataFrame =
    shared(s, s"lsh_${dirTag(dir)}") {
      operators.Dedup.minhashLshPairs(Tables.load(s, dir, "documents"))
        .select("id_a", "id_b")
    }

  /** The LSH kNN graph (SRP buckets, exact cosine, top-5 per vector)
    * over the full `embeddings` table — columns (query_id, cand_id,
    * score, rank). The persisted kNN graph is the standard shared index
    * of an embedding-curation pipeline: the mutual-top-1 miner (q137),
    * label-purity probe (q221), and hubness audit (q234) all read THIS
    * graph rather than re-running candidate generation per report,
    * exactly as they would against the stored graph at 100 TB.
    *
    * Built with the AUTO-sized face (round-11; was the q58 fixed width,
    * which the occupancy guard rightly refused at the 100× sweep's
    * 200 K vectors, taking all three consumers down with it): since
    * round 15 the width comes from the MEASURED candidate ladder
    * (`knnGraphWidth`), so the artifact build stays linear at any scale
    * without the bucketCap's true-near-dup eviction. At correctness
    * scale (sf0.01, 500 vectors) the minPlanes regime resolves to
    * exactly the q58 (4, 8) reference config with the bucket cap off,
    * so every consumer's fixed-width DuckDB oracle still replays the
    * graph row-for-row (spec-pinned delegation, the q264 rule). */
  def knnGraphLsh(s: SparkSession, dir: String): DataFrame =
    shared(s, s"knn5lsh_${dirTag(dir)}") {
      operators.SimilaritySearch.knnJoinLshAuto(
        Tables.load(s, dir, "embeddings"), k = 5)
    }

  /** Every shared artifact for `dir`, keyed for bench pricing: the bench
    * builds (and TIMES) each one up front, so the build cost is a
    * first-class ledger line instead of a surprise folded into whichever
    * consumer touches the memo first (VERDICT r11 #3). Each thunk is the
    * normal memoized accessor — calling it both prices the build and
    * warms the memo for every consumer in the same sweep. */
  def all(s: SparkSession, dir: String): Seq[(String, () => DataFrame)] = Seq(
    ("jacc06_pairs", () => jaccardPairsWithSim(s, dir)),
    ("lsh_pairs", () => lshPairs(s, dir)),
    ("knn5lsh_graph", () => knnGraphLsh(s, dir)))
}
