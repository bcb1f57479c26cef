package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/**
 * Similarity search over an embedding column (`array<float>`): exact
 * brute-force cosine top-k, exact cosine near-dup pairs, and an
 * LSH-bucketed approximate variant for scale. North-star extensions
 * (SURVEY.md §2.3 Tier B Q10).
 *
 * Scale design (100 TB posture):
 *   - `topKCosine` broadcasts the (single-row) query side and runs one
 *     narrow scan + a `TakeOrderedAndProject` (orderBy.limit k) — no full
 *     sort, no wide shuffle; the classic distributed top-k.
 *   - `cosineNearDupPairs` is the exact O(n²) path — correct but
 *     quadratic; usable when n is bounded (e.g. within-partition dedup).
 *     Norms are projected once per row *before* the join so each pair costs
 *     one dot product, not three.
 *   - `annTopKLsh` is the scale path: sign-random-projection buckets
 *     (deterministic public hyperplanes) turn the cross join into an
 *     equi-join on bucket id. Approximate: candidates are same-bucket only.
 */
object SimilaritySearch {

  /** Exact cosine top-k of `df` against a single-row `query` DataFrame
    * holding the same `vecCol`. Ties broken by ascending id for
    * determinism. Includes the query row itself if present in `df`. */
  def topKCosine(df: DataFrame, query: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      dim: Int = 64): DataFrame = {
    val q = broadcast(query.select(col(vecCol).as("__qvec")))
    df.crossJoin(q)
      .select(col(idCol), cosine(col(vecCol), col("__qvec"), dim).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** Exact all-pairs cosine near-duplicates: (a, b), a < b, with
    * cosine >= threshold. Quadratic by construction; norms precomputed. */
  def cosineNearDupPairs(df: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      dim: Int = 64): DataFrame = {
    val withNorm = graft.SparkUtil.ensureParallelism(df)
      .select(col(idCol).as("id"), col(vecCol).as("v"),
      norm2(col(vecCol), dim).as("n2"))
    withNorm.as("x").join(withNorm.as("y"), col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        cosineWithNorms(dot(col("x.v"), col("y.v"), dim), col("x.n2"), col("y.n2"))
          .as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Approximate top-k: LSH-bucketed candidates (same sign-projection
    * bucket as the query) re-ranked by exact cosine. The bucket join
    * replaces the cross join; recall depends on nPlanes (more planes →
    * smaller buckets → faster and less complete). */
  def annTopKLsh(df: DataFrame, query: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      dim: Int = 64, nPlanes: Int = 8): DataFrame = {
    val bucketed = graft.SparkUtil.ensureParallelism(df)
      .select(col(idCol), col(vecCol),
      lshBucket(col(vecCol), dim, nPlanes).as("__bucket"))
    val q = broadcast(query.select(col(vecCol).as("__qvec"),
      lshBucket(col(vecCol), dim, nPlanes).as("__qbucket")))
    bucketed.join(q, col("__bucket") === col("__qbucket"))
      .select(col(idCol), cosine(col(vecCol), col("__qvec"), dim).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }
}
