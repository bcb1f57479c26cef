package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Fuzzy string matching with LOSSLESS delete-neighborhood blocking
 * (the SymSpell / FastSS scheme: Bocek et al., "Fast Similarity Search
 * in Large Dictionaries", 2007). North-star extension (SURVEY.md §2.3
 * Tier B): entity resolution over catalog/name columns — typo-variant
 * supplier names, OCR'd titles, crawl-mangled domains — where the match
 * predicate is an edit-distance threshold, not equality.
 *
 * Blocking guarantee: for any two strings with Levenshtein distance
 * ≤ d, deleting ≤ d characters from each can produce the SAME string
 * (delete the edited positions on both sides), so the pair shares a key
 * in the ≤ d-deletion neighborhoods. Generating all ≤ d-deletion
 * variants as join keys therefore yields a candidate SUPERSET of the
 * true pairs — never a miss — and an exact Levenshtein verify on
 * candidates makes the operator equal to the all-pairs formulation
 * (which is exactly what the DuckDB oracle runs, proving losslessness
 * on every fixture).
 *
 * Scale shape: keys-per-string is n+1 for d=1 and O(n²) for d=2, so
 * this is a DICTIONARY-level operator — run it on the distinct-value
 * catalog (names, domains, titles: orders of magnitude smaller than the
 * corpus at 100 TB), never on raw rows; candidates come from ONE
 * equi-join on the delete key (never all-pairs), are deduped on bare id
 * pairs before strings are rejoined (the q15 pattern), and the verify
 * is Spark's threshold Levenshtein (banded early-exit, returns -1 past
 * the bound — O(d·n) per pair, not O(n²)).
 */
object FuzzyMatch {

  /** All single-character deletions of every string in an array-typed
    * SQL expression (empty strings contribute nothing). */
  private def delete1(arr: String): String =
    s"""flatten(transform($arr, k -> if(length(k) < 1, array(),
       |  transform(sequence(1, length(k)),
       |    i -> concat(substr(k, 1, i - 1), substr(k, i + 1, length(k)))))))"""
      .stripMargin.replace("\n", " ")

  /** The ≤ maxDist-deletion neighborhood of a string column (including
    * the string itself), distinct. */
  private[operators] def deleteKeys(strCol: String, maxDist: Int): String = {
    val tiers = Iterator.iterate(s"array($strCol)")(delete1)
      .take(maxDist + 1).toSeq
    s"array_distinct(concat(${tiers.mkString(", ")}))"
  }

  /** AT-SCALE GUARD for [[pairs]] (the q174/q18 refusal rule; the last
    * reachable data-quadratic named by the round-11 100× sweep):
    * duplicate or near-identical strings share EVERY delete key, so a
    * value that appears c times contributes ~c² candidate collisions
    * per key — the replicated-name 100× corpus measured ~2.5×10⁸
    * ordered collisions (222 s); the next decade is hours. The budget
    * is on Σ c·(c−1) over delete-key groups (computable from ONE
    * bounded aggregation over the cached keyed table); 5×10⁸ keeps the
    * measured 100× point runnable and refuses past it. */
  val FuzzyCandidateBudget: Long = 500000000L

  /** Guard short-circuit for [[pairs]] (round-12, VERDICT r11 #2): the
    * exact budget check pays the delete-key explode + a groupBy shuffle
    * at EVERY scale. Two provably-sound cheap passes first:
    *
    *   1. A pair (i, j) collides on at most min(K_i, K_j) shared delete
    *      keys, where K(L) — the ≤ maxDist-deletion neighborhood size of
    *      a length-L string — is ≤ 1+L for d=1 and ≤ 1+L+L(L−1) = L²+1
    *      for d=2 (tier sizes before array_distinct; distinct only
    *      shrinks). So Σ_k c_k(c_k−1) ≤ n(n−1)·K(Lmax). With a FREE n
    *      upper bound (parquet footers) and the pessimistic Lmax = 64
    *      (short catalog strings — names, domains, codes), within-budget
    *      skips ALL jobs.
    *   2. Otherwise one NARROW agg (count + max length — no explode, no
    *      shuffle) computes the same bound with the true Lmax.
    *
    * Both bounds only ever PASS; refusal always falls back to the exact
    * per-key collision aggregation. */
  private def pairsGuardCheapPass(names: org.apache.spark.sql.DataFrame,
      maxDist: Int, budget: Long): Boolean = {
    def keysUB(l: Long): Long = if (maxDist <= 1) 1L + l else l * l + 1L
    def within(n: Long, lmax: Long): Boolean = {
      val k = keysUB(math.max(0L, lmax))
      // n(n-1)k <= budget, division-form (no Long overflow)
      n == 0 || k == 0 || (n - 1 <= budget / n && (n * (n - 1)) <= budget / k)
    }
    graft.SparkUtil.cheapRowCountUpperBound(names) match {
      case Some(n) if within(n, 64L) => true
      case _ =>
        val r = names.agg(count(lit(1)), max(length(col("__s")))).head()
        val n = r.getLong(0)
        n == 0 || within(n, r.getInt(1).toLong)
    }
  }

  /**
   * All id pairs (id_a < id_b) whose strings are within Levenshtein
   * distance `maxDist`, with the exact distance. Equal to the all-pairs
   * brute force by the blocking guarantee above.
   *
   * EAGER at call time unless `allowLargeOutput = true`: the candidate
   * budget runs one aggregation over the delete-key counts (the keyed
   * table is cached and reused by both join sides). DICTIONARY-level by
   * contract — on duplicate-heavy raw rows the budget refuses and
   * points at [[resolveEntities]] (distinct values + closure).
   */
  def pairs(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int, allowLargeOutput: Boolean = false,
      candidateBudget: Long = FuzzyCandidateBudget): DataFrame = {
    require(maxDist >= 1 && maxDist <= 2,
      s"maxDist=$maxDist must be 1 or 2 (keys grow as n^maxDist)")
    val names = df.select(col(idCol).as("__id"), col(strCol).as("__s"))
      .where(col("__s").isNotNull)
    val keyed = graft.SparkUtil.trackCache(names.select(col("__id"),
      explode(expr(deleteKeys("__s", maxDist))).as("__k")))
    if (!allowLargeOutput && !pairsGuardCheapPass(names, maxDist, candidateBudget)) {
      // SUM over zero rows is SQL NULL (an empty input must pass)
      val row = keyed.groupBy(col("__k")).count()
        .agg(sum(col("count") * (col("count") - 1L))).head()
      val expected = if (row.isNullAt(0)) 0L else row.getLong(0)
      graft.GuardRefusal.check(expected <= candidateBudget,
        s"fuzzy pairs(maxDist=$maxDist) would probe ~$expected delete-key " +
          s"candidate collisions (> $candidateBudget) on this input: " +
          "duplicate-heavy values share every blocking key, so candidates " +
          "grow quadratically. Run the operator on the DISTINCT value " +
          "dictionary (resolveEntities — the documented contract), or pass " +
          "allowLargeOutput=true to knowingly probe the full candidate set.")
    }
    // candidates on bare id pairs: dedupe BEFORE strings rejoin so the
    // shuffle carries two ids per candidate, not two strings
    val cand = keyed.as("a")
      .join(keyed.as("b"),
        col("a.__k") === col("b.__k") && col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .distinct()
    cand
      .join(names.select(col("__id"), col("__s").as("__sa")),
        col("id_a") === col("__id")).drop("__id")
      .join(names.select(col("__id"), col("__s").as("__sb")),
        col("id_b") === col("__id")).drop("__id")
      .select(col("id_a"), col("id_b"),
        levenshtein(col("__sa"), col("__sb"), maxDist).as("dist"))
      .where(col("dist") >= 0)
  }

  /**
   * Entity resolution over a string column's DISTINCT values: fuzzy
   * pairs at `maxDist` feed connected components; every distinct value
   * gets its cluster's canonical (minimum) value. Transitive by design —
   * "red bolt" ~ "old bolt" ~ "old belt" land in one cluster even though
   * the ends exceed the threshold (that is the point of ER closure).
   */
  def resolveEntities(df: DataFrame, strCol: String,
      maxDist: Int): DataFrame = {
    // cached (r16 opt, guide §5): the distinct dictionary is consumed
    // FOUR times downstream (the delete-key explode inside pairs, both
    // string rejoins, and the CC vertex set) and each consumption
    // re-ran the corpus-wide distinct exchange+agg. Dictionary-bounded
    // by contract, so the cache is small.
    val names = graft.SparkUtil.trackCache(
      df.select(col(strCol).as("name")).where(col("name").isNotNull)
        .distinct())
    val p = pairs(names, "name", "name", maxDist)
    ConnectedComponents(p.select(col("id_a"), col("id_b")),
        vertices = Some(names.select(col("name").as("id"))))
      .select(col("id").as("name"), col("component").as("cluster"))
  }
}
