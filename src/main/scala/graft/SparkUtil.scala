package graft

import org.apache.spark.sql.DataFrame

/** Shared plan-shaping helpers. */
object SparkUtil {

  /**
   * Ensure at least the session's default parallelism before heavy per-row
   * compute. Small local parquet files are a single row group — one input
   * partition — which would serialize expensive map work (shingling,
   * MinHash, pairwise cosine) on one core. On a real cluster the scan
   * already yields >= cores splits, so this is a no-op there; the check
   * avoids paying an unconditional shuffle at scale.
   */
  def ensureParallelism(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /**
   * Salted equi-join for skewed keys. A hot key concentrates its rows in
   * one shuffle partition; salting scatters the skewed (left) side into
   * `salt` sub-keys and replicates the right side once per salt value, so
   * the hot key's work spreads over `salt` reducers. Results are identical
   * to the plain join for any salt assignment — the salt only routes rows.
   *
   * AQE's skew-join split handles most cases automatically (and is the
   * first resort); explicit salting remains the tool when a single key
   * exceeds what partition-splitting can balance (e.g. skewed *build*
   * sides, or aggregations after the join keyed on the same column).
   *
   * Join types: "inner" and "left" (the lookup-shaped cases; right/full
   * would need the mirrored construction).
   */
  def saltedJoin(leftDf: DataFrame, rightDf: DataFrame,
      leftKey: String, rightKey: String,
      salt: Int, joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left",
      s"saltedJoin supports inner/left, got '$joinType'")
    import org.apache.spark.sql.functions.{col, explode, lit, pmod, sequence, struct, xxhash64}
    val saltedL = leftDf.withColumn("__salt",
      pmod(xxhash64(struct(leftDf.columns.map(col(_)): _*)), lit(salt)).cast("int"))
    val saltedR = rightDf.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedL.join(saltedR,
        saltedL(leftKey) === saltedR(rightKey) &&
          saltedL("__salt") === saltedR("__salt"),
        joinType)
      .drop("__salt")
  }
}
