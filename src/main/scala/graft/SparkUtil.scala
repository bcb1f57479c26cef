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
}
