package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Batch analytics over the event stream table: per-entity anomaly
 * flagging and behavioral sequence mining. North-star extensions
 * (SURVEY.md §2.3 Tier B) — the operational face of the same corpus a
 * training pipeline ingests (crawl logs, interaction streams).
 *
 * Determinism: counts are exact integers; the only floats are the
 * shared-interpolation `percentile` (== DuckDB `quantile_cont`) and one
 * multiply in the spike compare — both bit-stable cross-engine. Orderings
 * are total (explicit tiebreaks), so every cut is deterministic.
 */
object EventAnalytics {

  /**
   * Activity-spike detection: per (entity, hour) event counts flagged
   * against `factor ×` the entity's own median hourly count — the
   * self-calibrating burst detector (bot bursts, scraper storms, runaway
   * clients) that needs no global threshold.
   *
   * Spark shape: one hash agg to (entity, hour) counts — map-side
   * partial counts, so raw events never shuffle — then a per-entity
   * median (a second agg over the already-small hourly table) joined
   * back on the entity key. At 100 TB the hourly table is |entities|×|hours|
   * — orders of magnitude under the event count — and AQE broadcasts the
   * median side when it fits. The spike rule compares an exact integer
   * count against `factor · median` (one multiply of the shared
   * interpolated double): deterministic cross-engine.
   */
  def activitySpikes(events: DataFrame, factor: Int = 3,
      tsCol: String = "ts", userCol: String = "user_id"): DataFrame = {
    val hourly = events
      .groupBy(col(userCol), date_trunc("hour", col(tsCol)).as("hour"))
      .agg(count(lit(1)).as("n_events"))
    val med = hourly.groupBy(col(userCol))
      .agg(percentile(col("n_events"), lit(0.5)).as("median_hourly"))
    hourly.join(med, userCol)
      .select(col(userCol), col("hour"), col("n_events"), col("median_hourly"),
        (col("n_events") >= lit(factor) * col("median_hourly")).as("spike"))
  }

  /**
   * Behavioral sequence mining: the `k` most frequent (event_type →
   * next event_type) transitions, ordered per entity by event time (id
   * tiebreak for a total order). The classic first-order Markov summary
   * of an interaction stream — funnels, loops, abandonment edges.
   *
   * Spark shape: one (entity)-partitioned `lead` window (the shuffle is
   * on the entity key — the same partitioning sessionization uses), a
   * hash agg over the tiny (type, type) key space with map-side partial
   * counts, and a `TakeOrderedAndProject` top-k cut under the total
   * (count desc, from asc, to asc) order.
   */
  def eventTransitions(events: DataFrame, k: Int = 20,
      tsCol: String = "ts", userCol: String = "user_id",
      typeCol: String = "event_type", idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    events
      .select(col(userCol), col(typeCol),
        lead(col(typeCol), 1).over(w).as("__next"))
      .filter(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
      .orderBy(col("n_transitions").desc, col("from_type").asc, col("to_type").asc)
      .limit(k)
  }
}
