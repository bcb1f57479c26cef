package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of (temporal) join: for each left row, attach the single right row
 * with the greatest `rightTime <= leftTime` for the same key — "the state
 * of the dimension as of the event time". Left rows with no qualifying
 * right row survive null-padded (left-outer semantics, like the Lookup
 * operator's E1). A training-data-pipeline staple the reference lacks
 * (SURVEY.md §2.2 lists as-of joins as absent); composed from Spark
 * built-ins per the extension preference order — no custom plan needed.
 *
 * Determinism: the picked row is unique only if `tieBreakCols` breaks
 * rightTime ties; callers pass a unique right column (e.g. the order key).
 *
 * Scale notes (100 TB posture): implemented as an equi-join on the key
 * (shuffle both sides, AQE-managed) + per-left-row window pick. The time
 * predicate rides the join so Catalyst pushes it into the join condition;
 * cost is O(matching history per key), the classic trade-off of the
 * declarative formulation. When per-key history is deep, the scale path is
 * bucketing both sides by key and sorted-merge within buckets
 * (`bucketBy(key).sortBy(time)`) so the as-of pick becomes a linear merge —
 * same semantics, no per-pair blowup.
 */
object AsOfJoin {

  /**
   * @param leftId unique left row id (window partition key for the pick)
   * @param rightCols right columns to attach, each (rightName, outputAlias)
   * @param tieBreakCols right columns that uniquify equal `rightTime` picks
   *                     (compared descending, after time)
   */
  def apply(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      leftId: String,
      rightCols: Seq[(String, String)],
      tieBreakCols: Seq[String]): DataFrame = {
    val l = left.as("l")
    val r = right.as("r")
    val joined = l.join(r,
      col(s"l.$leftKey") === col(s"r.$rightKey") &&
        col(s"r.$rightTime") <= col(s"l.$leftTime"),
      "left_outer")
    val pick = Window.partitionBy(col(s"l.$leftId"))
      .orderBy(
        (col(s"r.$rightTime").desc_nulls_last +:
          tieBreakCols.map(c => col(s"r.$c").desc_nulls_last)): _*)
    joined
      .withColumn("__rn", row_number().over(pick))
      .filter(col("__rn") === 1)
      .select(left.columns.map(c => col(s"l.$c")) ++
        rightCols.map { case (rc, alias) => col(s"r.$rc").as(alias) }: _*)
  }
}
