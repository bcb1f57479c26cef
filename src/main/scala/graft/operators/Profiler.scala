package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Generic table profiler — the data-quality fact sheet (row count, null
 * count, exact distinct count, min/max) per column, emitted long-form
 * (one row per column) so the result is a table a pipeline can diff
 * between corpus versions. North-star extension (SURVEY.md §2.3 Tier B;
 * every ingestion step of a training-data pipeline starts with this).
 *
 * Spark shape: one aggregation branch PER COLUMN, unioned. The tempting
 * alternative — every statistic in a single `agg` — plans multiple exact
 * count-distincts as an Expand whose partial aggregate keys on the tuple
 * of ALL profiled columns: on high-cardinality columns that first-stage
 * hash agg approaches a full-table distinct (measured 10 s vs < 1 s on
 * the sf0.1 lineitem). Per-column branches instead scan a SINGLE pruned
 * parquet column each (columnar formats make this nearly free), plan the
 * distinct as the standard two-phase agg bounded by that column's
 * cardinality, and shuffle only scalars plus distinct values. For
 * very wide profiles at 100 TB, swap `count_distinct` for
 * `approx_count_distinct` (HLL) and branches can re-merge into one pass.
 */
object Profiler {

  /** Profile `cols` of `df`: one output row per column with
    * (column_name, n_rows, n_nulls, n_distinct, min_value, max_value);
    * min/max are cast to string so heterogeneous column types share one
    * schema, exactly as the SQL oracle spells it. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    cols.map { c =>
      df.select(col(c)).agg(
          count(lit(1)).as("n_rows"),
          (count(lit(1)) - count(col(c))).as("n_nulls"),
          count_distinct(col(c)).as("n_distinct"),
          min(col(c)).cast("string").as("min_value"),
          max(col(c)).cast("string").as("max_value"))
        .select(lit(c).as("column_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_value"), col("max_value"))
    }.reduce(_ unionAll _)
  }
}
