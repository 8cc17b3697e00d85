package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cohort retention: bucket each key by its first-seen week (ISO
  * Monday truncation, identical in Spark and DuckDB), then count how
  * many distinct keys from each cohort are active again N weeks later
  * — the standard retention triangle behind every growth dashboard.
  *
  * Scale shape: the event log shuffles on the key ONCE for the
  * first-seen aggregation; the join back rides the same key
  * partitioning, and the (key, cohort, week) distinct + final count
  * aggregate both map-side-combine before their exchange. Week
  * offsets are exact integer arithmetic (both week starts are
  * Monday-truncated, so the day difference is always a multiple of
  * 7). */
object Cohort {

  private def q(c: String): Column = col("`" + c.replace("`", "``") + "`")

  /** Output: (cohort_week, week_offset, n_users). Offset 0 is the
    * cohort's own week and always counts the full cohort. */
  def retention(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    Seq(keyCol, tsCol).foreach(c =>
      require(df.columns.contains(c), s"no such column '$c'"))
    val first = df.groupBy(q(keyCol))
      .agg(date_trunc("week", min(q(tsCol))).as("cohort_week"))
    df.select(q(keyCol), date_trunc("week", q(tsCol)).as("__aw"))
      .join(first, keyCol)
      .select(col("cohort_week"),
        (datediff(col("__aw"), col("cohort_week")) / 7).cast("int")
          .as("week_offset"), q(keyCol))
      .distinct()
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
