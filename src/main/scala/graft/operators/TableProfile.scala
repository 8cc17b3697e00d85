package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table profiling: per-column `n_rows` / `n_nulls` / `n_distinct` /
  * `min_value` / `max_value` in ONE aggregation pass — the data-quality
  * report every ETL run wants next to the reference's schema inference
  * and row estimates (SURVEY §2.A: `estimated_rows`, `pg_class
  * .reltuples`-style catalog probes; this is the real measurement).
  *
  * Scale shape: one `agg` over the table. With `exact = false`
  * (the scale default) distinct counts use HyperLogLog++
  * (`approx_count_distinct`, one pass, no expand); `exact = true` uses
  * `count distinct`, which Catalyst plans via an Expand of the input —
  * one row per profiled column per input row — correct but a
  * multi-pass-equivalent cost, for small tables and oracle checks. The
  * result is |cols| rows assembled from the single aggregate row by a
  * `stack` projection — nothing wide ever materializes.
  *
  * `min_value`/`max_value` are reported as strings so one schema fits
  * every column type; ordering is the COLUMN type's (numeric min, not
  * lexicographic) because the cast happens after the aggregate. */
object TableProfile {

  def summarize(df: DataFrame, cols: Seq[String] = Nil,
                exact: Boolean = false): DataFrame = {
    import org.apache.spark.sql.types._
    def atomic(c: String): Boolean = df.schema(c).dataType match {
      case _: NumericType => true
      case StringType | BooleanType | DateType | TimestampType |
           TimestampNTZType | BinaryType => true
      case _ => false
    }
    // default mode skips non-atomic columns (maps/arrays/structs have
    // no min/max ordering or hashable distinct) instead of crashing
    // the whole profile; explicitly-requested ones stay a loud error
    val names =
      if (cols.nonEmpty) cols.distinct
      else df.columns.toSeq.filter(atomic)
    require(names.nonEmpty, "no profilable columns")
    names.foreach { c =>
      require(df.columns.contains(c),
        s"no such column '$c' (have: ${df.columns.mkString(", ")})")
      require(atomic(c),
        s"column '$c' (${df.schema(c).dataType.simpleString}) is not " +
          "profilable: min/max/distinct need an atomic type")
    }
    def distinctAgg(c: Column): Column =
      if (exact) countDistinct(c) else approx_count_distinct(c)
    // resolve data columns backtick-quoted and key internal aliases by
    // INDEX, not name: a legal column name may contain dots (or even
    // backticks), which bare col(c) would misparse as a nested-field path
    def colQ(c: String): Column = col("`" + c.replace("`", "``") + "`")
    val aggs = names.zipWithIndex.flatMap { case (c, i) =>
      Seq(count(colQ(c)).as(s"__c_$i"),
        distinctAgg(colQ(c)).as(s"__d_$i"),
        min(colQ(c)).cast("string").as(s"__mn_$i"),
        max(colQ(c)).cast("string").as(s"__mx_$i"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    // stack(n, name1, nulls1, dst1, mn1, mx1, ...) → one row per column
    val stackArgs = names.zipWithIndex.flatMap { case (c, i) =>
      Seq(lit(c), col("__n") - col(s"__c_$i"), col(s"__d_$i"),
        col(s"__mn_$i"), col(s"__mx_$i"))
    }
    one.select(col("__n").as("n_rows"),
        stack(lit(names.size) +: stackArgs: _*)
          .as(Seq("column_name", "n_nulls", "n_distinct",
            "min_value", "max_value")))
      .select(col("column_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_value"), col("max_value"))
  }
}
