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

  /** Per-column distribution profile for NUMERIC columns: mean, sample
    * stddev, and interpolated quartiles + p95 — the "what does this
    * column look like" report next to [[summarize]]'s counts. One
    * aggregation pass over the table.
    *
    * `exact = false` (the scale default) estimates quantiles with
    * `approx_percentile` (one streaming sketch pass, no sort) and
    * mean/stddev with Spark's merge-order-dependent running moments.
    * `exact = true` is the ENGINE-REPLAYABLE mode: quantiles via
    * Spark's exact `percentile` (per-column sorted aggregation
    * buffers — small-table / oracle-check cost, the same (n-1)·p
    * linear interpolation as `quantile_cont`), and mean/stddev from
    * EXACT decimal sums (Σx, Σx² as DECIMAL(28,10), textbook
    * two-moment formula in double on those exact sums) — every engine
    * computes the identical IEEE doubles regardless of row order, at
    * the documented cost of the formula's cancellation for
    * tiny-variance/huge-mean columns. Doubles are rounded to `roundTo`
    * so interpolation ulp noise stays below the comparison. */
  def numericProfile(df: DataFrame, cols: Seq[String],
                     exact: Boolean = false, roundTo: Int = 4): DataFrame = {
    import org.apache.spark.sql.types._
    require(cols.nonEmpty, "numericProfile needs at least one column")
    cols.foreach { c =>
      require(df.columns.contains(c),
        s"no such column '$c' (have: ${df.columns.mkString(", ")})")
      require(df.schema(c).dataType.isInstanceOf[NumericType],
        s"column '$c' (${df.schema(c).dataType.simpleString}) is not numeric")
    }
    def colQ(c: String): Column = col("`" + c.replace("`", "``") + "`")
    val ps = Seq(0.25, 0.5, 0.75, 0.95)
    val dec = DecimalType(28, 10)
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      val d = colQ(c).cast("double")
      if (exact)
        Seq(count(d).as(s"__n_$i"),
          sum(d.cast(dec)).cast("double").as(s"__s1_$i"),
          sum((d * d).cast(dec)).cast("double").as(s"__s2_$i"),
          percentile(d, lit(ps.toArray)).as(s"__q_$i"))
      else
        Seq(avg(d).as(s"__avg_$i"), stddev_samp(d).as(s"__sd_$i"),
          percentile_approx(d, lit(ps.toArray), lit(10000)).as(s"__q_$i"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.zipWithIndex.flatMap { case (c, i) =>
      val (mean, sd) =
        if (exact) {
          val (n, s1, s2) = (col(s"__n_$i"), col(s"__s1_$i"), col(s"__s2_$i"))
          (when(n > 0, s1 / n),
            when(n > 1, sqrt((s2 - s1 * s1 / n) / (n - lit(1)))))
        } else (col(s"__avg_$i"), col(s"__sd_$i"))
      Seq(lit(c), round(mean, roundTo), round(sd, roundTo)) ++
        ps.indices.map(j => round(element_at(col(s"__q_$i"), j + 1), roundTo))
    }
    one.select(stack(lit(cols.size) +: stackArgs: _*)
      .as(Seq("column_name", "mean", "stddev", "p25", "p50", "p75", "p95")))
  }

  /** Equi-width histogram of a numeric column: `bins` buckets over
    * [lo, hi] (data min/max when not given — one extra narrow agg),
    * values exactly at `hi` fold into the last bin, out-of-range rows
    * are dropped, EMPTY bins are emitted as zero rows (a report with
    * holes reads as missing data). Bin edges and assignments are plain
    * IEEE double arithmetic — floor((x-lo)/width) — so any SQL engine
    * replays them bit-for-bit. Scale shape: one narrow groupBy on the
    * bin index; the zero-fill joins a `bins`-row range frame. */
  def histogram(df: DataFrame, c: String, bins: Int = 20,
                lo: Option[Double] = None,
                hi: Option[Double] = None): DataFrame = {
    import org.apache.spark.sql.types._
    require(bins >= 1, s"bins must be >= 1: $bins")
    require(df.columns.contains(c), s"no such column '$c'")
    require(df.schema(c).dataType.isInstanceOf[NumericType],
      s"column '$c' is not numeric")
    val d = col("`" + c.replace("`", "``") + "`").cast("double")
    val (mn, mx) = (lo, hi) match {
      case (Some(a), Some(b)) => (a, b)
      case _ =>
        val r = df.agg(min(d).as("mn"), max(d).as("mx")).head
        if (r.isNullAt(0)) (0.0, 1.0) // all-null/empty: empty histogram
        else (lo.getOrElse(r.getDouble(0)), hi.getOrElse(r.getDouble(1)))
    }
    require(mx >= mn, s"hi $mx < lo $mn")
    val width = if (mx == mn) 1.0 else (mx - mn) / bins
    val bin = least(floor((d - lit(mn)) / lit(width)), lit(bins - 1))
      .cast("long")
    val counts = df.filter(d.isNotNull && d >= mn && d <= mx)
      .groupBy(bin.as("bin")).agg(count(lit(1)).as("n"))
    df.sparkSession.range(bins).select(col("id").as("bin"))
      .join(counts, Seq("bin"), "left")
      .select(col("bin"),
        (lit(mn) + col("bin") * lit(width)).as("bin_lo"),
        (lit(mn) + (col("bin") + 1) * lit(width)).as("bin_hi"),
        coalesce(col("n"), lit(0L)).as("n"))
  }
}
