package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — keep a per-key aggregate
  * snapshot current by MERGING in each new batch's partial aggregates
  * instead of rescanning history: the materialized-view-maintenance
  * pattern, and at 100 TB the difference between touching yesterday's
  * delta and re-reading the whole lake. Works for any
  * commutative-monoid measure; this operator ships the standard four
  * (count, sum, min, max — avg derives as sum/count downstream).
  *
  * Contract: [[partials]] turns raw rows into a partial-aggregate
  * frame (`n`, `sum_<c>`, `min_<c>`, `max_<c>` per measure);
  * [[combine]] merges any number of partial frames into one (sums
  * add, mins min, maxs max). `combine(partials(a), partials(b)) ≡
  * partials(a ∪ b)` — the algebraic identity the oracle checks by
  * full recompute. Exactness: sums accumulate the measure AS GIVEN —
  * callers pass integer/decimal measures (cents, counts) when
  * bit-exact replay matters, the same contract as [[Trend]].
  *
  * Scale shape: each batch pays one partial-aggregating exchange
  * over ITS OWN rows; the merge aggregates |keys|-sized partial
  * frames, never raw history. Snapshot storage is the aggregate,
  * not the corpus. */
object IncrementalAgg {

  /** Partial-aggregate frame of raw rows: keys, `n`, and per measure
    * `sum_<c>` / `min_<c>` / `max_<c>` (null-measure rows contribute
    * to `n` but not to that measure's sum/min/max — SQL aggregate
    * semantics). */
  def partials(df: DataFrame, keyCols: Seq[String],
               measureCols: Seq[String]): DataFrame = {
    (keyCols ++ measureCols).foreach(c =>
      require(df.columns.contains(c), s"no such column '$c'"))
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(measureCols.nonEmpty, "measureCols must be non-empty")
    val aggs = count(lit(1)).as("n") +: measureCols.flatMap(c => Seq(
      sum(col(c)).as(s"sum_$c"),
      min(col(c)).as(s"min_$c"),
      max(col(c)).as(s"max_$c")))
    df.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge partial frames produced by [[partials]] with the SAME keys
    * and measures: one aggregation over |keys|-sized inputs. Keys
    * present in only some parts merge correctly (sum of an absent
    * part contributes nothing). */
  def combine(parts: Seq[DataFrame], keyCols: Seq[String],
              measureCols: Seq[String]): DataFrame = {
    require(parts.nonEmpty, "combine needs at least one partial frame")
    val expected =
      (keyCols :+ "n") ++ measureCols.flatMap(c =>
        Seq(s"sum_$c", s"min_$c", s"max_$c"))
    parts.foreach(p => expected.foreach(c =>
      require(p.columns.contains(c),
        s"partial frame missing column '$c' — was it built by partials()?")))
    val unioned = parts.map(_.select(expected.map(col): _*))
      .reduce(_ unionByName _)
    val aggs = sum(col("n")).as("n") +: measureCols.flatMap(c => Seq(
      sum(col(s"sum_$c")).as(s"sum_$c"),
      min(col(s"min_$c")).as(s"min_$c"),
      max(col(s"max_$c")).as(s"max_$c")))
    unioned.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
