package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval coalescing per key — merge overlapping (or touching)
  * closed intervals into maximal covered spans, the "gaps and
  * islands" pattern. The ETL uses: collapse a machine's maintenance
  * windows, a user's session spans, a supplier's shipping windows, or
  * per-document validity ranges into their covered union, with the
  * number of source intervals each merged span absorbed.
  *
  * Semantics: intervals are CLOSED on both ends; two intervals merge
  * when they overlap or touch (next.start <= running max end so far).
  * Output per (key, island): the island's min start, max end, and
  * absorbed-interval count. Rows with a null start or end are
  * DROPPED (an unbounded interval has no merge semantics here — use
  * a sentinel if "open-ended" is meant).
  *
  * Scale shape: ONE exchange, hash-partitioned by key; islands are
  * detected with a per-key sort and two window passes over the same
  * (key, start, end) frame — a running max(end) over strictly
  * preceding rows flags island starts, and a running sum of flags
  * numbers the islands — then a partial-aggregating groupBy collapses
  * each island. No join, no self-comparison: the naive "interval
  * overlaps interval" formulation is a quadratic range self-join; the
  * islands form is linear after the sort and survives any key's
  * interval count. The running max is order-insensitive among equal
  * (start, end) rows, so ties cannot flip island boundaries and the
  * result is deterministic without a unique tiebreak column. */
object Intervals {

  /** @param df       input frame
    * @param keyCols  partition keys (may be empty for a global merge —
    *                 callers accept the single-partition sort that
    *                 implies; at scale always pass keys)
    * @param startCol interval start (any orderable type)
    * @param endCol   interval end, same type as start */
  def coalesceIntervals(df: DataFrame, keyCols: Seq[String],
                        startCol: String, endCol: String): DataFrame = {
    (keyCols :+ startCol :+ endCol).foreach(c =>
      require(df.columns.contains(c), s"no such column '$c'"))
    require(df.schema(startCol).dataType == df.schema(endCol).dataType,
      s"start/end types differ: ${df.schema(startCol).dataType} vs " +
        s"${df.schema(endCol).dataType}")
    val keys: Seq[Column] = keyCols.map(col)

    val base = df
      .filter(col(startCol).isNotNull && col(endCol).isNotNull)
      .select(keys :+ col(startCol).as("__s") :+ col(endCol).as("__e"): _*)

    val order = Window.partitionBy(keys: _*).orderBy(col("__s"), col("__e"))
    val prevMax = max(col("__e")).over(
      order.rowsBetween(Window.unboundedPreceding, -1))
    val flagged = base.withColumn("__new",
      when(prevMax.isNull || col("__s") > prevMax, 1L).otherwise(0L))
    val islanded = flagged.withColumn("__island",
      sum(col("__new")).over(order.rowsBetween(Window.unboundedPreceding, 0)))

    islanded.groupBy(keys :+ col("__island"): _*)
      .agg(min(col("__s")).as("span_start"),
        max(col("__e")).as("span_end"),
        count(lit(1)).as("merged_n"))
      .drop("__island")
  }

  /** The islands' complement: GAPS in per-key coverage — "where was
    * this sensor/feed/SLA silent?" A gap opens at a merged span's end
    * and closes at the key's next span's start; the first span has no
    * predecessor, so n spans yield n−1 gap candidates (zero-length
    * ones are impossible — coalescing already fused touching spans).
    *
    * Same ONE window exchange per key as [[coalesceIntervals]] (whose
    * output this consumes — one extra lead over the already-merged,
    * much smaller span frame).
    *
    * @return (keys..., gap_start, gap_end) — gap_start exclusive span
    *         end, gap_end exclusive next start, same type as the
    *         interval columns */
  def gaps(df: DataFrame, keyCols: Seq[String], startCol: String,
           endCol: String): DataFrame = {
    val merged = coalesceIntervals(df, keyCols, startCol, endCol)
    val keys: Seq[Column] = keyCols.map(col)
    val w = Window.partitionBy(keys: _*)
      .orderBy(col("span_start"), col("span_end"))
    merged
      .withColumn("__next", lead(col("span_start"), 1).over(w))
      .where(col("__next").isNotNull)
      .select(keys :+ col("span_end").as("gap_start") :+
        col("__next").as("gap_end"): _*)
  }
}
