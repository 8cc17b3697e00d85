package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Feature normalization for training pipelines: per-column (optionally
  * per-group) standardization. Three flavors:
  *
  *  - [[minMax]]: (v − min) / (max − min) → [0, 1]. Exact — min/max are
  *    data values and one IEEE division is deterministic in any engine.
  *  - [[zscore]]: (v − mean) / stddev. Mean/stddev accumulate in
  *    engine-specific order, so outputs are rounded (`roundTo`) for
  *    cross-engine stability.
  *  - [[quantileRank]]: v → its cumulative distribution position
  *    `rank_end / n` (SQL `cume_dist`). Exact — both factors are
  *    integral counts.
  *
  * Scale shape: stats come from ONE map-side-combined aggregation per
  * call (grouped: keyed shuffle of |groups| rows; global: a scalar
  * frame) and re-attach as a broadcast/keys join — the table itself
  * never sorts and shuffles only for the optional group keys.
  * [[quantileRank]] aggregates per distinct value first (bounded by
  * cardinality, not rows), walks the per-column value distribution
  * with a cumulative window, and joins the narrow (value → rank) frame
  * back; degenerate single-value columns map to 1.0 (cume_dist of the
  * only value) and all-null columns pass through as null. */
object Normalize {

  private def q(c: String): Column = col("`" + c.replace("`", "``") + "`")

  private def checkCols(df: DataFrame, cols: Seq[String]): Unit = {
    require(cols.nonEmpty, "normalize needs at least one column")
    cols.foreach { c =>
      require(df.columns.contains(c), s"no such column '$c'")
      require(df.schema(c).dataType.isInstanceOf[NumericType],
        s"column '$c' (${df.schema(c).dataType.simpleString}) is not numeric")
    }
  }

  /** Replace `cols` with their [0,1] min-max scaled values (suffix
    * `_mm`); a constant column scales to 0.0, all-null stays null. */
  def minMax(df: DataFrame, cols: Seq[String],
             by: Seq[String] = Nil): DataFrame = {
    checkCols(df, cols)
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(min(q(c).cast("double")).as(s"__mn_$i"),
        max(q(c).cast("double")).as(s"__mx_$i")) }
    val stats =
      if (by.isEmpty) df.agg(aggs.head, aggs.tail: _*)
      else df.groupBy(by.map(q): _*).agg(aggs.head, aggs.tail: _*)
    val joined =
      if (by.isEmpty) df.crossJoin(broadcast(stats))
      else df.join(stats, by, "left")
    joined.select(df.columns.toSeq.map(q) ++ cols.zipWithIndex.map {
      case (c, i) =>
        val v = q(c).cast("double")
        val mn = col(s"__mn_$i"); val mx = col(s"__mx_$i")
        when(v.isNull, lit(null).cast("double"))
          .when(mx === mn, lit(0.0)).otherwise((v - mn) / (mx - mn))
          .as(s"${c}_mm")
    }: _*)
  }

  /** Attach z-scored copies of `cols` (suffix `_z`, rounded to
    * `roundTo`); zero-variance groups z to 0.0. Sample stddev (n−1). */
  def zscore(df: DataFrame, cols: Seq[String], by: Seq[String] = Nil,
             roundTo: Int = 6): DataFrame = {
    checkCols(df, cols)
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(avg(q(c).cast("double")).as(s"__av_$i"),
        stddev_samp(q(c).cast("double")).as(s"__sd_$i")) }
    val stats =
      if (by.isEmpty) df.agg(aggs.head, aggs.tail: _*)
      else df.groupBy(by.map(q): _*).agg(aggs.head, aggs.tail: _*)
    val joined =
      if (by.isEmpty) df.crossJoin(broadcast(stats))
      else df.join(stats, by, "left")
    joined.select(df.columns.toSeq.map(q) ++ cols.zipWithIndex.map {
      case (c, i) =>
        val v = q(c).cast("double")
        val av = col(s"__av_$i"); val sd = col(s"__sd_$i")
        round(when(v.isNull, lit(null).cast("double"))
          .when(sd.isNull || sd === 0.0, lit(0.0))
          .otherwise((v - av) / sd), roundTo).as(s"${c}_z")
    }: _*)
  }

  /** Attach cumulative-distribution positions of `cols` (suffix
    * `_qr`): for each value, (count of rows ≤ value) / (non-null n) —
    * SQL `cume_dist` over the column. Exact integral-count division. */
  def quantileRank(df: DataFrame, cols: Seq[String]): DataFrame = {
    checkCols(df, cols)
    val dist = graft.operators.Distributions.cumulativeByKey(df
      .select(explode(array(cols.map(c =>
        struct(lit(c).as("c"), q(c).cast("double").as("v"))): _*)).as("s"))
      .select(col("s.c").as("c"), col("s.v").as("v"))
      .where(col("v").isNotNull)
      .groupBy("c", "v").agg(count(lit(1)).as("cnt")))
      .withColumn("qr", col("e").cast("double") / col("n").cast("double"))
    cols.zipWithIndex.foldLeft(df) { case (d, (c, i)) =>
      val side = dist.filter(col("c") === lit(c))
        .select(col("v").as(s"__v_$i"), col("qr").as(s"${c}_qr"))
      d.join(side, d(c).cast("double") === col(s"__v_$i"), "left")
        .drop(s"__v_$i")
    }
  }
}
