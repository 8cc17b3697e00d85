package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Time- and volume-weighted averages — the irregular-sampling
  * location estimates a plain AVG gets wrong: a sensor that reports
  * 100× per second while idle and once a minute under load, or a
  * ticker quoted densely at the open, dominates an unweighted mean
  * with its oversampled regime. TWAP weights each observation by how
  * long it was CURRENT (until the next observation); VWAP weights by
  * an explicit size column (the execution-quality benchmark).
  *
  * Exactness: values and weights snap to fixed point and every product
  * accumulates as an exact DECIMAL(38,0) — order-independent, so the
  * result replays bit-for-bit on any engine and partitioning; the
  * final ratio is a fixed sequence of double ops rounded tie-safely.
  * Simultaneous observations order deterministically by (ts, value),
  * mirrored in the oracle.
  *
  * Scale shape: TWAP is ONE window exchange per key (lead + grouped
  * sum — the as-of/rolling family's shape); VWAP is a pure map-side
  * combined aggregation, no window at all. */
object Timeseries {

  private def q(c: String): Column = col("`" + c.replace("`", "``") + "`")

  /** Per-key time-weighted average over the observed span: each value
    * holds from its timestamp until the key's next observation; the
    * last observation closes the span (zero weight). Keys with fewer
    * than two observations have no span — null twap.
    *
    * @return (keys..., n_segments, span_us, twap) */
  def twap(df: DataFrame, keyCols: Seq[String], tsCol: String,
           valueCol: String, scale: Int = 4,
           roundTo: Int = 6): DataFrame = {
    require(keyCols.nonEmpty, "twap needs at least one key column")
    require(df.schema(tsCol).dataType == TimestampType,
      s"twap time column must be a timestamp, got ${df.schema(tsCol).dataType}")
    val pow = math.pow(10.0, scale)
    val t = unix_micros(q(tsCol))
    val vi = floor(q(valueCol).cast("double") * pow + 0.5).cast("long")
    val seg = df
      .select(keyCols.map(q) :+ vi.as("__vi") :+ t.as("__t") :+
        q(valueCol).as("__v"): _*)
      .withColumn("__nt", lead(col("__t"), 1).over(
        Window.partitionBy(keyCols.map(q): _*)
          .orderBy(col("__t"), col("__v"))))
      .where(col("__nt").isNotNull)
      .select(keyCols.map(q) :+ col("__vi") :+
        (col("__nt") - col("__t")).as("__dur"): _*)
    val rf = math.pow(10.0, roundTo)
    seg.groupBy(keyCols.map(q): _*)
      .agg(count(lit(1)).as("n_segments"),
        sum(col("__dur")).as("span_us"),
        sum(col("__vi").cast(DecimalType(19, 0)) * col("__dur"))
          .as("__s"))
      .select(keyCols.map(q) ++ Seq(col("n_segments"), col("span_us"),
        when(col("span_us") > 0,
          floor(col("__s").cast("double") / col("span_us").cast("double")
            / pow * rf + 0.5) / rf).as("twap")): _*)
  }

  /** Per-key volume-weighted average: Σ value·weight / Σ weight with
    * both factors in fixed point. Zero/negative total weight → null.
    *
    * @return (keys..., n, total_weight, vwap) */
  def vwap(df: DataFrame, keyCols: Seq[String], valueCol: String,
           weightCol: String, scale: Int = 2,
           roundTo: Int = 6): DataFrame = {
    require(keyCols.nonEmpty, "vwap needs at least one key column")
    val pow = math.pow(10.0, scale)
    val vi = floor(q(valueCol).cast("double") * pow + 0.5).cast("long")
    val wi = floor(q(weightCol).cast("double") * pow + 0.5).cast("long")
    val rf = math.pow(10.0, roundTo)
    df.where(q(valueCol).isNotNull && q(weightCol).isNotNull)
      .select(keyCols.map(q) :+ vi.as("__vi") :+ wi.as("__wi"): _*)
      .groupBy(keyCols.map(q): _*)
      .agg(count(lit(1)).as("n"),
        sum(col("__wi")).as("__sw"),
        sum(col("__vi").cast(DecimalType(19, 0)) * col("__wi")).as("__s"))
      .select(keyCols.map(q) ++ Seq(col("n"),
        (col("__sw").cast("double") / pow).as("total_weight"),
        when(col("__sw") > 0,
          floor(col("__s").cast("double") / col("__sw").cast("double")
            / pow * rf + 0.5) / rf).as("vwap")): _*)
  }
}
