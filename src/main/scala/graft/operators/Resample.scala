package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key time-series resampling onto a fixed grid with forward
  * fill: bucket observations into tumbling windows, then emit EVERY
  * grid cell from each key's first observed bucket to its last,
  * carrying the most recent non-null aggregate across gaps. The
  * standard "regularize an irregular sensor/metric stream before
  * feature extraction" step; the reference engine has no notion of
  * time at all beyond parsing dates.
  *
  * Output per (key, grid cell): `bucket_start`, `avg_value` (bucket
  * average, forward-filled across empty cells), `n_events` (0 for
  * gap cells), `filled` (true iff the cell had no rows). A bucket
  * whose rows exist but carry only null values keeps `filled=false`,
  * `n_events=0`, and forward-fills the value — the same distinction
  * SQL's count(col) makes.
  *
  * Scale shape: raw rows are reduced by ONE (key, bucket) hash
  * aggregation (map-side combined) before anything else; the grid is
  * generated from a per-key (min, max) span — cells/key bounded by
  * span/interval, never by row count — and the forward-fill window
  * rides the same key partitioning as the grid join. Nothing here
  * sorts or shuffles raw events beyond the first aggregation. */
object Resample {

  private def q(c: String): Column = col("`" + c.replace("`", "``") + "`")

  def resample(df: DataFrame, keyCols: Seq[String], tsCol: String,
               valueCol: String, every: String = "1 hour"): DataFrame = {
    require(keyCols.nonEmpty, "resample needs at least one key column")
    (keyCols ++ Seq(tsCol, valueCol)).foreach(c =>
      require(df.columns.contains(c), s"no such column '$c'"))
    Seq("bucket_start", "avg_value", "n_events", "filled").foreach(c =>
      require(!df.columns.contains(c), s"'$c' is reserved by resample"))

    val per = df
      .groupBy((keyCols.map(q) :+
        window(q(tsCol), every).getField("start").as("bucket_start")): _*)
      .agg(avg(q(valueCol)).as("__avg"), count(q(valueCol)).as("__n"))
    val span = per.groupBy(keyCols.map(q): _*)
      .agg(min(col("bucket_start")).as("__mn"),
        max(col("bucket_start")).as("__mx"))
    val grid = span.select((keyCols.map(q) :+
      explode(sequence(col("__mn"), col("__mx"),
        expr(s"INTERVAL $every"))).as("bucket_start")): _*)
    val w = Window.partitionBy(keyCols.map(q): _*).orderBy(col("bucket_start"))
    grid.join(per, keyCols :+ "bucket_start", "left")
      .withColumn("filled", col("__n").isNull)
      .withColumn("avg_value", last(col("__avg"), ignoreNulls = true).over(w))
      .withColumn("n_events", coalesce(col("__n"), lit(0L)))
      .drop("__avg", "__n")
  }
}
