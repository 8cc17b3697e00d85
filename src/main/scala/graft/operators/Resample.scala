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

  /** Per-key LINEAR interpolation of null values — the upgrade over
    * forward fill for continuous signals: a null between two known
    * observations takes the time-weighted blend
    * `prev + (next − prev)·(t − t_prev)/(t_next − t_prev)` instead of
    * a stale carry. Edges (nulls before the first / after the last
    * known value) stay null by default — extrapolating a line from one
    * point is fiction — or take the nearest known value with
    * `fillEdges = true`.
    *
    * Determinism: rows order by (time, `idCol`), so duplicate
    * timestamps interpolate identically on any engine/partitioning;
    * the blend is a fixed double-arithmetic sequence on long tick
    * deltas, rounded tie-safely (6dp) with the oracle spelling.
    *
    * Scale shape: ONE hash exchange on the keys; the prev/next
    * neighbors come from two frames of the same sorted window
    * (last-ignoreNulls over the preceding frame, first-ignoreNulls
    * over the following), so there is no self-join and no per-row
    * subquery. Keys partition the work as in the rest of the
    * rolling/anomaly family.
    *
    * @return input + (`outCol` double, `interpolated` boolean) */
  def interpolate(df: DataFrame, keyCols: Seq[String], tsCol: String,
                  idCol: String, valueCol: String,
                  outCol: String = "value_interp",
                  fillEdges: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty, "interpolate needs at least one key column")
    (keyCols ++ Seq(tsCol, idCol, valueCol)).foreach(c =>
      require(df.columns.contains(c), s"no such column '$c'"))
    graft.llm.Guards.requireFreshColumns(df,
      Seq(outCol, "interpolated", "__t", "__pv", "__pt", "__nv", "__nt"),
      "Resample.interpolate")
    val ord = df.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.TimestampType => unix_micros(q(tsCol))
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType => q(tsCol).cast("long")
      case other => throw new IllegalArgumentException(
        s"interpolate time column must be timestamp or integral, got $other")
    }
    val v = q(valueCol).cast("double")
    val before = Window.partitionBy(keyCols.map(q): _*)
      .orderBy(ord, q(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val after = Window.partitionBy(keyCols.map(q): _*)
      .orderBy(ord, q(idCol))
      .rowsBetween(1, Window.unboundedFollowing)
    val withN = df
      .withColumn("__t", ord)
      .withColumn("__pv", last(when(v.isNotNull, v), ignoreNulls = true)
        .over(before))
      .withColumn("__pt", last(when(v.isNotNull, ord), ignoreNulls = true)
        .over(before))
      .withColumn("__nv", first(when(v.isNotNull, v), ignoreNulls = true)
        .over(after))
      .withColumn("__nt", first(when(v.isNotNull, ord), ignoreNulls = true)
        .over(after))
    val rf = 1e6
    val blend = floor((col("__pv") + (col("__nv") - col("__pv")) *
        (col("__t") - col("__pt")).cast("double") /
        (col("__nt") - col("__pt")).cast("double")) * rf + 0.5) / rf
    val interior = col("__pv").isNotNull && col("__nv").isNotNull
    val edge: Column =
      if (fillEdges) coalesce(col("__pv"), col("__nv"))
      else lit(null).cast("double")
    withN
      .withColumn(outCol,
        when(v.isNotNull, v).when(interior, blend).otherwise(edge))
      .withColumn("interpolated", v.isNull && col(outCol).isNotNull)
      .drop("__t", "__pv", "__pt", "__nv", "__nt")
  }
}
