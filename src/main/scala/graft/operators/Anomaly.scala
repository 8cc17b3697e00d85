package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Trailing-baseline anomaly scoring: each point's z-score against the
  * PRIOR `width` time units of its own key — "is this value unusual
  * for this user/device/market, given its recent behavior?" The
  * baseline frame ends strictly BEFORE the current instant (RANGE
  * …PRECEDING AND 1 PRECEDING), so a spike never contaminates the
  * baseline it is judged against, and simultaneous rows (same
  * timestamp) never see each other.
  *
  * Exactness: values are snapped to fixed point (`scale` decimals,
  * floor-half-up) and the window moments Σv / Σv² accumulate as EXACT
  * decimals — order-independent, so the score replays bit-for-bit on
  * any engine and any partitioning. The final mean/variance/z are a
  * handful of double ops spelled identically in the SQL oracle;
  * z is rounded tie-safely and the anomaly flag evaluates on the
  * ROUNDED score. Zero-variance baselines yield a null z (flag false):
  * a constant history says nothing about scale.
  *
  * Scale shape: ONE window exchange, hash-partitioned by key —
  * identical to the [[Rolling]] feature family (two-pointer RANGE
  * scan per key, no self-join, no per-point subqueries). */
object Anomaly {

  private def q(c: String): Column = col("`" + c.replace("`", "``") + "`")

  /** @param width     baseline length in microseconds (timestamp
    *                   column) or plain units (integral column)
    * @param minBaseline points with fewer prior rows are emitted with
    *                   null z (not enough history to judge)
    * @param threshold  |z| at or above flags `is_anomaly`
    * @return input columns + (n_baseline, zscore, is_anomaly) */
  def trailingZScore(df: DataFrame, keyCols: Seq[String], tsCol: String,
                     valueCol: String, width: Long, minBaseline: Int = 5,
                     threshold: Double = 3.0, scale: Int = 4,
                     roundTo: Int = 6): DataFrame = {
    require(keyCols.nonEmpty,
      "anomaly scoring needs at least one key column — a keyless window " +
        "moves the whole table onto one task")
    require(width > 0, s"window width must be positive, got $width")
    require(minBaseline >= 2, s"minBaseline must be >= 2, got $minBaseline")
    require(threshold > 0, s"threshold must be positive, got $threshold")
    graft.llm.Guards.requireFreshColumns(df,
      Seq("n_baseline", "zscore", "is_anomaly", "__vi", "__s", "__q"),
      "Anomaly.trailingZScore")
    val ord = df.schema(tsCol).dataType match {
      case TimestampType => unix_micros(q(tsCol))
      case LongType | IntegerType => q(tsCol).cast("long")
      case other => throw new IllegalArgumentException(
        s"anomaly time column must be timestamp or integral, got $other")
    }
    // the PRIOR window: up to `width` back, strictly before now
    val w = Window.partitionBy(keyCols.map(q): _*).orderBy(ord)
      .rangeBetween(-width, -1)
    val pow = math.pow(10.0, scale)
    // fixed-point snap: one float multiply, then exact integers forever
    val vi = floor(q(valueCol).cast("double") * pow + 0.5).cast("long")
    val withMoments = df
      .withColumn("__vi", vi)
      .withColumn("n_baseline", count(col("__vi")).over(w))
      .withColumn("__s",
        sum(col("__vi").cast(DecimalType(38, 0))).over(w))
      .withColumn("__q",
        sum((col("__vi").cast(DecimalType(19, 0)) * col("__vi"))
          .cast(DecimalType(38, 0))).over(w))
    val n = col("n_baseline").cast("double")
    val mu = col("__s").cast("double") / n / pow
    val vr = (col("__q").cast("double") / (pow * pow) -
      (col("__s").cast("double") / pow) *
        (col("__s").cast("double") / pow) / n) / (n - 1.0)
    val x = col("__vi").cast("double") / pow
    val rf = math.pow(10.0, roundTo)
    val z = floor((x - mu) / sqrt(vr) * rf + 0.5) / rf
    withMoments
      .withColumn("zscore",
        when(col("n_baseline") >= minBaseline && vr > 0, z))
      .withColumn("is_anomaly",
        coalesce(abs(col("zscore")) >= threshold, lit(false)))
      .drop("__vi", "__s", "__q")
  }
}
