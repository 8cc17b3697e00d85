package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CUSUM change-point detection (Page 1954): per key, the classic
  * two-sided cumulative-sum control statistic over a time-ordered
  * value stream —
  *
  *   S⁺_t = max(0, S⁺_{t-1} + (v_t − target − slack))
  *   S⁻_t = max(0, S⁻_{t-1} + (target − v_t − slack))
  *
  * with an alarm when either side exceeds `threshold`. The recursion
  * looks inherently sequential, but the max-with-zero clamp has a
  * closed prefix form — with P_t = Σ_{i≤t} d_i,
  *
  *   S_t = P_t − min(0, min_{j≤t} P_j)
  *
  * so both sides become ONE cumulative window sum plus a running min
  * over it: a single hash exchange on the keys, one sort per
  * partition, no self-join, no iteration. That is the same shape as
  * [[Rolling]]/[[Anomaly]] and survives 100 TB the same way — work
  * partitions by key; a key's history must sit together (inherent to
  * any sequential statistic), but keys spread across the cluster.
  *
  * Exactness: values, target, and slack snap to fixed point (`scale`
  * decimals, floor-half-up — the [[Anomaly]] convention), so every
  * prefix sum and running min is exact integer arithmetic in
  * DECIMAL(38,0); the emitted statistics are a single cast-to-double
  * division spelled identically in the SQL oracle, and alarms compare
  * SCALED integers — no float ever decides a flag. Ordering ties break
  * on `idCol`, so the statistic is deterministic under any
  * partitioning. Null values pass through with null statistics and
  * false alarms (a gap contributes nothing to the drift evidence).
  *
  * Reference scope: TinyETL has no time-series operators at all
  * (SURVEY §2.E) — this extends the analytics family alongside
  * [[Anomaly.trailingZScore]] (point outliers) with the
  * complementary question: "has the LEVEL of this stream shifted?" */
object Changepoint {

  private def q(c: String): Column = col("`" + c.replace("`", "``") + "`")

  /** @param keyCols   stream identity (device, user, series)
    * @param tsCol     time column (timestamp or integral)
    * @param idCol     unique tiebreak within equal timestamps
    * @param valueCol  observed value (numeric)
    * @param target    in-control level the stream should hold
    * @param slack     allowance k — drift smaller than this per step
    *                  accumulates no evidence (classic k = δ/2)
    * @param threshold decision interval h: alarm when a side's
    *                  statistic exceeds it
    * @param scale     fixed-point decimals for exact accumulation
    * @return input columns + (cusum_high, cusum_low, alarm_high,
    *         alarm_low) — statistics in original value units */
  def cusum(df: DataFrame, keyCols: Seq[String], tsCol: String,
            idCol: String, valueCol: String, target: Double,
            slack: Double, threshold: Double, scale: Int = 4): DataFrame = {
    require(keyCols.nonEmpty,
      "cusum needs at least one key column — a keyless ordered prefix " +
        "moves the whole table onto one task")
    require(slack >= 0, s"slack must be >= 0, got $slack")
    require(threshold > 0, s"threshold must be positive, got $threshold")
    require(scale >= 0 && scale <= 6, s"scale must be in [0,6], got $scale")
    graft.llm.Guards.requireFreshColumns(df,
      Seq("cusum_high", "cusum_low", "alarm_high", "alarm_low",
        "__vi", "__p_hi", "__p_lo", "__m_hi", "__m_lo"),
      "Changepoint.cusum")
    val ord = df.schema(tsCol).dataType match {
      case TimestampType => unix_micros(q(tsCol))
      case LongType | IntegerType => q(tsCol).cast("long")
      case other => throw new IllegalArgumentException(
        s"cusum time column must be timestamp or integral, got $other")
    }
    val pow = math.pow(10.0, scale)
    // driver-side exact snaps of the knobs, same floor-half-up as values
    val ti = math.floor(target * pow + 0.5).toLong
    val ki = math.floor(slack * pow + 0.5).toLong
    val hi = math.floor(threshold * pow + 0.5).toLong
    val w = Window.partitionBy(keyCols.map(q): _*)
      .orderBy(ord, q(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // fixed-point snap: one float multiply, then exact integers forever
    val vi = floor(q(valueCol).cast("double") * pow + 0.5).cast("long")
    val dec = (c: Column) => c.cast(DecimalType(38, 0))
    val withPrefix = df
      .withColumn("__vi", vi)
      // null values contribute 0 evidence but keep their row position
      .withColumn("__p_hi",
        sum(dec(coalesce(col("__vi") - lit(ti) - lit(ki), lit(0L)))).over(w))
      .withColumn("__p_lo",
        sum(dec(coalesce(lit(ti) - col("__vi") - lit(ki), lit(0L)))).over(w))
    val withMin = withPrefix
      .withColumn("__m_hi", least(min(col("__p_hi")).over(w), dec(lit(0L))))
      .withColumn("__m_lo", least(min(col("__p_lo")).over(w), dec(lit(0L))))
    val sHi = col("__p_hi") - col("__m_hi")
    val sLo = col("__p_lo") - col("__m_lo")
    withMin
      .withColumn("cusum_high",
        when(col("__vi").isNotNull, sHi.cast("double") / lit(pow)))
      .withColumn("cusum_low",
        when(col("__vi").isNotNull, sLo.cast("double") / lit(pow)))
      // alarms compare exact scaled integers — floats never decide
      .withColumn("alarm_high",
        col("__vi").isNotNull && sHi > dec(lit(hi)))
      .withColumn("alarm_low",
        col("__vi").isNotNull && sLo > dec(lit(hi)))
      .drop("__vi", "__p_hi", "__p_lo", "__m_hi", "__m_lo")
  }
}
