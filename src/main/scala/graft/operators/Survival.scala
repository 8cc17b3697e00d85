package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan-Meier survival estimation — retention's statistically
  * honest form: the naive "fraction still active after t days" curve
  * is biased by subjects who simply haven't been observed for t days
  * yet; KM handles them as CENSORED, removing them from the at-risk
  * denominator without counting them as churned
  * (S(t) = Π_{tᵢ≤t} (1 − dᵢ/nᵢ)).
  *
  * Determinism: dᵢ and nᵢ are exact integers; the product is computed
  * as exp of a RUNNING sum of ln(1 − d/n) over the time-ordered event
  * axis — a sequential in-order accumulation on both engines (running
  * window sums scan rows in order), so the curve replays bit-for-bit.
  *
  * Scale shape: subjects reduce to a (duration, events, total)
  * keys-only aggregation; the windowed frame is the AGGREGATED time
  * axis (distinct durations — days, not subjects), the same
  * bounded-frame window acceptance as the allocation and remainder
  * ranks elsewhere. Nothing subject-sized ever sorts. */
object Survival {

  private def q(c: String): Column = col("`" + c.replace("`", "``") + "`")

  /** @param durationCol integral time-to-event (e.g. days active)
    * @param eventCol    true = the event (churn/death) was OBSERVED at
    *                    that duration; false = censored (still alive
    *                    when observation ended)
    * @return one row per distinct duration with ≥1 observed event or
    *         censoring: (t, n_at_risk, events, censored, survival) —
    *         survival is S(t) AFTER the events at t. */
  def kaplanMeier(df: DataFrame, durationCol: String, eventCol: String,
                  roundTo: Int = 6): DataFrame = {
    Seq(durationCol, eventCol).foreach(c =>
      require(df.columns.contains(c), s"no such column '$c'"))
    val rf = math.pow(10.0, roundTo)
    val counts = df
      .where(q(durationCol).isNotNull && q(eventCol).isNotNull &&
        q(durationCol) >= 0)
      .groupBy(q(durationCol).cast("long").as("t"))
      .agg(sum(when(q(eventCol).cast("boolean"), 1L).otherwise(0L))
        .as("events"),
        count(lit(1)).as("total"))
      .withColumn("censored", col("total") - col("events"))
    // at-risk at t = subjects with duration >= t: total N minus the
    // exclusive cumulative count below t — one window over the
    // aggregated time axis
    val wOrd = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(lit(1))
    val risky = counts
      .withColumn("__below", coalesce(sum(col("total")).over(wOrd), lit(0L)))
      .withColumn("n_at_risk",
        sum(col("total")).over(wAll) - col("__below"))
    // survival: exp of the RUNNING ln-factor sum (in-order sequential
    // accumulation on any engine — bit-replayable). The everyone-dies
    // time point (events = at-risk, only reachable at the last t) is
    // flagged instead of ln(0): Spark's log(0) yields NULL while other
    // engines yield -inf — the flag sidesteps the divergence.
    val wRun = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val lnFactor = when(
      col("events") > 0 && col("events") < col("n_at_risk"),
      log(lit(1.0) - col("events").cast("double") /
        col("n_at_risk").cast("double"))).otherwise(lit(0.0))
    val extinct = max(when(col("events") >= col("n_at_risk"), 1L)
      .otherwise(0L)).over(wRun)
    risky
      .withColumn("survival",
        when(extinct === 1L, lit(0.0)).otherwise(
          floor(exp(sum(lnFactor).over(wRun)) * rf + 0.5) / rf))
      .select(col("t"), col("n_at_risk"), col("events"), col("censored"),
        col("survival"))
  }
}
