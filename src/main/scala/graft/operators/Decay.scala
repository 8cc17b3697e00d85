package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exponentially time-decayed aggregation — the standard "recency
  * weighted" feature for ranking and user modeling: each event
  * contributes `value · 2^(-(T - t) / halfLife)` toward its key's
  * score, where T is a fixed reference instant for the run. An event
  * one half-life old counts half; ancient history fades smoothly
  * instead of falling off a trailing-window cliff.
  *
  * Formulated against a FIXED reference time (the run's "as of"
  * instant) rather than per-row EWMA recursion on purpose: the score
  * becomes a plain one-pass aggregation — commutative, associative,
  * map-side combinable — so it scales exactly like a sum. Per-row
  * recursive EWMA (y_i = x_i + a·y_{i-1}) forces a per-key ordered
  * scan and is what the trailing-window operators in [[Rolling]] are
  * for; the decayed score is the shape production ranking features
  * actually use (decay is re-anchored each batch run).
  *
  * Numeric contract: the exponent is computed in double seconds
  * relative to T, so absolute epoch magnitudes never enter `pow`
  * (no overflow for any realistic timestamp), and events AFTER T
  * (late data beyond the as-of instant) are EXCLUDED rather than
  * amplified with >1 weights.
  *
  * Scale shape: one projection + one hash aggregation with map-side
  * partials; shuffles only (key, double) pairs. */
object Decay {

  /** @param df       events
    * @param keyCols  grouping keys
    * @param tsCol    event-time column (TimestampType)
    * @param valueCol numeric contribution per event
    * @param asOf     reference instant T, e.g. "2024-03-01 00:00:00"
    * @param halfLifeSecs decay half-life in seconds
    * @return one row per key: decayed_score, plus the undecayed sum
    *         and event count over the same (t <= T) events for
    *         calibration */
  def decayedScore(df: DataFrame, keyCols: Seq[String], tsCol: String,
                   valueCol: String, asOf: String,
                   halfLifeSecs: Double): DataFrame = {
    (keyCols :+ tsCol :+ valueCol).foreach(c =>
      require(df.columns.contains(c), s"no such column '$c'"))
    require(halfLifeSecs > 0, s"halfLifeSecs must be > 0, got $halfLifeSecs")
    val keys: Seq[Column] = keyCols.map(col)

    val t = to_timestamp(lit(asOf))
    val ageSecs = t.cast("double") - col(tsCol).cast("double")
    val weight = pow(lit(2.0), -ageSecs / lit(halfLifeSecs))

    df.filter(col(tsCol).isNotNull && col(tsCol) <= t)
      .groupBy(keys: _*)
      .agg(sum(col(valueCol) * weight).as("decayed_score"),
        sum(col(valueCol)).as("raw_sum"),
        count(lit(1)).as("n_events"))
  }
}
