package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Truncated exponentially-weighted moving average per key — the
  * standard smoother for noisy per-entity series (latency, spend,
  * sensor drift), in its BOUNDED-LOOKBACK form: each row's smoothed
  * value is the weight-normalized sum of the last `lookback+1`
  * observations with weights (1-α)^j, j = steps back. This is the
  * BIAS-CORRECTED EWM mean — pandas `ewm(alpha).mean()` with
  * `adjust=True` (y_t = Σ (1-α)^j x_{t-j} / Σ (1-α)^j), NOT the
  * adjust=False recursion s_t = α·x_t + (1-α)·s_{t-1}, whose oldest
  * term carries a boosted (1-α)^{t-1} weight.
  *
  * Why truncated + adjusted rather than the recursion: the recursion
  * is inherently sequential per key (a chain the length of the series
  * — the anti-pattern for a distributed engine), while this form is a
  * FIXED-WIDTH window aggregation whose tail truncation drops at most
  * (1-α)^(L+1) of the weight mass — under 0.2% at the default α=0.5,
  * L=8. Normalizing by the actually-present weight mass makes series
  * heads well-defined with no warm-up bias: row 1's EWMA is x_1
  * exactly.
  *
  * Determinism: weights are exact powers of one double; the weighted
  * sum folds over a ROWS window (fixed order: ts, then the id column
  * as tie-break), so both engines compute one fixed double sequence.
  *
  * Scale shape: one shuffle (partition by key), one ordered window
  * with a ROWS frame bounded at `lookback` — per-row state is L+1
  * values regardless of series length, the same bound a streaming
  * implementation would hold. */
object Ewma {

  /** Input plus `ewma` (and `__w`-free): per `keyCol`, ordered by
    * (`tsCol`, `idCol`), the truncated-EWMA of `valueCol`.
    *
    * `valueCol` must be null-free and the operator RAISES on the first
    * null it sees (the family's loud-data-bug convention): Spark's
    * `collect_list` drops nulls, so a null would silently shrink the
    * frame and reweight its neighbors — diverging from pandas `ewm`
    * (which propagates NaN) AND from a DuckDB `list()` replay (which
    * keeps nulls). Filter or impute nulls explicitly upstream. */
  def smooth(df: DataFrame, keyCol: String, idCol: String, tsCol: String,
             valueCol: String, alpha: Double = 0.5, lookback: Int = 8,
             roundTo: Int = 6): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, s"alpha must be in (0,1): $alpha")
    require(lookback >= 0, s"lookback must be >= 0: $lookback")
    val q = 1.0 - alpha
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(idCol))
    // rn only to express the weight as pow(q, rn_t - rn_i): with a
    // ROWS frame both sums share the frame, so the numerator folds
    // x_i · q^(-i) scaled by q^t — but q^(-i) overflows for long
    // series. Instead fold the LAST L+1 values positionally: collect
    // the frame as an ordered list (bounded at L+1 elements) and
    // aggregate with the position-indexed weight — exact, bounded,
    // order-fixed.
    val frame = w.rowsBetween(-lookback.toLong, 0)
    graft.llm.Guards.requireFreshColumns(df, Seq("ewma", "__ew_vals"),
      "Ewma.smooth")
    // materialize the frame list ONCE (window expressions referenced
    // from several places would each get their own window pass), then
    // fold positionally: vals is oldest→newest (ROWS frames preserve
    // frame order), element i of n carries weight q^(n-i)
    // nulls raise BEFORE the window: collect_list would silently drop
    // them, shrinking the frame and reweighting neighbors (see scaladoc)
    val checked = when(col(valueCol).isNull,
      raise_error(concat(lit(s"Ewma.smooth: null $valueCol for key '"),
        col(keyCol).cast("string"), lit("' — filter or impute upstream")))
        .cast("double"))
      .otherwise(col(valueCol).cast("double"))
    val withVals = df.withColumn("__ew_vals",
      collect_list(checked).over(frame))
    val vals = col("__ew_vals")
    val n = size(vals)
    val num = aggregate(
      zip_with(vals, sequence(lit(1), n), (x, i) =>
        x * pow(lit(q), (n - i).cast("double"))),
      lit(0.0), (acc, x) => acc + x)
    val den = (lit(1.0) - pow(lit(q), n.cast("double"))) / lit(alpha)
    val rf = math.pow(10.0, roundTo)
    withVals
      .withColumn("ewma", floor(num / den * rf + 0.5) / rf)
      .drop("__ew_vals")
  }
}
