package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-key linear trend (OLS slope / intercept / r²) — "is this
  * supplier's price drifting", "is this user's activity decaying":
  * the one-pass regression every monitoring pipeline wants per key.
  *
  * Engine-replayable BY CONSTRUCTION: callers supply x and y as
  * INTEGER columns (days since an epoch, cents, counts), the
  * aggregation accumulates the exact integer moments (n, Σx, Σy,
  * Σxy, Σx², Σy²), and only the final slope/intercept/r² arithmetic
  * runs in doubles — so any engine computing the same formula over
  * the same exact sums produces bit-identical IEEE results (the
  * DuckDB oracle does; a float-accumulating regr_slope would drift
  * with partition order). Callers must keep |Σxy| under 2^63 —
  * scale the units, not the row count.
  *
  * Degenerate keys (single point, or constant x) get null slope/
  * intercept/r²; constant y with varying x gets slope 0 and r² null
  * (0/0 variance explained is undefined, not zero).
  *
  * Scale shape: ONE partial-aggregating hash aggregation of six
  * integer moments — exactly the cost of a sum. */
object Trend {

  def fit(df: DataFrame, keyCols: Seq[String], xCol: String, yCol: String,
          roundTo: Int = 6): DataFrame = {
    (keyCols ++ Seq(xCol, yCol)).foreach(c =>
      require(df.columns.contains(c), s"no such column '$c'"))
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    Seq(xCol, yCol).foreach { c =>
      val t = df.schema(c).dataType
      require(t == org.apache.spark.sql.types.LongType ||
        t == org.apache.spark.sql.types.IntegerType,
        s"'$c' must be an integer column (got $t) — exact moments are " +
          "the replayability contract; pre-scale to days/cents/counts")
    }

    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    val m = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(x).as("__sx"), sum(y).as("__sy"),
        sum(x * y).as("__sxy"), sum(x * x).as("__sxx"),
        sum(y * y).as("__syy"))

    // variance/covariance numerators in EXACT long arithmetic; doubles
    // only at the final divisions (the replayability contract)
    val n = col("n")
    val varX = n * col("__sxx") - col("__sx") * col("__sx")
    val varY = n * col("__syy") - col("__sy") * col("__sy")
    val cov = n * col("__sxy") - col("__sx") * col("__sy")
    val slope = when(varX > 0, cov.cast("double") / varX.cast("double"))
    val intercept = when(varX > 0,
      (col("__sy").cast("double") - (cov.cast("double") / varX.cast("double"))
        * col("__sx").cast("double")) / n.cast("double"))
    val r2 = when(varX > 0 && varY > 0,
      (cov.cast("double") * cov.cast("double")) /
        (varX.cast("double") * varY.cast("double")))

    // half-up-toward-+inf rounding spelled as floor(x·10^s + 0.5)/10^s:
    // identical IEEE steps in any engine — Spark's BigDecimal HALF_UP
    // and DuckDB's round() disagree on doubles at exact decimal ties
    // (observed live on Cooccurrence's lift), and slope/intercept/r2
    // are ratios of exact integer moments, so representable ties
    // (e.g. 1/64 at roundTo=6) are reachable. Values may be negative;
    // floor-half-up stays well-defined there as long as the oracle
    // mirrors the same spelling.
    val p10 = math.pow(10.0, roundTo)
    def r(c: org.apache.spark.sql.Column) = floor(c * p10 + 0.5) / p10
    m.select(keyCols.map(col) ++ Seq(col("n"),
      r(slope).as("slope"),
      r(intercept).as("intercept"),
      r(r2).as("r2")): _*)
  }
}
