package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Per-key TWO-FEATURE ordinary least squares — one step past
  * [[Trend]]'s single regressor, which is the step that starts
  * answering "is price drift explained by quantity or by discount?":
  * y ~ b0 + b1·x1 + b2·x2, closed-form via the normal equations, no
  * iteration, no driver state.
  *
  * Engine-replayable by the same contract as [[Trend]]: x1, x2, y are
  * INTEGER columns (pre-scaled units), the aggregation accumulates
  * the nine exact integer moments, the 3×3 Cramer determinants
  * expand in exact DECIMAL(38,0) (DuckDB replays them in HUGEINT —
  * both are exact integer algebras), and only the final divisions run
  * in doubles — one fixed IEEE sequence both engines share. Keep
  * per-key moments under ~10^12 so triple products stay inside 38
  * digits; scale units, not row counts.
  *
  * Degenerate keys — fewer than 3 points, or collinear/constant
  * features (zero determinant) — get null coefficients; r² is null
  * when the target has zero variance (0/0 explained is undefined).
  *
  * Scale shape: ONE partial-aggregating hash aggregation of nine
  * integer moments — the cost of a sum, same as [[Trend]]. */
object Regression {

  def fit2(df: DataFrame, keyCols: Seq[String], x1Col: String,
           x2Col: String, yCol: String, roundTo: Int = 6): DataFrame = {
    (keyCols ++ Seq(x1Col, x2Col, yCol)).foreach(c =>
      require(df.columns.contains(c), s"no such column '$c'"))
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    Seq(x1Col, x2Col, yCol).foreach { c =>
      val t = df.schema(c).dataType
      require(t == org.apache.spark.sql.types.LongType ||
        t == org.apache.spark.sql.types.IntegerType,
        s"'$c' must be an integer column (got $t) — exact moments are " +
          "the replayability contract; pre-scale to days/cents/counts")
    }
    val x1 = col(x1Col).cast("long")
    val x2 = col(x2Col).cast("long")
    val y = col(yCol).cast("long")
    val m = df
      .filter(col(x1Col).isNotNull && col(x2Col).isNotNull &&
        col(yCol).isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(x1).as("__s1"), sum(x2).as("__s2"), sum(y).as("__sy"),
        sum(x1 * x1).as("__s11"), sum(x2 * x2).as("__s22"),
        sum(x1 * x2).as("__s12"),
        sum(x1 * y).as("__s1y"), sum(x2 * y).as("__s2y"),
        sum(y * y).as("__syy"))

    val dec = DecimalType(38, 0)
    def d(c: Column): Column = c.cast(dec)
    val n = d(col("n"))
    val s1 = d(col("__s1")); val s2 = d(col("__s2"))
    val sy = d(col("__sy"))
    val s11 = d(col("__s11")); val s22 = d(col("__s22"))
    val s12 = d(col("__s12"))
    val s1y = d(col("__s1y")); val s2y = d(col("__s2y"))
    // 3x3 determinant of [[n s1 s2][s1 s11 s12][s2 s12 s22]] and the
    // three Cramer substitutions, all exact decimal algebra
    def det3(a: Column, b: Column, c: Column,
             dd: Column, e: Column, f: Column,
             g: Column, h: Column, i: Column): Column =
      a * (e * i - f * h) - b * (dd * i - f * g) + c * (dd * h - e * g)
    val det = det3(n, s1, s2, s1, s11, s12, s2, s12, s22)
    val det0 = det3(sy, s1, s2, s1y, s11, s12, s2y, s12, s22)
    val det1 = det3(n, sy, s2, s1, s1y, s12, s2, s2y, s22)
    val det2 = det3(n, s1, sy, s1, s11, s1y, s2, s12, s2y)
    val ok = col("n") >= 3 && det =!= lit(0).cast(dec)
    val b0 = when(ok, det0.cast("double") / det.cast("double"))
    val b1 = when(ok, det1.cast("double") / det.cast("double"))
    val b2 = when(ok, det2.cast("double") / det.cast("double"))
    // r² = 1 − SSE/SST with SSE = Σy² − b0·Σy − b1·Σx1y − b2·Σx2y and
    // SST = Σy² − (Σy)²/n — a fixed double sequence over the exact
    // moments, replayed verbatim by the oracle
    val sstD = col("__syy").cast("double") -
      col("__sy").cast("double") * col("__sy").cast("double") /
        col("n").cast("double")
    val sseD = col("__syy").cast("double") - b0 * col("__sy").cast("double") -
      b1 * col("__s1y").cast("double") - b2 * col("__s2y").cast("double")
    val r2 = when(ok && sstD > 0, lit(1.0) - sseD / sstD)
    val p10 = math.pow(10.0, roundTo)
    def r(c: Column) = floor(c * p10 + 0.5) / p10
    m.select(keyCols.map(col) ++ Seq(col("n"),
      r(b0).as("b0"), r(b1).as("b1"), r(b2).as("b2"),
      r(r2).as("r2")): _*)
  }
}
