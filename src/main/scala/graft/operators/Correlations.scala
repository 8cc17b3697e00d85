package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Pairwise Pearson correlation matrix in ONE aggregation pass, exact
  * by construction: every moment (Σx, Σx², Σxy) accumulates as
  * DECIMAL(38,scale) — exact for fixed-point inputs regardless of
  * partitioning or summation order — and the final correlation
  * arithmetic runs on doubles derived from those exact sums, so any
  * IEEE engine replays bit-identical values (same trick as the
  * numeric-profile operator's mean/stddev). The built-in `corr`
  * aggregate instead accumulates running doubles whose low bits depend
  * on partition merge order — fine for analytics, unverifiable against
  * an oracle hash.
  *
  * Scale shape: k columns need k(k+1)/2 + k + 1 aggregates, all
  * map-side-partial in the SAME single pass over the table (one tiny
  * result row), then a driver-free inline() projection unpivots the
  * pair list. Complete-case semantics: rows with a null in ANY
  * requested column are dropped first (documented; pairwise-complete
  * would need per-pair counts and is not what a training-feature
  * screen wants).
  *
  * Zero-variance columns yield NULL correlations (0/0), not NaN —
  * pinned in the spec. */
object Correlations {

  private def q(c: String): Column = col("`" + c.replace("`", "``") + "`")

  def matrix(df: DataFrame, cols: Seq[String], scale: Int = 8): DataFrame = {
    require(cols.size >= 2, "correlation matrix needs at least two columns")
    require(cols.distinct.size == cols.size,
      s"duplicate columns in ${cols.mkString(", ")}")
    val dec = DecimalType(38, scale)
    val complete = df.select(cols.map(q): _*).na.drop()
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    val aggs =
      count(lit(1)).as("__n") +:
        (cols.flatMap(c => Seq(
          sum(q(c).cast(dec)).as(s"__s_$c"),
          sum((q(c) * q(c)).cast(dec)).as(s"__ss_$c"))) ++
          pairs.map { case (a, b) =>
            sum((q(a) * q(b)).cast(dec)).as(s"__sp_${a}__$b")
          })
    val one = complete.agg(aggs.head, aggs.tail: _*)
    def corrCol(a: String, b: String): Column = {
      val n = col("__n").cast("double")
      val sa = col(s"__s_$a").cast("double")
      val sb = col(s"__s_$b").cast("double")
      val ssa = col(s"__ss_$a").cast("double")
      val ssb = col(s"__ss_$b").cast("double")
      val sp = col(s"__sp_${a}__$b").cast("double")
      val num = n * sp - sa * sb
      val den = sqrt(n * ssa - sa * sa) * sqrt(n * ssb - sb * sb)
      when(den =!= 0.0, num / den)
    }
    val rows = pairs.map { case (a, b) =>
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        corrCol(a, b).as("corr"))
    }
    one.select(inline(array(rows: _*))).orderBy(col("col_a"), col("col_b"))
  }

  /** [[matrix]] for FIXED-POINT inputs (prices in cents, quantities,
    * basis points): each column is scaled by 10^digits and rounded to
    * a LONG first, so every moment accumulates as a DECIMAL(38,0) sum
    * of long×long products — value × 10^16 in the (38,8) path exceeds
    * Spark's compact long-backed Decimal range and every add takes the
    * BigDecimal slow path, while scaled-integer moments stay
    * long-backed end to end (the [[Trend]] trick; measured ~3× on the
    * 600k-row correlation query). Same exactness contract: the sums
    * are order-independent integers, the final double formula replays
    * bit-identically in any engine.
    *
    * Pearson correlation is invariant under positive per-column
    * scaling, so the output equals [[matrix]]'s up to the caller's
    * own rounding claim: `digits` must cover the true precision of
    * the column (a 2dp price needs digits >= 2) or the excess
    * precision is rounded away — a documented contract, not drift,
    * because any replaying engine rounds identically.
    *
    * DECIMAL(38,0) rather than raw LONG sums: Σ(cents²) overflows
    * 2^63 already at ~10^6 rows of 10^5-unit prices; the decimal
    * accumulator is exact to 10^38 (≈10^10 exabyte-scale rows) and
    * its inputs stay compact. */
  def matrixFixedPoint(df: DataFrame, colDigits: Seq[(String, Int)]): DataFrame = {
    require(colDigits.size >= 2, "correlation matrix needs at least two columns")
    val cols = colDigits.map(_._1)
    require(cols.distinct.size == cols.size,
      s"duplicate columns in ${cols.mkString(", ")}")
    require(colDigits.forall { case (_, d) => d >= 0 && d <= 9 },
      "digits must be in [0, 9] — scale the units, not the row count")
    val dec0 = DecimalType(38, 0)
    val scaled = df.select(colDigits.map { case (c, d) =>
      round(q(c) * lit(math.pow(10.0, d))).cast("long").as(c)
    }: _*).na.drop()
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    val aggs =
      count(lit(1)).as("__n") +:
        (cols.flatMap(c => Seq(
          sum(q(c).cast(dec0)).as(s"__s_$c"),
          sum((q(c) * q(c)).cast(dec0)).as(s"__ss_$c"))) ++
          pairs.map { case (a, b) =>
            sum((q(a) * q(b)).cast(dec0)).as(s"__sp_${a}__$b")
          })
    val one = scaled.agg(aggs.head, aggs.tail: _*)
    def corrCol(a: String, b: String): Column = {
      val n = col("__n").cast("double")
      val sa = col(s"__s_$a").cast("double")
      val sb = col(s"__s_$b").cast("double")
      val ssa = col(s"__ss_$a").cast("double")
      val ssb = col(s"__ss_$b").cast("double")
      val sp = col(s"__sp_${a}__$b").cast("double")
      val num = n * sp - sa * sb
      val den = sqrt(n * ssa - sa * sa) * sqrt(n * ssb - sb * sb)
      when(den =!= 0.0, num / den)
    }
    val rows = pairs.map { case (a, b) =>
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        corrCol(a, b).as("corr"))
    }
    one.select(inline(array(rows: _*))).orderBy(col("col_a"), col("col_b"))
  }
}
