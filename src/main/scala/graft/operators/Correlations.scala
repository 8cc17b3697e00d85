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
}
