package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Contingency-table association test: the full observed×expected
  * crosstab of two categorical columns plus the chi-square
  * independence statistic and Cramér's V effect size — "is order
  * status independent of priority", "does event type depend on the
  * user segment", the first question asked of any pair of dimensions.
  *
  * Exactness and engine parity: cell counts and marginals are exact
  * longs; expected = rowTotal·colTotal/n is ONE double division (longs
  * below 2^53 convert exactly). The chi-square sum is the classic
  * cross-engine trap — summing doubles in engine-dependent order
  * drifts in the last bits — so each cell's contribution snaps to
  * fixed point (6dp, floor-half-up) FIRST and the statistic is the
  * exact LONG sum of the snapped contributions, order-independent by
  * construction (documented ≤1e-6-per-cell truncation). Cramér's V
  * derives from the snapped statistic, so it is deterministic too.
  *
  * Scale shape: one map-side-combined groupBy on (a, b) reduces the
  * data to |A|·|B| cells; marginals, the zero-fill cross of the two
  * distinct-value sets, and the statistic all run on that tiny frame
  * (the cross join is dims×dims, the [[RobustStats]] tiny-frame
  * pattern — this is an operator for CATEGORICAL columns, guarded by
  * `maxCategories`). Zero-observed cells are REAL cells (expected > 0
  * contributes evidence), so the crosstab is completed before the
  * statistic, not after. */
object CrossTab {

  private def q(c: String): Column = col("`" + c.replace("`", "``") + "`")

  /** @param aCol,bCol categorical columns (nulls excluded)
    * @param maxCategories loud bound on each side's cardinality
    * @return one row per (a, b) cell of the COMPLETE cross:
    *         (a, b, observed, expected, contribution, chi2, dof, n,
    *         cramers_v) — the last four repeated on every row */
  def chi2(df: DataFrame, aCol: String, bCol: String,
           maxCategories: Int = 10000): DataFrame = {
    Seq(aCol, bCol).foreach(c => require(df.columns.contains(c),
      s"column '$c' not in ${df.columns.mkString(", ")}"))
    require(aCol != bCol, "chi2 needs two distinct columns")
    require(maxCategories >= 2, s"maxCategories must be >= 2")
    val rows = df.where(q(aCol).isNotNull && q(bCol).isNotNull)
    val cells = rows.groupBy(q(aCol), q(bCol))
      .agg(count(lit(1)).as("observed"))
    // cardinality guards fold INTO the kept marginal column — a
    // separate dropped guard column would be pruned away by Catalyst
    // and never fire
    val wAllG = org.apache.spark.sql.expressions.Window.partitionBy()
    def guarded(tot: Column, side: String): Column =
      when(count(lit(1)).over(wAllG) > maxCategories,
        raise_error(lit(s"chi2: '$side' exceeds $maxCategories " +
          "categories — this is a categorical-column operator"))
          .cast("long"))
        .otherwise(tot)
    val aTot = cells.groupBy(q(aCol))
      .agg(sum(col("observed")).as("__ra0"))
      .withColumn("__ra", guarded(col("__ra0"), aCol)).drop("__ra0")
    val bTot = cells.groupBy(q(bCol))
      .agg(sum(col("observed")).as("__rb0"))
      .withColumn("__rb", guarded(col("__rb0"), bCol)).drop("__rb0")
    // complete the crosstab: every (a, b) pair of the distinct sets,
    // zero-filled where unobserved — dims×dims on tiny frames
    val full = aTot.crossJoin(bTot)
      .join(cells, Seq(aCol, bCol), "left")
      .withColumn("observed", coalesce(col("observed"), lit(0L)))
    val n = sum(col("observed")).over(
      org.apache.spark.sql.expressions.Window.partitionBy())
    val expected = (col("__ra").cast("double") * col("__rb").cast("double")) /
      n.cast("double")
    val contrib = (col("observed").cast("double") - expected) *
      (col("observed").cast("double") - expected) / expected
    val snapped = full
      .withColumn("__n", n)
      .withColumn("expected", floor(expected * lit(1e6) + lit(0.5)) / lit(1e6))
      // snap BEFORE summing: the statistic becomes an exact long sum
      .withColumn("__ci", floor(contrib * lit(1e6) + lit(0.5)).cast("long"))
      .withColumn("contribution", col("__ci").cast("double") / lit(1e6))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    val rCats = size(collect_set(q(aCol)).over(wAll))
    val cCats = size(collect_set(q(bCol)).over(wAll))
    val chi2Scaled = sum(col("__ci")).over(wAll)
    val dof = (rCats - 1).cast("long") * (cCats - 1).cast("long")
    val minSide = least(rCats - 1, cCats - 1).cast("double")
    val chi2V = chi2Scaled.cast("double") / lit(1e6)
    snapped
      .withColumn("chi2", chi2V)
      .withColumn("dof", dof)
      .withColumn("n", col("__n"))
      .withColumn("cramers_v", when(minSide > 0 && col("__n") > 0,
        floor(sqrt(chi2V / (col("__n").cast("double") * minSide)) *
          lit(1e6) + lit(0.5)) / lit(1e6)))
      .select(q(aCol), q(bCol), col("observed"), col("expected"),
        col("contribution"), col("chi2"), col("dof"), col("n"),
        col("cramers_v"))
  }
}
