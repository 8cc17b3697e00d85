package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Leave-one-out target encoding with additive smoothing — the
  * high-cardinality categorical feature every tabular-ML pipeline
  * reaches for (CatBoost's headline trick, the Kaggle staple): replace
  * a category with the mean target of the OTHER rows in that category,
  * shrunk toward the global prior. Leave-one-out is the leakage
  * control: a row must not see its own label through its feature, or
  * validation scores lie; smoothing (`m` pseudo-observations of the
  * prior) is the rare-category control: a 1-row category would
  * otherwise encode to pure noise (and under LOO to an empty mean).
  *
  *   enc(row) = (Σ_cat y − y_row + m·prior) / (n_cat − 1 + m)
  *
  * Singleton categories (n_cat = 1) degrade to exactly `prior` —
  * continuous with the formula at m > 0, well-defined at any m.
  *
  * Determinism: target sums aggregate as exact DECIMAL(38,6) (order
  * independent across any partitioning), the prior is one such global
  * sum, and the final division is a single double op rounded
  * tie-safely — bit-identical on any engine.
  *
  * Scale shape: ONE hash exchange on the category (per-category sum +
  * count via window); the global prior is a broadcast single-row
  * cross join. No per-category collect — cardinality is unbounded by
  * design (that is the point of target encoding). */
object TargetEncode {

  private def q(c: String): Column = col("`" + c.replace("`", "``") + "`")

  /** Input plus `<outCol>`: the LOO-smoothed encoding of `catCol`
    * against numeric `yCol`. Null targets are excluded from sums AND
    * counts (they carry no label signal); null categories form their
    * own group (SQL GROUP BY semantics). */
  def looEncode(df: DataFrame, catCol: String, yCol: String,
                smoothing: Double = 20.0, roundTo: Int = 6,
                outCol: String = "target_enc"): DataFrame = {
    require(smoothing > 0.0, s"smoothing must be > 0: $smoothing")
    require(roundTo >= 0 && roundTo <= 9, s"roundTo in [0,9]: $roundTo")
    graft.llm.Guards.requireFreshColumns(df,
      Seq(outCol, "__te_y", "__te_sum", "__te_n", "__te_gs", "__te_gn"),
      "TargetEncode.looEncode")
    val dec = org.apache.spark.sql.types.DecimalType(38, 6)
    val y = q(yCol).cast(dec)
    val wCat = Window.partitionBy(q(catCol))
    val globals = df.agg(
      sum(q(yCol).cast(dec)).as("__te_gs"),
      count(q(yCol)).as("__te_gn"))
    val rf = math.pow(10.0, roundTo)
    val prior = col("__te_gs").cast("double") / col("__te_gn")
    val encoded = df
      .withColumn("__te_y", y)
      .withColumn("__te_sum", sum(col("__te_y")).over(wCat))
      .withColumn("__te_n", count(col("__te_y")).over(wCat))
      .crossJoin(broadcast(globals))
    val looSum = coalesce(col("__te_sum"), lit(0).cast(dec)) -
      coalesce(col("__te_y"), lit(0).cast(dec))
    val looN = col("__te_n") - when(col("__te_y").isNotNull, 1L)
      .otherwise(0L)
    encoded
      .withColumn(outCol,
        // a corpus with no labels at all has no prior — NULL encoding
        // beats a NaN that poisons downstream arithmetic silently
        when(col("__te_gn") > 0,
          floor((looSum.cast("double") + lit(smoothing) * prior) /
            (looN + lit(smoothing)) * rf + 0.5) / rf)
          .otherwise(lit(null).cast("double")))
      .drop("__te_y", "__te_sum", "__te_n", "__te_gs", "__te_gn")
  }
}
