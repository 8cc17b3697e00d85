package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pair-prediction quality: precision / recall / F1 of a predicted
  * pair set (dedup candidates, linkage matches, near-dup components)
  * against labeled truth pairs — the evaluation loop every
  * threshold-tuned matcher needs before its cut ships. Pairs are
  * unordered: both frames normalize to (least, greatest) and
  * deduplicate, so direction and repeats in either input cannot skew
  * the counts.
  *
  * Scale shape: two keys-only distinct projections meeting in one
  * full-outer hash-join; the metrics reduce to a single row. Counts
  * are exact integers; P/R/F1 are three identically-spelled double
  * ratios (tie-safely rounded), so the report replays on any engine. */
object PairEval {

  /** @return one row: (n_predicted, n_truth, true_positives, precision,
    *         recall, f1) — precision/recall null when their denominator
    *         is zero, f1 null unless both exist and sum > 0. */
  def score(predicted: DataFrame, truth: DataFrame,
            aCol: String = "id_a", bCol: String = "id_b",
            roundTo: Int = 6): DataFrame = {
    Seq(predicted -> "predicted", truth -> "truth").foreach {
      case (df, name) =>
        require(df.columns.contains(aCol) && df.columns.contains(bCol),
          s"$name needs ($aCol, $bCol), has ${df.columns.mkString(", ")}")
    }
    def norm(df: DataFrame, mark: String) = df
      .where(col(aCol).isNotNull && col(bCol).isNotNull &&
        col(aCol) =!= col(bCol))
      .select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .distinct()
      .withColumn(mark, lit(1L))
    val rf = math.pow(10.0, roundTo)
    def r6(c: org.apache.spark.sql.Column) = floor(c * rf + 0.5) / rf
    val joined = norm(predicted, "__p")
      .join(norm(truth, "__t"), Seq("a", "b"), "full_outer")
      .agg(sum(coalesce(col("__p"), lit(0L))).as("n_predicted"),
        sum(coalesce(col("__t"), lit(0L))).as("n_truth"),
        sum(when(col("__p").isNotNull && col("__t").isNotNull, 1L)
          .otherwise(0L)).as("true_positives"))
    val p = col("true_positives").cast("double") /
      col("n_predicted").cast("double")
    val r = col("true_positives").cast("double") /
      col("n_truth").cast("double")
    joined.select(col("n_predicted"), col("n_truth"),
      col("true_positives"),
      when(col("n_predicted") > 0, r6(p)).as("precision"),
      when(col("n_truth") > 0, r6(r)).as("recall"),
      when(col("n_predicted") > 0 && col("n_truth") > 0 && (p + r) > 0,
        r6(lit(2.0) * p * r / (p + r))).as("f1"))
  }
}
