package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Chi-square feature selection (the Manning-Schütze IR Ch.13 shape):
  * score each (term, label) by the χ² statistic of the 2×2 document
  * contingency — A = labeled docs containing the term, B = other docs
  * containing it, C = labeled docs without it, D = the rest —
  * χ² = N·(AD−BC)² / ((A+B)(C+D)(A+C)(B+D)), and keep the top-k terms
  * per label. This is the classic vocabulary-selection step in front
  * of an NB/linear quality classifier ([[NbClassifier]]): train on the
  * k most label-associated terms instead of the whole vocabulary.
  *
  * Exactness: every contingency cell aggregates as an exact LONG
  * (document-level presence — tokens are `array_distinct`ed per doc
  * before anything counts), and the only double arithmetic is the
  * final closed-form ratio, spelled identically in the SQL oracle, so
  * scores replay bit-for-bit and the (χ² desc, term asc) rank is
  * engine-deterministic.
  *
  * Scale shape: one (doc, distinct-term) explode → a (term, label)
  * count aggregation (map-side combined) + a keys-only (term) df
  * aggregation; label totals and N are a broadcast scalar row (labels
  * are few). The per-label top-k window partitions on label with
  * vocabulary-sized groups — `minDf` is the bound (rare terms drop
  * before the window), the same lever the inverted index uses. */
object FeatureSelect {

  /** (label, rank, term, chi2) — rank 1..k per label; terms present in
    * fewer than `minDf` docs or in EVERY doc (degenerate denominator)
    * are excluded. */
  def chiSquareTerms(docs: DataFrame, idCol: String, textCol: String,
                     labelCol: String, k: Int = 5, minDf: Long = 2,
                     roundTo: Int = 6): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(minDf >= 1, s"minDf must be >= 1, got $minDf")
    val id = col("`" + idCol.replace("`", "``") + "`")
    val toks = docs.select(id.as("__id"), col(labelCol).as("label"),
      explode(array_distinct(Contamination.tokens(col(textCol)))).as("term"))
    val a = toks.groupBy(col("term"), col("label"))
      .agg(count(lit(1)).as("a"))
    val dft = a.groupBy(col("term")).agg(sum(col("a")).as("df"))
    val totals = docs.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("nl"))
    val n = docs.agg(count(lit(1)).as("n"))
    // the contingency must include A = 0 cells (a term absent from a
    // label is still association evidence — symmetric to presence), so
    // the matrix completes as vocabulary × labels (labels are few)
    // with unobserved (term, label) counts defaulting to zero
    val cells = dft
      .filter(col("df") >= minDf)
      .crossJoin(broadcast(totals))
      .join(a, Seq("term", "label"), "left")
      .crossJoin(broadcast(n))
      .filter(col("df") < col("n"))
      .withColumn("a", coalesce(col("a"), lit(0L)))
      .withColumn("b", col("df") - col("a"))
      .withColumn("c", col("nl") - col("a"))
      .withColumn("d", col("n") - col("df") - col("c"))
    // x = AD - BC as an exact BIGINT before the one double cast; the
    // ratio multiplies left-assoc in the SAME order as the oracle SQL
    val x = (col("a") * col("d") - col("b") * col("c")).cast("double")
    val chi2 = col("n").cast("double") * x * x /
      (col("df").cast("double") * (col("c") + col("d")).cast("double") *
        col("nl").cast("double") * (col("b") + col("d")).cast("double"))
    val factor = math.pow(10.0, roundTo)
    val w = Window.partitionBy(col("label"))
      .orderBy(col("chi2").desc, col("term").asc)
    cells
      .withColumn("chi2", floor(chi2 * factor + 0.5) / factor)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("label"), col("rank"), col("term"), col("chi2"))
  }
}
