package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF keyword extraction: the k most characteristic terms per
  * document, scored `tf × ln(N / df)` against the corpus itself. The
  * training-data curation uses: per-document keyword signatures for
  * clustering/routing, and a cheap "is this page about anything"
  * signal (all-boilerplate pages have no high-idf terms).
  *
  * Tokenizer: the shared text-family convention
  * ([[Contamination.tokens]] — lowercase, `\W+` split, empties
  * dropped), so scores line up with the LM/contamination operators and
  * the oracle replay.
  *
  * Scale shape: explode → (doc, term) tf aggregation (map-side
  * combined), a keys-only (term, df) aggregation, one term-keyed join
  * of the two narrow frames (text never rides any of it), corpus size
  * joins in as a broadcast scalar, and the per-document top-k is a
  * window over doc-sized groups (bounded by document length — no hot
  * group can exist). Ties: same-(tf, df) terms score identical bits in
  * any engine; rank breaks by term ascending, so output is
  * deterministic cross-engine. */
object TfIdf {

  /** (idCol, rank, term, tf, score) — rank 1..k per document, score
    * rounded to `roundTo` for cross-engine comparison. */
  def topTerms(docs: DataFrame, idCol: String, textCol: String,
               k: Int = 3, roundTo: Int = 6): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val id = col("`" + idCol.replace("`", "``") + "`")
    val tf = docs
      .select(id.as("__id"),
        explode(Contamination.tokens(col(textCol))).as("term"))
      .groupBy(col("__id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("__n"))
    val scored = tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("score",
        col("tf") * log(col("__n").cast("double") / col("df")))
    val w = Window.partitionBy(col("__id"))
      .orderBy(col("score").desc, col("term").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("__id").as(idCol), col("rank"),
        col("term"), col("tf"), round(col("score"), roundTo).as("score"))
  }
}
