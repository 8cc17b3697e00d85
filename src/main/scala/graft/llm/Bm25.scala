package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Okapi BM25 retrieval scoring (Robertson et al., TREC-3): rank
  * documents against a small literal query-term set — the standard
  * lexical-retrieval primitive a curation pipeline uses for targeted
  * corpus slicing ("pull the docs about X for the domain-balance
  * audit") and as the sparse half of hybrid sparse+dense retrieval
  * next to the ANN operators.
  *
  * Tokenizer: the shared text-family convention
  * ([[Contamination.tokens]] — lowercase, `\W+` split, empties
  * dropped), so document length and term frequencies line up with the
  * TF-IDF/LM operators and the oracle replay.
  *
  * Scale shape: per-document tf for each query term is a codegen'd
  * array `filter`/`size` projection over the tokens — the query set is
  * tiny and LITERAL, so there is NO explode and NO (doc, term)
  * shuffle; corpus statistics (N, avgdl, per-term df) reduce to ONE
  * aggregate row broadcast back (the RobustStats one-row-stats
  * pattern). Total cost: one narrow scan + one scalar aggregate —
  * survives 100 TB trivially. For large query VOCABULARIES (thousands
  * of terms) use [[TfIdf]]/[[Indexing]]-style explode joins instead;
  * the literal-terms cap is enforced loudly. */
object Bm25 {

  private val MaxQueryTerms = 64

  /** (idCol, score) for documents matching at least one query term,
    * rounded tie-safely (floor-half-up) to `roundTo` decimals.
    * idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)) — the Lucene/ATIRE
    * non-negative variant; tf component uses k1 = saturation,
    * b = length normalization against the corpus mean length. */
  def score(docs: DataFrame, idCol: String, textCol: String,
            queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
            roundTo: Int = 6): DataFrame = {
    require(queryTerms.nonEmpty, "BM25 needs at least one query term")
    require(queryTerms.size <= MaxQueryTerms,
      s"BM25 literal query capped at $MaxQueryTerms terms " +
        s"(got ${queryTerms.size}) — use the inverted-index/TF-IDF " +
        "explode path for large vocabularies")
    val terms = queryTerms.map(_.toLowerCase).distinct
    val id = col("`" + idCol.replace("`", "``") + "`")
    val toks = docs.select(id.as("__id"),
      Contamination.tokens(col(textCol)).as("__toks"))
    def tf(t: String): Column =
      size(filter(col("__toks"), x => x === lit(t)))
    val perDoc = toks.select(
      (col("__id") +: size(col("__toks")).cast("double").as("__dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          tf(t).cast("double").as(s"__tf$i")
        }): _*)
    // ONE corpus-stats row: N, avgdl, df per term — broadcast back.
    // All moments aggregate as EXACT integers (token counts, doc
    // counts); the only division happens once, on the final scalars —
    // so avgdl is the identical IEEE double in any engine regardless of
    // partial-sum order (the q_numeric_profile exact-moments trick)
    val stats0 = perDoc.agg(
      count(lit(1)).as("__cnt"),
      (sum(col("__dl").cast("long")).as("__sdl")) +:
        terms.indices.map(i =>
          sum(when(col(s"__tf$i") > 0, 1L).otherwise(0L)).as(s"__dfL$i")): _*)
    val stats = stats0.select(
      (col("__cnt").cast("double").as("__n")) +:
        ((col("__sdl").cast("double") / col("__cnt").cast("double"))
          .as("__avgdl")) +:
        terms.indices.map(i =>
          col(s"__dfL$i").cast("double").as(s"__df$i")): _*)
    val scoreExpr = terms.indices.map { i =>
      val idf = log(lit(1.0) +
        (col("__n") - col(s"__df$i") + 0.5) / (col(s"__df$i") + 0.5))
      val denom = col(s"__tf$i") +
        lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl"))
      idf * (col(s"__tf$i") * lit(k1 + 1.0)) / denom
    }.reduce(_ + _)
    val factor = math.pow(10.0, roundTo)
    perDoc.crossJoin(broadcast(stats))
      .withColumn("score", floor(scoreExpr * factor + 0.5) / factor)
      .filter(terms.indices.map(i => col(s"__tf$i") > 0).reduce(_ || _))
      .select(col("__id").as(idCol), col("score"))
  }
}
