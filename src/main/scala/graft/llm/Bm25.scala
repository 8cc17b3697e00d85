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

  /** Pseudo-relevance-feedback query expansion (Rocchio-family, with
    * Robertson's offer-weight term selection): run the original query,
    * ASSUME the top `fbDocs` results are relevant, and propose the
    * `fbTerms` terms most characteristic of that feedback set —
    * `weight(t) = r_t · idf(t)` where `r_t` is the number of feedback
    * docs containing `t` and idf is the same Lucene-variant BM25 idf.
    * The expanded query (original terms + proposals) re-enters
    * [[score]]; the classic recall lever when the user's phrasing
    * misses the corpus's vocabulary.
    *
    * Determinism: feedback docs are the top `fbDocs` by (rounded score
    * desc, id asc); weights are an exact integer count times one log,
    * rounded tie-safely (floor-half-up); the final rank breaks ties on
    * the term. Every step replays on any engine.
    *
    * Scale shape: the feedback set is k-BOUNDED before anything else
    * touches it (TakeOrderedAndProject — no corpus sort), so the
    * candidate vocabulary is bounded by `fbDocs` documents' distinct
    * tokens and broadcasts; corpus `df` for candidates is one
    * projection pass whose explode is filtered by that broadcast
    * BEFORE the (term)-keys-only aggregation shuffles. N rides the
    * stats row. No (doc, term) shuffle of the whole corpus.
    *
    * @return (term, r_fb, tf_fb, df, weight, rank) — `rank` 1..fbTerms
    *         by (weight desc, term asc); original query terms excluded. */
  def expandQuery(docs: DataFrame, idCol: String, textCol: String,
                  queryTerms: Seq[String], fbDocs: Int = 10,
                  fbTerms: Int = 10, k1: Double = 1.2, b: Double = 0.75,
                  roundTo: Int = 6): DataFrame = {
    require(fbDocs >= 1, s"fbDocs must be >= 1: $fbDocs")
    require(fbTerms >= 1, s"fbTerms must be >= 1: $fbTerms")
    val terms = queryTerms.map(_.toLowerCase).distinct
    val id = col("`" + idCol.replace("`", "``") + "`")
    val fb = score(docs, idCol, textCol, queryTerms, k1, b, roundTo)
      .orderBy(col("score").desc, id.asc)
      .limit(fbDocs)
      .select(id.as("__fbid"))
    // candidate stats from the (tiny) feedback set: r_fb = docs
    // containing the term, tf_fb = total occurrences
    val fbToks = docs.join(broadcast(fb), id === col("__fbid"))
      .select(id.as("__id"),
        explode(Contamination.tokens(col(textCol))).as("term"))
      .filter(!col("term").isin(terms: _*))
    val cand = fbToks.groupBy(col("term"))
      .agg(countDistinct(col("__id")).as("r_fb"),
        count(lit(1)).as("tf_fb"))
    // corpus df restricted to the broadcast candidate vocabulary: the
    // explode is a projection; only candidate hits reach the shuffle
    val dfs = docs
      .select(explode(array_distinct(
        Contamination.tokens(col(textCol)))).as("term"))
      .join(broadcast(cand.select(col("term"))), Seq("term"), "left_semi")
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("__n"))
    val factor = math.pow(10.0, roundTo)
    val idf = log(lit(1.0) +
      (col("__n").cast("double") - col("df").cast("double") + 0.5) /
        (col("df").cast("double") + 0.5))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("weight").desc, col("term").asc)
    cand.join(dfs, Seq("term")).crossJoin(broadcast(n))
      .withColumn("weight",
        floor(col("r_fb").cast("double") * idf * factor + 0.5) / factor)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= fbTerms)
      .select(col("term"), col("r_fb"), col("tf_fb"), col("df"),
        col("weight"), col("rank"))
  }
}
