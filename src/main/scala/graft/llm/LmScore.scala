package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained unigram language-model scoring — the
  * perplexity-style quality signal (CCNet-style filtering, reduced to
  * the unigram model that needs no external artifacts): documents made
  * of common corpus vocabulary score high, gibberish and
  * out-of-distribution text score low. `avg_logprob` is the mean
  * ln P(w) over the document's token occurrences, with P(w) = count(w)
  * / total corpus tokens for the top-`vocabSize` vocabulary and a
  * 1/total floor for everything out of vocabulary.
  *
  * Scale shape: training is one narrow (word, count) aggregation (the
  * token stream explodes to keys only) with a deterministic
  * TakeOrdered vocabulary cut (count desc, word asc); scoring is one
  * corpus pass whose exploded tokens LEFT-join the BROADCAST
  * vocabulary — at web scale the vocabulary is pruned to `vocabSize`
  * precisely so it stays broadcastable.
  */
object LmScore {

  /** Word-occurrence stream (lowercase, `\W+` split, empties dropped) —
    * the same tokenizer as the whole text family. */
  private def tokens(text: org.apache.spark.sql.Column) =
    Contamination.tokens(text)

  /** `(word, cnt)` for the `vocabSize` most frequent corpus words,
    * ties broken by word — deterministic on any cluster. */
  def unigramVocab(df: DataFrame, textCol: String,
                   vocabSize: Int = 5000): DataFrame = {
    require(vocabSize >= 1, s"vocabSize must be >= 1: $vocabSize")
    df.select(explode(tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word"))
      .limit(vocabSize)
  }

  /** Total token occurrences in the corpus — the model's denominator.
    * One narrow aggregation job. */
  def totalTokens(df: DataFrame, textCol: String): Long =
    df.select(sum(size(tokens(col(textCol)))).as("n"))
      .head.getAs[Long]("n")

  /** Per-document `n_tokens` and `avg_logprob` against a trained
    * `vocab` (from [[unigramVocab]]) and denominator `total` (from
    * [[totalTokens]]). Token-less documents stay in the report as
    * 0 / 0.0. */
  def score(df: DataFrame, idCol: String, textCol: String,
            vocab: DataFrame, total: Long, roundTo: Int = 6): DataFrame = {
    require(total >= 1, s"total tokens must be >= 1: $total")
    Guards.requireFreshColumns(df,
      Seq("word", "cnt", "n_tokens", "avg_logprob"), "LmScore.score")
    val lp = log(coalesce(col("cnt"), lit(1L)).cast("double") /
      lit(total.toDouble))
    df.select(col(idCol), explode_outer(tokens(col(textCol))).as("word"))
      .join(broadcast(vocab), Seq("word"), "left")
      .groupBy(col(idCol))
      .agg(count(col("word")).as("n_tokens"),
        avg(when(col("word").isNotNull, lp)).as("__alp"))
      .select(col(idCol), col("n_tokens"),
        coalesce(round(col("__alp"), roundTo), lit(0.0)).as("avg_logprob"))
  }
}
