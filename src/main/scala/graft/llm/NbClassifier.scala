package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes text classifier — the trainable half of the
  * classifier-based curation step (GPT-3's LR quality filter, CCNet's
  * fastText language filter): train on a labeled seed, score the whole
  * corpus, keep/route documents by predicted class. Unlike the unigram/
  * bigram LM scorers (corpus-relative likelihood), this is a
  * DISCRIMINATIVE signal: per-class token likelihoods + document
  * priors, argmax over classes.
  *
  * Model: P(w|c) = (cnt(w,c) + α) / (tok(c) + α·(|V|+1)) over the
  * top-`vocabSize` corpus vocabulary (deterministic count-desc/word-asc
  * cut), with the +1 pseudo-word absorbing out-of-vocabulary mass —
  * an unseen-in-class vocab word and a true OOV token get the same
  * smoothed floor, so the scorer needs no per-word special cases.
  * Priors are document-frequency: P(c) = docs(c) / docs.
  *
  * Scale shape: training is two narrow aggregations over the exploded
  * token stream (keys only — text never rides a shuffle) with a
  * deterministic TakeOrdered vocabulary cut; the model is
  * (vocab × classes) rows, bounded by construction so it stays
  * BROADCASTABLE. Scoring pivots the model wide — ONE likelihood
  * column per class, one row per vocab word — so each corpus token
  * joins the broadcast once (no ×classes row blowup) and a single
  * groupBy(id) sums per-class scores. Class count is assumed small
  * (the pivot and the collected stats are both |classes|-bounded). */
object NbClassifier {

  /** Same tokenizer as the whole text family: lowercase, `\W+` split,
    * empties dropped. */
  private def tokens(text: Column) = Contamination.tokens(text)

  private def colQ(c: String): Column =
    col("`" + c.replace("`", "``") + "`")

  /** Train on rows with a non-null label. Returns
    * `(model, classStats)`:
    * model = `(word, label, log_lik)` for every (vocab word, class)
    * pair OBSERVED in that class — absent pairs score the class's
    * `oov_log_lik` floor, which equals the smoothed-zero likelihood;
    * classStats = `(label, log_prior, oov_log_lik)`, one row per
    * class. Deterministic on any cluster: the vocabulary cut is a
    * total order (count desc, word asc). `tokenizer` swaps the
    * feature extractor (default: the family's lowercase `\W+` word
    * split; [[LangId]] passes char n-grams). */
  def train(df: DataFrame, textCol: String, labelCol: String,
            vocabSize: Int = 5000,
            smoothing: Double = 1.0,
            tokenizer: Column => Column = tokens): (DataFrame, DataFrame) = {
    require(vocabSize >= 1, s"vocabSize must be >= 1: $vocabSize")
    require(smoothing > 0.0, s"smoothing must be > 0: $smoothing")
    val labeled = df.where(colQ(labelCol).isNotNull)
    val toks = labeled.select(colQ(labelCol).as("label"),
      explode(tokenizer(colQ(textCol))).as("word"))
    val vocab = toks.groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word")).limit(vocabSize)
      .select("word")
    // bounded action: |vocab| caps at vocabSize; training is a
    // multi-job operation by nature (the cut must exist before the
    // denominators do)
    val vCount = vocab.count()
    val classCnt = toks
      .join(broadcast(vocab), Seq("word"), "left_semi")
      .groupBy("label", "word").agg(count(lit(1)).as("cnt"))
    val denom = col("tokc") + lit(smoothing) * lit(vCount.toDouble + 1.0)
    // classes whose docs contain zero vocab tokens still get stats
    // rows (tokc = 0) — their scores degrade to prior + OOV floors
    val tokc = classCnt.groupBy("label").agg(sum("cnt").as("tokc"))
    val docs = labeled.groupBy(colQ(labelCol).as("label"))
      .agg(count(lit(1)).as("ndocs"))
    val stats = docs.join(tokc, Seq("label"), "left")
      .withColumn("tokc", coalesce(col("tokc"), lit(0L)).cast("double"))
      .withColumn("__tot",
        sum("ndocs").over(org.apache.spark.sql.expressions.Window
          .partitionBy(lit(1))))
      .select(col("label"),
        log(col("ndocs").cast("double") / col("__tot").cast("double"))
          .as("log_prior"),
        log(lit(smoothing) / denom).as("oov_log_lik"))
    val model = classCnt
      .join(stats.select(col("label"), col("oov_log_lik")), Seq("label"))
      .join(tokc, Seq("label"))
      .select(col("word"), col("label"),
        log((col("cnt") + lit(smoothing)) /
          (col("tokc").cast("double") +
            lit(smoothing) * lit(vCount.toDouble + 1.0))).as("log_lik"))
    (model, stats)
  }

  /** Score every document: `score_<label>` = log_prior + Σ per-token
    * log-likelihood (vocab hit → trained value, miss → the class's
    * OOV floor), `predicted` = argmax with ties to the
    * alphabetically-first class. Token-less documents score prior-only
    * and predict the max-prior class. One corpus pass: exploded tokens
    * left-join the BROADCAST wide model, one groupBy(id). */
  def score(df: DataFrame, idCol: String, textCol: String,
            model: DataFrame, classStats: DataFrame,
            roundTo: Int = 6): DataFrame = {
    Guards.requireFreshColumns(df, Seq("word", "n_tokens", "predicted"),
      "NbClassifier.score")
    // |classes| rows — bounded by the classifier's contract
    val st = classStats.select("label", "log_prior", "oov_log_lik")
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    require(st.nonEmpty, "classStats is empty — train() saw no labels")
    val labels = st.map(_._1).toSeq
    val wide = model.groupBy("word")
      .pivot("label", labels).agg(first("log_lik"))
    val tok = df.select(colQ(idCol),
        explode_outer(tokens(colQ(textCol))).as("word"))
      .join(broadcast(wide), Seq("word"), "left")
    val sumAggs = st.map { case (l, _, oov) =>
      sum(when(col("word").isNotNull, coalesce(colQ(l), lit(oov))))
        .as(s"__s_$l")
    }.toSeq
    val aggs = count(col("word")).as("n_tokens") +: sumAggs
    val scored = tok.groupBy(colQ(idCol)).agg(aggs.head, aggs.tail: _*)
    // full (unrounded) scores drive the argmax so both engines break
    // near-ties identically; ties prefer the earlier (asc) label
    val full = st.map { case (l, prior, _) =>
      l -> (lit(prior) + coalesce(col(s"__s_$l"), lit(0.0)))
    }
    val predicted = full.tail.foldLeft(
      (full.head._2, lit(full.head._1).as("p"))) {
      case ((bestS, bestL), (l, s)) =>
        (when(s > bestS, s).otherwise(bestS),
          when(s > bestS, lit(l)).otherwise(bestL))
    }._2
    val scoreCols = full.map { case (l, s) =>
      round(s, roundTo).as(s"score_$l")
    }.toSeq
    scored.select(colQ(idCol) +: col("n_tokens") +: scoreCols :+
      predicted.as("predicted"): _*)
  }
}
