package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Character-n-gram language identification — the fastText/CCNet
  * signal, built from this engine's own pieces: [[NbClassifier]]'s
  * multinomial NB trained over char 2-3-grams instead of words. Word
  * features (stopword ratios, script profiles) are weak on SHORT or
  * informal documents — a 6-word tweet may contain no stopword at all —
  * while character n-grams ("th", "sch", "ción") carry the
  * language signal at any length; this is why fastText's lang-id model
  * ships char-n-gram features.
  *
  * Training reuses [[NbClassifier.train]] verbatim (distributed gram
  * counting, deterministic vocab cut, smoothed likelihoods) with the
  * tokenizer swapped to [[charNgrams]].
  *
  * Scoring is deliberately NOT the explode+groupBy shape: the trained
  * model is BOUNDED by construction (vocabSize × |classes| rows), so
  * [[scoreExprs]] compiles it into literal in-plan maps and scores each
  * document with one `aggregate` over its gram array — a pure PER-ROW
  * projection. That buys two things at 100 TB: no shuffle at all on
  * the scoring pass (the explode shape shuffles one row per token for
  * the groupBy), and structural batch/stream parity — the same Column
  * works in a streaming micro-batch, which is what lets the curation
  * pipeline's `lang_id:` stage run in `mode: stream` unchanged.
  *
  * Determinism: gram arrays are generated in document order and
  * `aggregate` folds sequentially, so per-document scores are one fixed
  * double sequence; the argmax runs on unrounded scores with ties to
  * the alphabetically-first label (same contract as NbClassifier). */
object LangId {

  /** Lowercased character n-grams for each n (default 2 and 3),
    * concatenated in ascending-n order, each n's grams in document
    * order. Text shorter than n contributes no n-grams (empty array,
    * never a descending `sequence`). Spaces are kept — " t" vs "t "
    * is real boundary signal, exactly as fastText keeps it. */
  def charNgrams(text: Column, ns: Seq[Int] = Seq(2, 3)): Column = {
    require(ns.nonEmpty && ns.forall(_ >= 1),
      s"charNgrams needs n >= 1: $ns")
    val norm = lower(text)
    val parts = ns.map { n =>
      when(length(norm) >= n,
          transform(sequence(lit(1), length(norm) - lit(n - 1)),
            i => norm.substr(i, lit(n))))
        .otherwise(array().cast("array<string>"))
    }
    if (parts.size == 1) parts.head else concat(parts: _*)
  }

  /** [[NbClassifier.train]] over char n-grams. Model frames have the
    * same contract: (word=gram, label, log_lik) + (label, log_prior,
    * oov_log_lik). */
  def train(df: DataFrame, textCol: String, labelCol: String,
            vocabSize: Int = 2000, smoothing: Double = 1.0,
            ns: Seq[Int] = Seq(2, 3)): (DataFrame, DataFrame) =
    NbClassifier.train(df, textCol, labelCol, vocabSize, smoothing,
      tokenizer = charNgrams(_, ns))

  /** Compile the bounded model into per-class score Columns over a
    * PREPARED gram-array column: (labels asc, score exprs). One
    * bounded driver collect — vocabSize × |classes| rows, the
    * documented model-table family — then everything is literal
    * in-plan state: `score_c = prior_c + aggregate(grams, Σ
    * coalesce(map_c[gram], oov_c))`.
    *
    * Callers MUST bind these to real columns in one projection and
    * compute the argmax over the column REFERENCES in a second: an
    * argmax built directly over the aggregate expressions duplicates
    * each one 2^|classes| times through the when-fold (measured: the
    * inlined form ran 170s where the two-projection form runs in
    * single-digit seconds at the same scale). */
  def scoreExprs(grams: Column, model: DataFrame, classStats: DataFrame)
      : (Seq[String], Seq[Column]) = {
    val st = classStats.select("label", "log_prior", "oov_log_lik")
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    require(st.nonEmpty, "classStats is empty — train() saw no labels")
    // bounded by the train() contract: at most vocabSize rows per class
    val lik: Map[String, Map[String, Double]] = model
      .select("label", "word", "log_lik").collect()
      .groupBy(_.getString(0))
      .map { case (l, rows) =>
        l -> rows.map(r => r.getString(1) -> r.getDouble(2)).toMap
      }
    val scores = st.map { case (l, prior, oov) =>
      val m = lik.getOrElse(l, Map.empty)
      val table =
        if (m.isEmpty) lit(null).cast("map<string,double>")
        else typedlit(m)
      aggregate(grams, lit(prior),
        (acc, g) => acc + coalesce(element_at(table, g), lit(oov)))
    }
    (st.map(_._1).toSeq, scores.toSeq)
  }

  /** Argmax over ALREADY-MATERIALIZED score columns, ties to the
    * first label (labels must be ascending — train/scoreExprs emit
    * them sorted). */
  private def argmax(labeled: Seq[(String, Column)]): Column =
    labeled.tail.foldLeft((labeled.head._2, lit(labeled.head._1))) {
      case ((bestS, bestL), (l, s)) =>
        (when(s > bestS, s).otherwise(bestS),
          when(s > bestS, lit(l)).otherwise(bestL))
    }._2

  /** Internal: (df + __lang_grams/__lang_s_<label> columns, labels). */
  private def scored(df: DataFrame, textCol: String, model: DataFrame,
                     classStats: DataFrame): (DataFrame, Seq[String]) = {
    Guards.requireFreshColumns(df, Seq("__lang_grams"), "LangId")
    val withGrams = df.withColumn("__lang_grams",
      charNgrams(col(textCol)))
    val (labels, scores) =
      scoreExprs(col("__lang_grams"), model, classStats)
    val bound = labels.zip(scores).foldLeft(withGrams) {
      case (d, (l, s)) => d.withColumn(s"__lang_s_$l", s)
    }
    (bound, labels)
  }

  /** Gate/report surface: id + n_grams + per-class rounded scores +
    * `lang_id` (argmax, unrounded, ties to first label asc). Pure
    * per-row projections — no shuffle, streams unchanged. */
  def scoreAll(df: DataFrame, idCol: String, textCol: String,
               model: DataFrame, classStats: DataFrame,
               roundTo: Int = 6): DataFrame = {
    val (bound, labels) = scored(df, textCol, model, classStats)
    val scoreCols = labels.map(l =>
      round(col(s"__lang_s_$l"), roundTo).as(s"score_$l"))
    val predicted = argmax(labels.map(l => l -> col(s"__lang_s_$l")))
    bound.select(col(idCol) +:
      size(col("__lang_grams")).cast("long").as("n_grams") +:
      scoreCols :+ predicted.as("lang_id"): _*)
  }

  /** Append one `outCol` column with the predicted language — the
    * pipeline-stage form (keeps every input column). */
  def label(df: DataFrame, textCol: String, model: DataFrame,
            classStats: DataFrame, outCol: String = "lang_id"): DataFrame = {
    Guards.requireFreshColumns(df, Seq(outCol), "LangId.label")
    val (bound, labels) = scored(df, textCol, model, classStats)
    bound
      .withColumn(outCol, argmax(labels.map(l => l -> col(s"__lang_s_$l"))))
      .drop("__lang_grams" +: labels.map(l => s"__lang_s_$l"): _*)
  }

  /** Keep only rows whose predicted language is in `allow` — the
    * curation `lang_id:` stage body. Per-row; no new columns on the
    * output. */
  def filterByLang(df: DataFrame, textCol: String, model: DataFrame,
                   classStats: DataFrame, allow: Seq[String]): DataFrame = {
    require(allow.nonEmpty, "lang_id filter needs a non-empty allow set")
    Guards.requireFreshColumns(df, Seq("__lang_pred"), "LangId.filterByLang")
    val labeled = label(df, textCol, model, classStats, "__lang_pred")
    val labels = classStats.select("label").collect()
      .map(_.getString(0)).toSeq
    val unknown = allow.filterNot(labels.contains)
    if (unknown.nonEmpty)
      throw graft.core.GraftError.Configuration(
        s"lang_id allow set names classes the model never saw: " +
          s"${unknown.mkString(", ")} (trained: ${labels.sorted.mkString(", ")})")
    labeled.where(col("__lang_pred").isin(allow: _*)).drop("__lang_pred")
  }
}
