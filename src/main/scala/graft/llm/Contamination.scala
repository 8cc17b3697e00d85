package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection: which corpus documents share
  * word n-grams with an evaluation/benchmark probe set? The standard
  * decontamination pass before pre-training (n = 8..13 word-grams in
  * published pipelines).
  *
  * Scale shape: the probe side (a benchmark) is small — its distinct
  * grams are broadcast, so the corpus is never shuffled by gram: the
  * plan is scan → explode → broadcast-hash-join → partial-agg by
  * doc_id. Per-doc gram sets are deduped BEFORE the explode leaves the
  * row (array_distinct), so the exploded stream is bounded by document
  * length, and only (doc_id, count) partials cross the wire.
  */
object Contamination {

  /** Word tokens: lowercase, split on non-word runs, empties dropped —
    * the same tokenizer as the n-gram Jaccard dedup family. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\W+"), t => length(t) > 0)

  /** Distinct word n-grams of `text` as "w1 w2 … wn" strings; empty
    * array when the document has fewer than n tokens. (The size guard
    * matters: Spark's `sequence(1, k)` DESCENDS for k < 1 instead of
    * returning empty.) Readable/debuggable form — [[check]] joins on
    * [[hashedNgrams]], the one-pass native hash image of exactly these
    * grams. */
  def ngrams(text: Column, n: Int): Column = {
    require(n >= 1, s"n must be >= 1: $n")
    val toks = tokens(text)
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - lit(n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n)))))
        .otherwise(array()))
  }

  /** xxhash64 image of [[ngrams]] (strict [[graft.functions.SketchExprs.ShingleHash]]:
    * same tokens, same gram strings, hashed in ONE codegen'd pass —
    * the interpreted transform/concat_ws lambda chain was the whole
    * cost of the contamination scan). Distinct-count semantics are
    * preserved: equal grams ⇔ equal hashes up to 2^-64 collisions. */
  def hashedNgrams(text: Column, n: Int): Column =
    graft.functions.SketchExprs.shingleHashes(text, n, strict = true)

  /** Per-document contamination report against `probes`:
    * `matched_grams` (distinct n-grams shared with ANY probe),
    * `total_grams`, and `contamination` = matched/total, for every
    * document sharing at least one gram. Probe grams are broadcast —
    * benchmark sets are tiny next to a training corpus.
    *
    * One corpus pass: the native hashed n-gram projection runs once,
    * and both counts ride the same broadcast LEFT join: total =
    * exploded grams per doc, matched = grams the join marked. No
    * second scan, no id re-join, no interpreted lambdas in the scan. */
  def check(corpus: DataFrame, probes: DataFrame, idCol: String,
            textCol: String, probeTextCol: String, n: Int = 8,
            roundTo: Int = 6): DataFrame = {
    val id = col(idCol)
    val probeGrams = probes
      .select(explode(hashedNgrams(col(probeTextCol), n)).as("gram")).distinct()
      .withColumn("__hit", lit(1))
    val docGrams = corpus.select(id,
      explode(hashedNgrams(col(textCol), n)).as("gram"))
    // per-doc grams are already distinct → counts = distinct counts
    docGrams.join(broadcast(probeGrams), Seq("gram"), "left")
      .groupBy(id)
      .agg(count(col("__hit")).as("matched_grams"),
        count(lit(1)).as("total_grams"))
      .filter(col("matched_grams") > 0)
      .select(id, col("matched_grams"), col("total_grams"),
        round(col("matched_grams") / col("total_grams"), roundTo)
          .as("contamination"))
  }

  /** The removal step [[check]] reports for: keep only documents whose
    * contamination stays BELOW `maxContamination`. `0.0` is the strict
    * mode — drop every document sharing even one n-gram with a probe.
    * The decision compares the UNROUNDED matched/total ratio (the
    * rounded report column would misclassify ratios that round onto
    * the threshold). Documents sharing no gram never enter the
    * decision join.
    *
    * Scale shape: [[check]]'s broadcast scan yields the contaminated-id
    * set — small by construction (benchmark-adjacent docs) — and the
    * corpus anti-joins it BY ID ONLY; document text crosses exactly the
    * one exchange any keep/drop-set join costs, nothing per-gram. */
  def decontaminate(corpus: DataFrame, probes: DataFrame, idCol: String,
                    textCol: String, probeTextCol: String, n: Int = 8,
                    maxContamination: Double = 0.2): DataFrame = {
    require(maxContamination >= 0.0 && maxContamination <= 1.0,
      s"maxContamination must be in [0, 1]: $maxContamination")
    val dropIds = check(corpus, probes, idCol, textCol, probeTextCol, n)
      .filter(col("matched_grams").cast("double") / col("total_grams")
        >= lit(maxContamination))
      .select(col(idCol))
    corpus.join(dropIds, Seq(idCol), "left_anti")
  }
}
