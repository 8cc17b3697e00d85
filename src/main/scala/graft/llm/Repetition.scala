package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.SketchExprs.gramRepetitionPair

/** Repeated-content quality metrics and the filter built on them — the
  * "remove documents that are mostly the same phrase over and over"
  * stage of corpus curation (Gopher-style repetition thresholds).
  *
  * Metrics per document, all derived from one-pass native
  * [[graft.functions.SketchExprs.GramRepetition]] projections:
  *  - `dup_word_frac`:   1 - distinct_words / n_words — how much of the
  *    document is repeated vocabulary;
  *  - `dup_ngram_frac`:  (total - distinct) n-grams / total — fraction
  *    of n-gram occurrences that are re-occurrences;
  *  - `top_ngram_frac`:  occurrences of the modal n-gram / total — how
  *    dominated the document is by its single most common phrase.
  *
  * Scale shape: two scalar projections per row inside whole-stage
  * codegen, no shuffle, no explode — the groupBy(doc, gram)
  * formulation would shuffle every gram occurrence of a 100 TB corpus;
  * this one shuffles nothing.
  */
object Repetition {

  /** Column names [[stats]] appends ([[Guards.requireFreshColumns]]). */
  private val StatCols = Seq("__r", "n_words", "distinct_words",
    "dup_word_frac", "total_ngrams", "distinct_ngrams", "top_ngram_count",
    "dup_ngram_frac", "top_ngram_frac")

  /** Append repetition stats columns: `n_words`, `distinct_words`,
    * `dup_word_frac`, `total_ngrams`, `distinct_ngrams`,
    * `top_ngram_count`, `dup_ngram_frac`, `top_ngram_frac`.
    * Fractions are 0.0 (not null/NaN) and counts 0 (not null) for
    * null/empty documents — a NULL text is treated as the empty
    * document, matching the explicit-zeros contract of the sibling ops
    * (Boilerplate.score, Spans.stats, LmScore.score) so a family-wide
    * stats report never mixes nulls and zeros. Word and n-gram families
    * come from ONE paired projection (one tokenization per document —
    * the regex split dominates the per-row cost). */
  def stats(df: DataFrame, textCol: String, n: Int = 2,
            roundTo: Int = 6): DataFrame = {
    Guards.requireFreshColumns(df, StatCols, "Repetition.stats")
    val d = df.withColumn("__r",
      gramRepetitionPair(coalesce(col(textCol), lit("")), n))
    def frac(num: org.apache.spark.sql.Column,
             den: org.apache.spark.sql.Column) =
      when(den > 0, round(num.cast("double") / den.cast("double"), roundTo))
        .otherwise(lit(0.0))
    d.withColumn("n_words", col("__r.w_total"))
      .withColumn("distinct_words", col("__r.w_distinct"))
      .withColumn("dup_word_frac",
        frac(col("__r.w_total") - col("__r.w_distinct"), col("__r.w_total")))
      .withColumn("total_ngrams", col("__r.g_total"))
      .withColumn("distinct_ngrams", col("__r.g_distinct"))
      // g_top is already 0 exactly when g_total is 0 (gramOccurrenceStats
      // contract) — pass through, no guard branch
      .withColumn("top_ngram_count", col("__r.g_top"))
      .withColumn("dup_ngram_frac",
        frac(col("__r.g_total") - col("__r.g_distinct"), col("__r.g_total")))
      .withColumn("top_ngram_frac", frac(col("__r.g_top"), col("__r.g_total")))
      .drop("__r")
  }

  /** Within-document duplicate LINE / PARAGRAPH statistics — the
    * structural half of Gopher's repetition block (Rae et al. 2021
    * A1.1 thresholds duplicate line/paragraph fractions by count AND
    * by character mass, alongside the word/n-gram fractions [[stats]]
    * covers). A page that repeats one paragraph five times trips these
    * long before any n-gram statistic moves.
    *
    * Definitions (the standard reimplementation): a duplicate is every
    * occurrence BEYOND the first of an identical unit, so
    * `dup_*_frac = (total - distinct) / total` by unit count and
    * `dup_*_char_frac` the same ratio weighted by unit characters —
    * both computed with array_distinct against exact unit strings
    * (lines split on `\n`, paragraphs on blank lines; whitespace-only
    * units excluded). Empty/null text reports 0 everywhere. One
    * per-row projection: no shuffle, streams, SQL-replayable. */
  def lineStats(df: DataFrame, textCol: String,
                roundTo: Int = 6): DataFrame = {
    Guards.requireFreshColumns(df, Seq("__lq", "n_lines", "dup_line_frac",
      "dup_line_char_frac", "n_paras", "dup_para_frac",
      "dup_para_char_frac"), "Repetition.lineStats")
    def frac(num: org.apache.spark.sql.Column,
             den: org.apache.spark.sql.Column) =
      when(den > 0, round(num.cast("double") / den.cast("double"), roundTo))
        .otherwise(lit(0.0))
    // all four unit families (line/para × count/char-mass) ride the ONE
    // fused text walk ([[graft.functions.QualityExprs]]) — the previous
    // split/array_distinct/aggregate chains re-tokenized the document
    // once per family; field semantics are the walk's pinned contract
    val d = df.withColumn("__lq", graft.functions.QualityExprs
      .qualitySignals(coalesce(col(textCol), lit(""))))
    val q = col("__lq")
    d.withColumn("n_lines", q("n_lines"))
      .withColumn("dup_line_frac",
        frac(q("n_lines") - q("dl_distinct"), q("n_lines")))
      .withColumn("dup_line_char_frac",
        frac(q("dl_chars") - q("dl_distinct_chars"), q("dl_chars")))
      .withColumn("n_paras", q("n_paras"))
      .withColumn("dup_para_frac",
        frac(q("n_paras") - q("dp_distinct"), q("n_paras")))
      .withColumn("dup_para_char_frac",
        frac(q("dp_chars") - q("dp_distinct_chars"), q("dp_chars")))
      .drop("__lq")
  }

  /** Keep documents under Gopher's four duplicate line/paragraph
    * thresholds (A1.1: 0.30 by count, 0.20 by character mass). Same
    * exact-skip contract as [[filterRepetitive]]. */
  def filterDuplicateUnits(df: DataFrame, textCol: String,
                           maxDupLineFrac: Double = 0.3,
                           maxDupParaFrac: Double = 0.3,
                           maxDupLineCharFrac: Double = 0.2,
                           maxDupParaCharFrac: Double = 0.2): DataFrame =
    if (maxDupLineFrac >= 1.0 && maxDupParaFrac >= 1.0 &&
      maxDupLineCharFrac >= 1.0 && maxDupParaCharFrac >= 1.0) df
    else
      // one fused-walk boolean, not a filter over [[lineStats]]'s
      // columns — predicate pushdown would substitute each fraction
      // alias with its own copy of the walk; null text coalesces to
      // "" exactly like [[lineStats]] (0-valued fractions, kept)
      df.filter(graft.functions.QualityExprs.qualityKeep(
        coalesce(col(textCol), lit("")),
        None,
        Some(graft.functions.QualityExprs.DupUnitThresholds(
          maxDupLineFrac, maxDupParaFrac, maxDupLineCharFrac,
          maxDupParaCharFrac))))

  /** Keep documents under all three repetition thresholds (published
    * pipelines use ~0.3 for duplicate fractions and ~0.2 for the
    * most-common-n-gram fraction). A pure filter projection — composes
    * with partition/column pruning untouched. */
  def filterRepetitive(df: DataFrame, textCol: String,
                       maxDupWordFrac: Double = 0.3,
                       maxDupNgramFrac: Double = 0.3,
                       maxTopNgramFrac: Double = 0.2,
                       n: Int = 2): DataFrame = {
    // every fraction is a ratio of a subset count over its total, so it
    // is bounded by 1.0 (0.0 for null/empty docs) — thresholds >= 1.0
    // keep every row, and the stats projection (the per-doc
    // tokenization, the expensive part) can be skipped EXACTLY. This
    // matters doubly inside Curation.pipeline, where the filter subtree
    // fans out into multiple consumers and would otherwise re-tokenize
    // the corpus once per evaluation for a provable no-op.
    if (maxDupWordFrac >= 1.0 && maxDupNgramFrac >= 1.0 &&
      maxTopNgramFrac >= 1.0) df
    else {
      val cols = df.columns.map(col)
      stats(df, textCol, n)
        .filter(col("dup_word_frac") <= maxDupWordFrac &&
          col("dup_ngram_frac") <= maxDupNgramFrac &&
          col("top_ngram_frac") <= maxTopNgramFrac)
        .select(cols.toIndexedSeq: _*)
    }
  }
}
