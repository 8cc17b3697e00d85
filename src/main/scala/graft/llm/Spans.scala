package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.SketchExprs.charWindowHashes

/** Corpus-level repeated-substring (exact-span) detection — the
  * "deduplicating training data" method that near-dup sketches miss:
  * a boilerplate paragraph pasted into thousands of otherwise-unique
  * documents never trips MinHash (whole-doc similarity stays low) but
  * lights up here, because the REPEATED SPAN itself is found. The
  * full-fidelity version runs a corpus suffix array; the scalable
  * approximation is strided k-char windows: a substring of length
  * >= k + stride - 1 shared between two places (two docs, or twice in
  * one doc) produces a window-hash collision when the occurrence
  * offsets align mod stride — ALWAYS at stride = 1, and for the
  * dominant aligned-duplication patterns (exact copies, shared
  * prefixes, appended-tail variants) at any stride. See
  * [[graft.functions.SketchExprs.CharWindowHashes]] for the precise
  * contract; the stride-1/stride-20 sensitivity difference is
  * unit-pinned.
  *
  * Scale shape: the explode emits (id, 8-byte hash) pairs only — text
  * never leaves its row (the hashing is the one-pass native
  * [[graft.functions.SketchExprs.CharWindowHashes]]). Occurrence
  * counts come from a map-side-partial groupBy on the hash (hot spans
  * collapse before the exchange), joined back to the pairs; the
  * per-doc rollup is the final id-keyed shuffle. All exchanges carry
  * 16-byte rows.
  */
object Spans {

  /** Per-document repeated-span load: `n_windows`, `n_repeated`
    * (windows whose hash occurs >= `minOccurrences` times anywhere in
    * the corpus — other docs or elsewhere in the same doc), and
    * `repeated_frac`. Documents shorter than k chars stay in the
    * report as 0/0/0.0.
    *
    * @param persist materialize the (id, hash) window projection ONCE
    *   (eager localCheckpoint — 16-byte rows, no text, storage freed by
    *   the context cleaner when the frame is collected) so the input
    *   lineage + native hash pass run a single time instead of once per
    *   consumer (occurrence agg + join side). Turn on when the input is
    *   an expensive subtree; leave off when it's a bare scan and
    *   re-reading beats materializing. */
  def stats(df: DataFrame, idCol: String, textCol: String,
            k: Int = 40, stride: Int = 20, minOccurrences: Int = 2,
            roundTo: Int = 6, persist: Boolean = false): DataFrame = {
    require(minOccurrences >= 2, s"minOccurrences must be >= 2: $minOccurrences")
    Guards.requireFreshColumns(df,
      Seq("wh", "occ", "n_windows", "n_repeated", "repeated_frac"),
      "Spans.stats")
    val win0 = df.select(col(idCol),
      explode_outer(charWindowHashes(col(textCol), k, stride)).as("wh"))
    val win = if (persist) win0.localCheckpoint(true) else win0
    // occurrence counts via groupBy — the map-side partial aggregation
    // collapses a boilerplate span pasted into millions of docs BEFORE
    // the exchange, and AQE can split any residual join skew; a
    // count-over-window formulation would funnel every occurrence of a
    // hot hash into one unsplittable window partition — a guaranteed
    // straggler on exactly this operator's target workload. Without
    // `persist`, the window-hash projection evaluates twice (agg side +
    // join's left side); `persist = true` makes it exactly once.
    val occ = win.filter(col("wh").isNotNull)
      .groupBy(col("wh")).agg(count(lit(1)).as("occ"))
    win.join(occ, Seq("wh"), "left")
      .groupBy(col(idCol))
      .agg(count(col("wh")).as("n_windows"),
        count(when(col("occ") >= minOccurrences, 1)).as("n_repeated"))
      .select(col(idCol), col("n_windows"), col("n_repeated"),
        when(col("n_windows") > 0,
          round(col("n_repeated").cast("double") / col("n_windows"), roundTo))
          .otherwise(lit(0.0)).as("repeated_frac"))
  }

  /** Keep documents whose repeated-span load stays under
    * `maxRepeatedFrac` — the drop decision built on [[stats]]. */
  def filterRepeatedSpans(df: DataFrame, idCol: String, textCol: String,
                          maxRepeatedFrac: Double = 0.5, k: Int = 40,
                          stride: Int = 20, persist: Boolean = false): DataFrame = {
    val keep = stats(df, idCol, textCol, k, stride, persist = persist)
      .filter(col("repeated_frac") <= maxRepeatedFrac)
      .select(col(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }
}
