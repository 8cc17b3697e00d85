package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
  * counts ride ONE hash-partitioned window over those pairs, and the
  * per-doc rollup is the second, id-keyed shuffle. Two narrow shuffles
  * total, both on 16-byte rows.
  */
object Spans {

  /** Per-document repeated-span load: `n_windows`, `n_repeated`
    * (windows whose hash occurs >= `minOccurrences` times anywhere in
    * the corpus — other docs or elsewhere in the same doc), and
    * `repeated_frac`. Documents shorter than k chars stay in the
    * report as 0/0/0.0. */
  def stats(df: DataFrame, idCol: String, textCol: String,
            k: Int = 40, stride: Int = 20, minOccurrences: Int = 2,
            roundTo: Int = 6): DataFrame = {
    require(minOccurrences >= 2, s"minOccurrences must be >= 2: $minOccurrences")
    val win = df.select(col(idCol),
      explode_outer(charWindowHashes(col(textCol), k, stride)).as("wh"))
    // occurrence count per hash, riding one exchange; the null-hash
    // partition (window-less docs) is excluded from the repeated test
    val occ = count(lit(1)).over(Window.partitionBy(col("wh")))
    win.withColumn("occ", occ)
      .groupBy(col(idCol))
      .agg(count(col("wh")).as("n_windows"),
        count(when(col("wh").isNotNull && col("occ") >= minOccurrences, 1))
          .as("n_repeated"))
      .select(col(idCol), col("n_windows"), col("n_repeated"),
        when(col("n_windows") > 0,
          round(col("n_repeated").cast("double") / col("n_windows"), roundTo))
          .otherwise(lit(0.0)).as("repeated_frac"))
  }

  /** Keep documents whose repeated-span load stays under
    * `maxRepeatedFrac` — the drop decision built on [[stats]]. */
  def filterRepeatedSpans(df: DataFrame, idCol: String, textCol: String,
                          maxRepeatedFrac: Double = 0.5, k: Int = 40,
                          stride: Int = 20): DataFrame = {
    val keep = stats(df, idCol, textCol, k, stride)
      .filter(col("repeated_frac") <= maxRepeatedFrac)
      .select(col(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }
}
