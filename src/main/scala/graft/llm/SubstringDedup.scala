package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.SketchExprs.tokenWindowHashes

/** Cross-document exact SUBSTRING dedup at TOKEN granularity — the
  * standard pretraining-corpus pass (Lee et al. 2021, "Deduplicating
  * Training Data Makes Language Models Better": find every >= W-token
  * span shared verbatim across documents, keep ONE occurrence, excise
  * the rest). Doc-level near-dup (MinHash/SimHash) misses exactly this
  * case — a 60-token passage pasted into thousands of otherwise-unique
  * documents never trips whole-doc similarity — and the char-window
  * [[Spans]] family catches it only at char alignment; this operator
  * works at the token granularity the papers specify and matches
  * REGARDLESS of the whitespace between tokens.
  *
  * Method (the distributed equivalent of the paper's suffix array):
  * every W-token window emits (charStart, charEnd, hash-of-normalized-
  * content) via the one-pass native
  * [[graft.functions.SketchExprs.TokenWindowHashes]]; a hash seen in
  * >= 2 DISTINCT documents marks its windows duplicated; per hash the
  * lexicographically-first occurrence by (id, charStart) is the KEEPER
  * and survives; per document, excised windows merge into maximal
  * spans and the text is rebuilt from the complement segments
  * ([[Spans.exciseIntervals]] — overlapping/adjacent windows coalesce,
  * so at stride 1 the union of duplicated windows is exactly the
  * maximal duplicated token span). At stride s > 1 the aligned-repeat
  * approximation of [[graft.functions.SketchExprs.CharWindowHashes]]
  * applies, transposed to token offsets.
  *
  * A document that is one whole duplicated span rebuilds to the empty
  * string and stays in the corpus as an auditable husk (same contract
  * as [[Spans.excise]]). Whitespace AROUND an excised span is not
  * collapsed — the cut is exactly [firstTokenStart, lastTokenEnd).
  *
  * Scale shape: window analysis shuffles (id, s, e, 8-byte hash) rows
  * only — text never leaves its row; occurrence counting + keeper pick
  * + the cross-doc test are ONE map-side-partial aggregation per hash
  * (cross-doc = min(id) != max(id), two cheap partial aggs — NOT a
  * countDistinct expand); the win-side join back is 1:1 per row (each
  * window matches at most one hash row — no per-key blowup exists in
  * this plan, which is why the hot-hash guard below warns rather than
  * drops); interval merge + rebuild share one id-keyed exchange.
  *
  * Hot-hash guard (the house loud-cap convention, adapted): a hash
  * occurring more than `maxOccurrences` times is mega-boilerplate.
  * Unlike a bucketed JOIN's posting cap there is no quadratic blowup
  * here — excising a span from a million documents is linear work and
  * is exactly this operator's job — so the guard is diagnostic:
  * "warn" (default) logs the count and hottest hashes and proceeds,
  * "fail" raises naming them (for pipelines that want boilerplate
  * stripped by [[Boilerplate]] BEFORE paying corpus-wide excision),
  * "allow" skips the extra aggregate entirely. The guard's bounded
  * collect is one extra evaluation of the window projection — set
  * `persist = true` to hash the corpus exactly once regardless (see
  * [[excise]]).
  */
object SubstringDedup {

  /** Merged maximal duplicated spans per document — the audit/report
    * surface: one row per (id, span) with its codepoint [s, e) bounds,
    * EXCLUDING each hash's keeper occurrence (so a doc that is the
    * sole survivor of a passage reports no span). */
  def spans(df: DataFrame, idCol: String, textCol: String,
            w: Int = 50, stride: Int = 1,
            maxOccurrences: Int = 1 << 20,
            onHot: String = "warn", persist: Boolean = false): DataFrame = {
    val excised = excisedWindows(df, idCol, textCol, w, stride,
      maxOccurrences, onHot, persist)
    // the SAME merge the excision uses (Spans.mergeIntervals), so the
    // report surface can never drift from what excise actually cuts
    Spans.mergeIntervals(excised, idCol)
      .select(col(idCol), col("__s").as("span_start"),
        col("__e").as("span_end"))
  }

  /** The corpus pass: input frame with `textCol` REBUILT — every
    * cross-document duplicated >= w-token span removed from all but
    * its keeper occurrence. Keeps every input column.
    *
    * @param persist materialize the (id, s, e, hash) window projection
    *   ONCE (eager localCheckpoint — 24-byte rows, no text) so the
    *   input lineage + native window-hash pass run a single time
    *   instead of once per consumer. The consumers are the occurrence
    *   aggregation, the join-back, AND (when `onHot` != "allow") the
    *   guard's bounded collect — so with the guard on, `persist = true`
    *   turns three corpus-hashing passes into one. Same trade as
    *   [[Spans.stats]]: costs block storage for the keys-only
    *   projection; leave off when the input is a bare scan. */
  def excise(df: DataFrame, idCol: String, textCol: String,
             w: Int = 50, stride: Int = 1,
             maxOccurrences: Int = 1 << 20,
             onHot: String = "warn", persist: Boolean = false): DataFrame = {
    val excised = excisedWindows(df, idCol, textCol, w, stride,
      maxOccurrences, onHot, persist)
    Spans.exciseIntervals(df, idCol, textCol, excised)
  }

  /** Duplicated non-keeper windows as (idCol, __s, __e) codepoint
    * intervals — the shared head of [[spans]] and [[excise]]. */
  private def excisedWindows(df: DataFrame, idCol: String, textCol: String,
                             w: Int, stride: Int, maxOccurrences: Int,
                             onHot: String, persist: Boolean): DataFrame = {
    require(Seq("warn", "fail", "allow").contains(onHot),
      s"onHot must be warn|fail|allow: $onHot")
    require(maxOccurrences >= 2, s"maxOccurrences must be >= 2: $maxOccurrences")
    Guards.requireFreshColumns(df,
      Seq("__s", "__e", "__wh", "__occ", "__idmin", "__idmax", "__keep",
        "__pmax", "__new", "__g", "__ivs"),
      "SubstringDedup")
    val win0 = df
      .select(col(idCol),
        explode(tokenWindowHashes(col(textCol), w, stride)).as("__w"))
      .select(col(idCol), col("__w")("s").as("__s"),
        col("__w")("e").as("__e"), col("__w")("h").as("__wh"))
    val win = if (persist) win0.localCheckpoint(true) else win0
    // one aggregation per hash: occurrence count, the cross-doc test
    // (min id != max id), and the keeper argmin all ride the same
    // map-side partials — a pasted-everywhere passage collapses to one
    // row per partition BEFORE the exchange
    val occ = win.groupBy(col("__wh"))
      .agg(count(lit(1)).as("__occ"),
        min(col(idCol)).as("__idmin"), max(col(idCol)).as("__idmax"),
        min(struct(col(idCol), col("__s"))).as("__keep"))
      .filter(col("__idmin") =!= col("__idmax"))
    val guarded = onHot match {
      case "allow" => occ
      case mode =>
        // the over-cap table is tiny (<= |windows| / maxOccurrences
        // rows); one bounded collect names the hottest hashes so the
        // diagnostic is actionable either way
        val hot = occ.where(col("__occ") > maxOccurrences)
          .orderBy(col("__occ").desc).limit(5)
          .select(col("__wh"), col("__occ")).collect()
        if (hot.nonEmpty) {
          val msg = s"SubstringDedup: ${hot.length}+ window hashes exceed " +
            s"maxOccurrences=$maxOccurrences (hottest: " +
            hot.map(r => s"${r.getLong(0)}×${r.getLong(1)}").mkString(", ") +
            "). Mega-boilerplate detected — consider stripping it with " +
            "Boilerplate/Paragraphs.dropCommon before paying corpus-wide " +
            "excision, or pass onHot=\"allow\"."
          if (mode == "fail") throw graft.core.GraftError.DataValidation(msg)
          else org.slf4j.LoggerFactory.getLogger(getClass).warn(msg)
        }
        occ
    }
    win.join(guarded, Seq("__wh"))
      .filter(!(col(idCol) === col("__keep")(idCol) &&
        col("__s") === col("__keep")("__s")))
      .select(col(idCol), col("__s"), col("__e"))
  }
}
