package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Inverted-index construction: term → sorted posting list of the
  * documents containing it. The backbone of corpus search, targeted
  * decontamination ("which docs mention this benchmark question"),
  * and cheap co-occurrence mining.
  *
  * Scale shape: explode → DISTINCT (term, doc) pairs (map-side
  * combined), then ONE aggregation per term whose buffer is the capped
  * native collect — a term appearing in more than `maxPostings`
  * documents poisons its own buffer and drops (stopword postings are
  * useless and would otherwise balloon a single reducer: "the" at
  * 100 TB is billions of doc ids on one key). Per-group memory is
  * bounded at the cap at every stage, the posting list arrives sorted
  * for free, and document text never rides any shuffle — only (term,
  * 8-byte id) pairs move. `minDf` prunes hapax noise after the fact
  * (size check on the bounded array, no extra pass). */
object Indexing {

  /** (term, df, postings) — postings as a comma-joined sorted id string
    * (engine-portable form), df = its length. Terms with
    * df < `minDf` or df > `maxPostings` are dropped. */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
                    minDf: Int = 2, maxPostings: Int = 10000): DataFrame = {
    require(minDf >= 1, s"minDf must be >= 1, got $minDf")
    require(maxPostings >= minDf,
      s"maxPostings ($maxPostings) must be >= minDf ($minDf)")
    val id = col("`" + idCol.replace("`", "``") + "`")
    docs
      .select(id.as("__id"),
        explode(Contamination.tokens(col(textCol))).as("term"))
      .distinct()
      .groupBy(col("term"))
      .agg(graft.functions.CollectCapped
        .collect_longs_capped(col("__id"), maxPostings).as("__post"))
      .where(col("__post").isNotNull && size(col("__post")) >= minDf)
      .select(col("term"), size(col("__post")).cast("long").as("df"),
        array_join(col("__post"), ",").as("postings"))
  }

  /** Winnowing fingerprint index (Schleimer 2003 — the MOSS
    * document-fingerprinting method, via the native one-pass
    * [[graft.functions.SketchExprs.WinnowFingerprints]]): one row per
    * selected (id, pos, fp) fingerprint. Density ≈ 2/(w+1) of all
    * k-grams with a HARD guarantee: any verbatim match of length
    * >= w + k - 1 chars between two documents shares at least one
    * fingerprint — shift-invariant, unlike strided char windows. The
    * gram hash is the portable polynomial (mod 2^31-1), so selection
    * replays in SQL. Only (id, int, long) rows leave the scan. */
  def winnowIndex(docs: DataFrame, idCol: String, textCol: String,
                  k: Int = 25, w: Int = 16): DataFrame = {
    val id = col("`" + idCol.replace("`", "``") + "`")
    docs.select(id,
        explode(graft.functions.SketchExprs
          .winnowFingerprints(col(textCol), k, w)).as("__f"))
      .select(id, col("__f")("pos").as("pos"), col("__f")("h").as("fp"))
  }

  /** Document pairs sharing >= `minShared` winnowing fingerprints —
    * the MOSS plagiarism-pair shape, and a shift-invariant complement
    * to the dedup family's aligned-window detectors. Keys-only
    * meeting: distinct (fp, id) pairs group per fingerprint into a
    * capped posting list (a fingerprint selected from boilerplate in
    * > `maxDocsPerFp` docs poisons its bucket and drops — the
    * [[invertedIndex]]/minhash skew guard: B docs on one fp is B²/2
    * pairs), pairs form within each list, and ONE aggregation counts
    * shared fingerprints per (a, b). Text never shuffles. */
  def winnowMatchPairs(docs: DataFrame, idCol: String, textCol: String,
                       k: Int = 25, w: Int = 16, minShared: Int = 2,
                       maxDocsPerFp: Int = 1000): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1: $minShared")
    // the pair meeting keys on a LONG id; a non-numeric id would cast
    // to NULL and silently collapse every document onto one key, so
    // require an integral id type up front (loud, not lossy)
    val idType = docs.schema(idCol).dataType
    require(Seq("byte", "short", "integer", "long")
        .contains(idType.typeName),
      s"winnowMatchPairs needs an integral id column; '$idCol' is " +
        s"${idType.sql} — cast or map ids to long upstream")
    val id = col("`" + idCol.replace("`", "``") + "`")
    val fps = winnowIndex(docs, idCol, textCol, k, w)
      .select(col("fp"), id.cast("long").as("__id"))
      .distinct()
    val lists = fps.groupBy(col("fp"))
      .agg(graft.functions.CollectCapped
        .collect_longs_capped(col("__id"), maxDocsPerFp).as("__ids"))
      .where(col("__ids").isNotNull && size(col("__ids")) >= 2)
    lists
      .select(explode(col("__ids")).as("id_a"), col("__ids"))
      .select(col("id_a"), explode(col("__ids")).as("id_b"))
      .where(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared_fps"))
      .where(col("shared_fps") >= minShared)
  }
}
