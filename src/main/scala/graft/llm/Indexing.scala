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
}
