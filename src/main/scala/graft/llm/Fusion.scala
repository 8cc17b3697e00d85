package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
  * combine N ranked candidate lists into one consensus ranking by
  * rrf(d) = Σ_lists 1 / (k + rank_list(d)) — the standard hybrid-
  * retrieval combiner (sparse BM25 + dense ANN), robust to incomparable
  * score scales because it only consumes RANKS. k=60 is the paper's
  * constant; a document absent from a list simply contributes nothing.
  *
  * Scale shape: union of the (id, rank) lists — ranks are produced
  * upstream, typically by bounded top-k retrieval, so inputs are
  * k-bounded per query, never corpus-sized — then ONE hash aggregation
  * on id. No window, no global sort; fused scores are exact sums of
  * 1/(k+rank) doubles added in a DETERMINISTIC order (lists are tagged
  * and summed per-list before combining), so the oracle replays them
  * bit-identically. */
object Fusion {

  /** Fuse ranked lists (each a frame with `idCol` + `rankCol`, rank
    * 1-based) into (idCol, rrf) with rrf rounded tie-safely
    * (floor-half-up) to `roundTo` decimals. Per-id contributions are
    * summed per list FIRST (list order = argument order), then across
    * lists, so float summation order is engine-independent. Duplicate
    * ids within one list are rejected upstream by construction
    * (ranks come from row_number); here the guard is the exact sum —
    * a duplicate shifts the score visibly rather than silently. */
  def rrf(lists: Seq[DataFrame], idCol: String, rankCol: String,
          k: Int = 60, roundTo: Int = 6): DataFrame = {
    require(lists.nonEmpty, "rrf needs at least one ranked list")
    require(k >= 0, s"rrf k must be >= 0, got $k")
    lists.foreach { df =>
      require(df.columns.contains(idCol) && df.columns.contains(rankCol),
        s"every rrf input needs columns $idCol and $rankCol")
    }
    val tagged = lists.zipWithIndex.map { case (df, i) =>
      df.select(col(idCol), col(rankCol).cast("long").as("__rank"),
        lit(i).as("__list"))
    }.reduce(_ unionByName _)
    val factor = math.pow(10.0, roundTo)
    // per-(id, list) first: within one list an id is unique, so this
    // inner agg is exact; the outer sum then adds ONE double per list
    // in list order via sorted collect — deterministic across engines
    tagged
      .groupBy(col(idCol), col("__list"))
      .agg(sum(lit(1.0) / (lit(k.toDouble) + col("__rank"))).as("__c"))
      .groupBy(col(idCol))
      .agg(aggregate(
        array_sort(collect_list(struct(col("__list"), col("__c")))),
        lit(0.0), (acc, s) => acc + s.getField("__c")).as("__rrf"))
      .select(col(idCol),
        (floor(col("__rrf") * factor + 0.5) / factor).as("rrf"))
  }
}
