package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking-quality metrics — nDCG@k and MRR per query — the
  * evaluation loop for the retrieval family ([[Bm25]], [[Fusion]],
  * the ANN indexes): before a ranking change ships, its graded
  * relevance against labels must not regress. The pair-set twin is
  * [[graft.operators.PairEval]]; this one scores ORDER.
  *
  * Definitions: DCG@k = Σ_{i≤k} (2^rel − 1)/log2(i+1) over the ranked
  * results; iDCG@k is the same sum over the k best labels (rel desc,
  * doc asc — deterministic ties); nDCG = DCG/iDCG (null when no
  * positive labels exist); MRR = 1/rank of the first result with
  * rel > 0 (0.0 when none retrieved).
  *
  * Float discipline: per-rank terms are summed by an EXPLICIT
  * left-fold over a rank-sorted array (`aggregate`), not a parallel
  * SUM — floating addition is not associative, and only a pinned fold
  * order replays bit-for-bit on another engine (the RRF fusion
  * precedent). Both folds are over ≤ k elements, so the collected
  * arrays are k-bounded by construction.
  *
  * Scale shape: one bounded window per side (results are pre-cut to
  * k; labels cut to their top-k by the same window machinery as the
  * grouped top-k family), then keys-only aggregations. Nothing
  * collects more than k rows per query. */
object RankEval {

  /** @param results (queryCol, docCol, rankCol) — rank 1-based,
    *                rows with rank > k are ignored
    * @param labels  (queryCol, docCol, relCol) — graded relevance,
    *                unlabeled result docs score 0
    * @return (query, n_results, n_relevant, dcg, idcg, ndcg, mrr) */
  def metrics(results: DataFrame, labels: DataFrame, queryCol: String,
              docCol: String, rankCol: String, relCol: String, k: Int,
              roundTo: Int = 6): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    Seq((results, Seq(queryCol, docCol, rankCol), "results"),
      (labels, Seq(queryCol, docCol, relCol), "labels")).foreach {
      case (df, cols, name) => cols.foreach(c =>
        require(df.columns.contains(c), s"$name needs column '$c'"))
    }
    val rf = math.pow(10.0, roundTo)
    def r(c: Column) = floor(c * rf + 0.5) / rf
    def fold(terms: Column): Column =
      aggregate(terms, lit(0.0), (acc, x) => acc + x)
    def gain(rel: Column, pos: Column): Column =
      (pow(lit(2.0), rel.cast("double")) - 1.0) /
        log2(pos.cast("double") + 1.0)
    // ranked results (cut to k) pick up their labels; missing -> 0
    val res = results
      .select(col(queryCol).as("query"), col(docCol).as("doc"),
        col(rankCol).cast("long").as("rank"))
      .where(col("rank") <= k)
      .join(labels.select(col(queryCol).as("query"),
          col(docCol).as("doc"), col(relCol).cast("long").as("rel")),
        Seq("query", "doc"), "left")
      .withColumn("rel", coalesce(col("rel"), lit(0L)))
    val perQuery = res.groupBy(col("query"))
      .agg(count(lit(1)).as("n_results"),
        sum(when(col("rel") > 0, 1L).otherwise(0L)).as("n_relevant"),
        // k-bounded by the rank cut; sorted so the fold order is pinned
        array_sort(collect_list(struct(col("rank"), col("rel"))))
          .as("__terms"),
        min(when(col("rel") > 0, col("rank"))).as("__first"))
      .withColumn("dcg", r(fold(transform(col("__terms"),
        t => gain(t.getField("rel"), t.getField("rank"))))))
    // ideal: each query's k best labels (rel desc, doc asc)
    val wIdeal = Window.partitionBy(col("query"))
      .orderBy(col("rel").desc, col("doc").asc)
    val ideal = labels
      .select(col(queryCol).as("query"), col(docCol).as("doc"),
        col(relCol).cast("long").as("rel"))
      .where(col("rel") > 0)
      .withColumn("__pos", row_number().over(wIdeal))
      .where(col("__pos") <= k)
      .groupBy(col("query"))
      .agg(array_sort(collect_list(struct(col("__pos"), col("rel"))))
        .as("__ideal"))
      .withColumn("idcg", r(fold(transform(col("__ideal"),
        t => gain(t.getField("rel"), t.getField("__pos"))))))
      .select(col("query"), col("idcg"))
    perQuery.join(ideal, Seq("query"), "left")
      .select(col("query"), col("n_results"), col("n_relevant"),
        col("dcg"), col("idcg"),
        when(col("idcg") > 0, r(col("dcg") / col("idcg"))).as("ndcg"),
        coalesce(r(lit(1.0) / col("__first").cast("double")), lit(0.0))
          .as("mrr"))
  }
}
