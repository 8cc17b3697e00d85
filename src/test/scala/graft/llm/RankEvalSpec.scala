package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RankEvalSpec extends SparkSpec {
  import spark.implicits._

  private def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
  private def lg2(x: Double) = math.log(x) / math.log(2.0)

  test("hand nDCG/MRR: unretrieved relevant docs punish the ideal") {
    // results q1: ranks 1..3 with rels 0, 2, 1 (after label join);
    // labels also hold an UNRETRIEVED rel-2 doc (99) -> ideal (2,2,1)
    val results = Seq(("q1", 10L, 1), ("q1", 11L, 2), ("q1", 12L, 3))
      .toDF("query", "doc", "rank")
    val labels = Seq(("q1", 11L, 2L), ("q1", 12L, 1L), ("q1", 99L, 2L))
      .toDF("query", "doc", "rel")
    val out = RankEval.metrics(results, labels,
      "query", "doc", "rank", "rel", k = 10).collect()(0)
    val dcg = 0.0 + 3.0 / lg2(3.0) + 1.0 / lg2(4.0)
    val idcg = 3.0 / 1.0 + 3.0 / lg2(3.0) + 1.0 / lg2(4.0)
    assert(out.getAs[Long]("n_results") == 3L &&
      out.getAs[Long]("n_relevant") == 2L)
    assert(out.getAs[Double]("dcg") == r6(dcg))
    assert(out.getAs[Double]("idcg") == r6(idcg))
    assert(out.getAs[Double]("ndcg") == r6(r6(dcg) / r6(idcg)))
    assert(out.getAs[Double]("mrr") == 0.5) // first relevant at rank 2
  }

  test("multi-query independence, zero-relevance cases, rank cut") {
    val results = Seq(
      ("good", 1L, 1), ("good", 2L, 2),
      ("bad", 3L, 1), ("bad", 4L, 2),
      ("cut", 5L, 1), ("cut", 6L, 99) // rank 99 ignored at k=10
    ).toDF("query", "doc", "rank")
    val labels = Seq(
      ("good", 1L, 1L), ("good", 2L, 1L),
      ("cut", 6L, 1L) // only the CUT result is relevant
    ).toDF("query", "doc", "rel")
    val out = RankEval.metrics(results, labels,
        "query", "doc", "rank", "rel", k = 10)
      .collect().map(r => r.getString(0) -> r).toMap
    // perfect ranking: ndcg = 1
    assert(out("good").getAs[Double]("ndcg") == 1.0 &&
      out("good").getAs[Double]("mrr") == 1.0)
    // no labels at all for 'bad': idcg null -> ndcg null, mrr 0
    assert(out("bad").isNullAt(out("bad").fieldIndex("ndcg")))
    assert(out("bad").getAs[Double]("mrr") == 0.0)
    // 'cut': its only relevant doc sits past k -> dcg 0, mrr 0, but
    // the ideal still counts the label -> ndcg 0
    assert(out("cut").getAs[Long]("n_results") == 1L)
    assert(out("cut").getAs[Double]("dcg") == 0.0 &&
      out("cut").getAs[Double]("ndcg") == 0.0 &&
      out("cut").getAs[Double]("mrr") == 0.0)
    intercept[IllegalArgumentException](RankEval.metrics(
      results, labels, "query", "doc", "rank", "rel", k = 0))
    intercept[IllegalArgumentException](RankEval.metrics(
      results.drop("rank"), labels, "query", "doc", "rank", "rel", 10))
  }
}
