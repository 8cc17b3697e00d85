package graft.llm

import graft.SparkSpec

class IndexingSpec extends SparkSpec {
  import spark.implicits._

  test("postings are sorted distinct doc ids; df bounds enforced") {
    val docs = Seq(
      (3L, "alpha beta beta gamma"),
      (1L, "alpha beta"),
      (2L, "alpha delta"),
      (4L, "epsilon")
    ).toDF("doc_id", "text")
    val got = Indexing.invertedIndex(docs, "doc_id", "text", minDf = 2)
      .as[(String, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // alpha in 1,2,3; beta in 1,3 (repeat inside doc 3 collapses);
    // gamma/delta/epsilon df=1 dropped by minDf
    assert(got == Map(
      "alpha" -> (3L, "1,2,3"),
      "beta" -> (2L, "1,3")))
  }

  test("hot terms beyond maxPostings drop entirely (poisoned buffer)") {
    val docs = (1L to 30L).map(i => (i, s"stopword unique$i"))
      .toDF("doc_id", "text")
    val got = Indexing.invertedIndex(docs, "doc_id", "text",
        minDf = 2, maxPostings = 10)
      .select("term").as[String].collect().toSet
    assert(!got.contains("stopword")) // df=30 > cap 10
    assert(got.isEmpty) // unique terms are hapax, dropped by minDf
    // with a bigger cap the stopword term comes back complete
    val full = Indexing.invertedIndex(docs, "doc_id", "text",
        minDf = 2, maxPostings = 100)
      .as[(String, Long, String)].collect()
    assert(full.toSeq == Seq(("stopword", 30L, (1L to 30L).mkString(","))))
  }

  test("guards: bad bounds rejected") {
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](
      Indexing.invertedIndex(docs, "doc_id", "text", minDf = 0))
    intercept[IllegalArgumentException](
      Indexing.invertedIndex(docs, "doc_id", "text", minDf = 5, maxPostings = 4))
  }
}
