package graft.llm

import graft.SparkSpec

class TfIdfSpec extends SparkSpec {
  import spark.implicits._

  test("scores and ranks match a naive corpus scan") {
    val docs = Seq(
      (1L, "apple banana apple cherry"),
      (2L, "banana cherry cherry date"),
      (3L, "apple date date date egg"),
      (4L, "fig fig fig fig")
    ).toDF("doc_id", "text")
    val got = TfIdf.topTerms(docs, "doc_id", "text", k = 2)
      .as[(Long, Int, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap

    val corpus = Map(
      1L -> Seq("apple", "banana", "apple", "cherry"),
      2L -> Seq("banana", "cherry", "cherry", "date"),
      3L -> Seq("apple", "date", "date", "date", "egg"),
      4L -> Seq("fig", "fig", "fig", "fig"))
    val n = corpus.size.toDouble
    val dfreq = corpus.values.flatMap(_.distinct).groupBy(identity)
      .map { case (t, xs) => t -> xs.size }
    val want = corpus.flatMap { case (id, toks) =>
      toks.groupBy(identity).map { case (t, xs) =>
        (t, xs.size.toLong, xs.size * math.log(n / dfreq(t)))
      }.toSeq
        .sortBy { case (t, _, s) => (-s, t) }.take(2).zipWithIndex
        .map { case ((t, tf, s), i) =>
          (id, i + 1) -> (t, tf, math.rint(s * 1e6) / 1e6) }
    }
    assert(got.keySet == want.keySet)
    want.foreach { case (key, (t, tf, s)) =>
      val (gt, gtf, gs) = got(key)
      assert(gt == t && gtf == tf && math.abs(gs - s) < 1e-9,
        s"$key: got ${got(key)}, want ${(t, tf, s)}")
    }
  }

  test("every-doc-term scores zero; ties rank by term ascending") {
    val docs = Seq((1L, "zz aa"), (2L, "zz aa"), (3L, "zz aa"))
      .toDF("doc_id", "text")
    val got = TfIdf.topTerms(docs, "doc_id", "text", k = 2)
      .as[(Long, Int, String, Long, Double)].collect()
    assert(got.forall(_._5 == 0.0))
    assert(got.filter(_._1 == 1L).sortBy(_._2).map(_._3).toSeq == Seq("aa", "zz"))
  }

  test("empty and token-free documents emit no rows") {
    val docs = Seq((1L, "real words here"), (2L, ""), (3L, "!!! ... ---"))
      .toDF("doc_id", "text")
    val got = TfIdf.topTerms(docs, "doc_id", "text", k = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(1L))
  }
}
