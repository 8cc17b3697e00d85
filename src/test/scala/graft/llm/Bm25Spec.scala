package graft.llm

import graft.SparkSpec

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private def idf(n: Double, df: Double): Double =
    math.log(1.0 + (n - df + 0.5) / (df + 0.5))
  // same operation ORDER as the implementation: (idf * (tf*(k1+1))) / denom
  private def contrib(n: Double, df: Double, tf: Double, dl: Double,
                      avgdl: Double, k1: Double = 1.2,
                      b: Double = 0.75): Double =
    idf(n, df) * (tf * (k1 + 1.0)) /
      (tf + k1 * ((1.0 - b) + b * dl / avgdl))

  test("bm25: closed-form hand corpus, non-matching docs excluded") {
    val docs = Seq(
      (1L, "Apple banana apple"),
      (2L, "banana cherry"),
      (3L, "durian")
    ).toDF("doc_id", "text")
    val out = Bm25.score(docs, "doc_id", "text", Seq("apple", "banana"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // N=3, dl = 3,2,1, avgdl = 2.0; df(apple)=1 (case-folded), df(banana)=2
    val n = 3.0; val avgdl = 2.0
    def exp(tfA: Double, tfB: Double, dl: Double): Double = {
      val raw = contrib(n, 1.0, tfA, dl, avgdl) +
        contrib(n, 2.0, tfB, dl, avgdl)
      math.floor(raw * 1e6 + 0.5) / 1e6
    }
    assert(out.keySet == Set(1L, 2L), "durian doc matches no term")
    assert(out(1L) == exp(2.0, 1.0, 3.0))
    assert(out(2L) == exp(0.0, 1.0, 2.0))
    // tf=0 term contributes exactly 0 (not NaN): doc 2 has no apple
    assert(!out(2L).isNaN)
  }

  test("bm25: duplicate query terms collapse; guards fire") {
    val docs = Seq((1L, "x y"), (2L, "y z")).toDF("doc_id", "text")
    val once = Bm25.score(docs, "doc_id", "text", Seq("x"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val dup = Bm25.score(docs, "doc_id", "text", Seq("x", "X"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(once == dup, "case-folded duplicate terms must not double-count")
    intercept[IllegalArgumentException] {
      Bm25.score(docs, "doc_id", "text", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Bm25.score(docs, "doc_id", "text", (1 to 65).map("t" + _))
    }
  }

  test("prf expansion: hand-computed offer weights, exclusion, rank") {
    // query 'apple': d2 (dl=3) outranks d1 (dl=4) at equal tf, so the
    // top-2 feedback set is {d2, d1}; candidates banana/cherry/dog
    val docs = Seq(
      (1L, "apple banana banana cherry"),
      (2L, "apple banana dog"),
      (3L, "dog elephant"),
      (4L, "cherry dog")
    ).toDF("doc_id", "text")
    def r6(x: Double) =
      math.floor(x * 1e6 + 0.5) / 1e6
    val out = Bm25.expandQuery(docs, "doc_id", "text", Seq("apple"),
        fbDocs = 2, fbTerms = 2)
      .orderBy("rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getInt(5)))
    // banana: r_fb=2 (both fb docs), tf_fb=3, df=2 → 2·ln2
    // cherry: r_fb=1 (d1), tf_fb=1, df=2 → ln2; dog cut by fbTerms=2
    assert(out.toSeq == Seq(
      ("banana", 2L, 3L, 2L, r6(2 * math.log(2.0)), 1),
      ("cherry", 1L, 1L, 2L, r6(math.log(2.0)), 2)))
    // original query terms never propose themselves
    assert(!out.exists(_._1 == "apple"))
    intercept[IllegalArgumentException](
      Bm25.expandQuery(docs, "doc_id", "text", Seq("apple"), fbDocs = 0))
    intercept[IllegalArgumentException](
      Bm25.expandQuery(docs, "doc_id", "text", Seq("apple"), fbTerms = 0))
  }
}
