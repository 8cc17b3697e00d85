package graft.llm

import graft.SparkSpec

class FeatureSelectSpec extends SparkSpec {
  import spark.implicits._

  test("chi2: hand contingency on a planted label signal") {
    // 6 docs, 2 labels; "alpha" appears in all 3 pos docs and 0 neg
    // (perfect association), "common" in all 6 (excluded: df = N),
    // "beta" in 1 pos + 1 neg (weak), "rare" in 1 doc (df < minDf)
    val docs = Seq(
      (1L, "pos", "alpha beta common"),
      (2L, "pos", "alpha common"),
      (3L, "pos", "alpha common"),
      (4L, "neg", "beta common"),
      (5L, "neg", "common rare"),
      (6L, "neg", "common")
    ).toDF("doc_id", "label", "text")
    val out = FeatureSelect.chiSquareTerms(docs, "doc_id", "text", "label",
        k = 5, minDf = 2)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getDouble(3)))
    val terms = out.map(t => (t._1, t._3)).toSet
    assert(!terms.exists(_._2 == "common"), "df = N term must be excluded")
    assert(!terms.exists(_._2 == "rare"), "df < minDf term must be excluded")
    // alpha for pos: A=3 B=0 C=0 D=3 → chi2 = 6*(9-0)^2/(3*3*3*3) = 6.0
    val alphaPos = out.find(t => t._1 == "pos" && t._3 == "alpha").get
    assert(alphaPos._4 == 6.0 && alphaPos._2 == 1,
      "perfect association scores N and ranks first")
    // beta: A=1 B=1 C=2 D=2 → x = 2-2 = 0 → chi2 = 0 (no association)
    assert(out.find(t => t._1 == "pos" && t._3 == "beta").get._4 == 0.0)
    // symmetric: alpha's chi2 is identical for the neg label (A=0 B=3
    // C=3 D=0 → x = -9, squared)
    assert(out.find(t => t._1 == "neg" && t._3 == "alpha").get._4 == 6.0)
    intercept[IllegalArgumentException] {
      FeatureSelect.chiSquareTerms(docs, "doc_id", "text", "label", k = 0)
    }
  }

  test("chi2: duplicate tokens inside one doc count once") {
    val docs = Seq(
      (1L, "a", "spam spam spam other"),
      (2L, "b", "clean other")
    ).toDF("doc_id", "label", "text")
    val out = FeatureSelect.chiSquareTerms(docs, "doc_id", "text", "label",
        k = 10, minDf = 1)
      .collect().map(r => (r.getString(2), r.getDouble(3))).toMap
    // spam: A(a)=1 B=0 C=0 D=1 → chi2 = 2*(1)^2/(1*1*1*1) = 2.0 — would
    // differ if the 3 in-doc repeats inflated the contingency
    assert(out("spam") == 2.0)
  }
}
