package graft.llm

import graft.SparkSpec

class FusionSpec extends SparkSpec {
  import spark.implicits._

  test("rrf: hand-computed fusion; absent ids contribute nothing") {
    val l1 = Seq(("a", 1), ("b", 2), ("c", 3)).toDF("id", "rank")
    val l2 = Seq(("b", 1), ("a", 2), ("d", 3)).toDF("id", "rank")
    val out = Fusion.rrf(Seq(l1, l2), "id", "rank", k = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    assert(out("a") == r6(0.0 + 1.0 / 11 + 1.0 / 12))
    assert(out("b") == r6(0.0 + 1.0 / 12 + 1.0 / 11))
    assert(out("c") == r6(0.0 + 1.0 / 13))
    assert(out("d") == r6(0.0 + 1.0 / 13))
    assert(out.size == 4)
    // list order must not change the rounded consensus
    val swapped = Fusion.rrf(Seq(l2, l1), "id", "rank", k = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(swapped == out)
  }

  test("rrf: single list is a pure rank transform; guards fire") {
    val l = Seq(("x", 1), ("y", 5)).toDF("id", "rank")
    val out = Fusion.rrf(Seq(l), "id", "rank", k = 60)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    assert(out == Map("x" -> r6(1.0 / 61), "y" -> r6(1.0 / 65)))
    intercept[IllegalArgumentException] { Fusion.rrf(Seq.empty, "id", "rank") }
    intercept[IllegalArgumentException] {
      Fusion.rrf(Seq(l.withColumnRenamed("rank", "r")), "id", "rank")
    }
    intercept[IllegalArgumentException] { Fusion.rrf(Seq(l), "id", "rank", k = -1) }
  }
}
