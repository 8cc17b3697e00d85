package graft.functions

import graft.SparkSpec
import graft.functions.FreqSketch.misra_gries
import org.apache.spark.sql.functions._

class FreqSketchSpec extends SparkSpec {
  import spark.implicits._

  test("exact when distinct values fit in k, any partitioning") {
    val rnd = new scala.util.Random(3)
    val vals = Seq.fill(5000)(s"v${rnd.nextInt(12)}")
    val truth = vals.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 7, 32)) {
      val got = vals.toDF("v").repartition(parts)
        .agg(misra_gries(col("v"), 16).as("hh"))
        .select(explode(col("hh")).as("s"))
        .select(col("s.value"), col("s.cnt"))
        .as[(String, Long)].collect()
      assert(got.toMap == truth, s"parts=$parts")
      // rank order: cnt desc, value asc
      assert(got.sortBy { case (v, c) => (-c, v) }.toSeq == got.toSeq)
    }
  }

  test("MG guarantee under overflow: hot items survive, counts underestimate") {
    val rnd = new scala.util.Random(9)
    // 40% one hot value, the rest spread over 500 cold values
    val n = 20000
    val vals = Seq.fill(n)(
      if (rnd.nextInt(10) < 4) "hot" else s"cold${rnd.nextInt(500)}")
    val truth = vals.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val k = 20
    val got = vals.toDF("v").repartition(11)
      .agg(misra_gries(col("v"), k).as("hh"))
      .select(explode(col("hh")).as("s"))
      .select(col("s.value"), col("s.cnt"))
      .as[(String, Long)].collect().toMap
    assert(got.size <= k)
    val err = n.toLong / (k + 1)
    // every item with true freq > n/(k+1) must be present
    truth.filter(_._2 > err).keys.foreach(v =>
      assert(got.contains(v), s"guaranteed item '$v' missing"))
    // counts never overestimate and undershoot by at most n/(k+1)
    got.foreach { case (v, c) =>
      assert(c <= truth(v), s"'$v' overestimated: $c > ${truth(v)}")
      assert(c >= truth(v) - err, s"'$v' undershot past the bound")
    }
  }

  test("grouped: independent sketches per group; nulls ignored") {
    val df = Seq(
      ("a", "x"), ("a", "x"), ("a", "y"), ("b", "z"), ("b", null)
    ).toDF("g", "v")
    val got = df.groupBy("g").agg(misra_gries(col("v"), 4).as("hh"))
      .select(col("g"), explode(col("hh")).as("s"))
      .select(col("g"), col("s.value"), col("s.cnt"))
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("a", "x", 2L), ("a", "y", 1L), ("b", "z", 1L)))
  }

  test("rejects non-string input and bad k") {
    intercept[IllegalArgumentException] { misra_gries(col("v"), 0) }
    val err = intercept[Exception] {
      Seq(1, 2).toDF("v").agg(misra_gries(col("v"), 4)).collect()
    }
    assert(err.getMessage.toLowerCase.contains("string"))
  }
}
