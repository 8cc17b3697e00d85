package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AbTestSpec extends SparkSpec {
  import spark.implicits._

  private def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6

  test("two-proportion z: hand statistic, lifts, significance call") {
    // control: 1000 subjects, 100 conversions; variant a: 1000, 150
    val subjects = (
      (1 to 1000).map(i => ("control", i <= 100)) ++
        (1 to 1000).map(i => ("a", i <= 150)) ++
        (1 to 10).map(i => ("b", i <= 1))
    ).toDF("variant", "converted")
    val out = AbTest.proportionTest(subjects, "variant", "converted",
        "control")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getAs[Long]("n_variant") == 1000L &&
      a.getAs[Long]("conv_variant") == 150L)
    assert(a.getAs[Double]("rate_control") == 0.1 &&
      a.getAs[Double]("rate_variant") == 0.15)
    assert(a.getAs[Double]("abs_lift") == 0.05)
    assert(a.getAs[Double]("rel_lift") == 0.5)
    val pPool = 250.0 / 2000
    val se = math.sqrt(pPool * (1 - pPool) * (1.0 / 1000 + 1.0 / 1000))
    assert(a.getAs[Double]("z") == r6(0.05 / se))
    assert(a.getAs[Boolean]("significant_95")) // z ~ 3.3
    // tiny arm b: z well under 1.96
    assert(!out("b").getAs[Boolean]("significant_95"))
  }

  test("degenerate pools and missing control behave, not explode") {
    // both arms convert 100%: pooled variance 0 -> null z, false flag
    val all = Seq(("control", true), ("control", true),
      ("a", true), ("a", true)).toDF("variant", "converted")
    val r = AbTest.proportionTest(all, "variant", "converted", "control")
      .collect()(0)
    assert(r.isNullAt(r.fieldIndex("z")))
    assert(!r.getAs[Boolean]("significant_95"))
    // integer 0/1 indicator works like boolean
    val ints = Seq(("control", 0), ("control", 1), ("a", 1), ("a", 1))
      .toDF("variant", "converted")
    val ri = AbTest.proportionTest(ints, "variant", "converted", "control")
      .collect()(0)
    assert(ri.getAs[Long]("conv_variant") == 2L)
    // no control rows -> empty report (nothing to compare against)
    assert(AbTest.proportionTest(
      Seq(("a", true)).toDF("variant", "converted"),
      "variant", "converted", "control").count() == 0)
    intercept[IllegalArgumentException](AbTest.proportionTest(
      all, "nope", "converted", "control"))
  }
}
