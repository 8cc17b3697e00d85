package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ForensicsSpec extends SparkSpec {
  import spark.implicits._

  private def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6

  test("benford: string leading digit, scaffold zeros, scaling immunity") {
    // values 1xx..9xx planted so digits 1..3 dominate; zeros/nulls drop
    val d = (Seq(123.0, 150.0, 19.99, 234.5, 250.0, 3.14, 0.0) ++
      Seq(null.asInstanceOf[java.lang.Double]).map(_.asInstanceOf[Double]))
      .toDF("v")
    val out = Forensics.benford(d, "v")
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(out.size == 9, "all nine digits must report")
    // 6 nonzero values: digit 1 x3 (123, 150, 19.99), 2 x2, 3 x1
    assert(out(1).getAs[Long]("n") == 3L)
    assert(out(2).getAs[Long]("n") == 2L)
    assert(out(3).getAs[Long]("n") == 1L)
    assert(out(9).getAs[Long]("n") == 0L &&
      out(9).getAs[Double]("observed_p") == 0.0)
    assert(out(1).getAs[Double]("observed_p") == 0.5)
    assert(out(1).getAs[Double]("expected_p") == r6(math.log10(2.0)))
    assert(out(1).getAs[Double]("dev") ==
      math.abs(0.5 - r6(math.log10(2.0))))
    // powers-of-ten are exact: 1000.00 leads with 1 (no log10 wobble)
    val p = Forensics.benford(Seq(1000.0, 999.99).toDF("v"), "v")
      .collect().map(r => r.getInt(0) -> r.getAs[Long]("n")).toMap
    assert(p(1) == 1L && p(9) == 1L)
  }

  test("concentration: monopoly, even split, hand gini") {
    // market a: one member owns everything -> HHI 10000, gini (n-1)/n... n=1 -> 0
    // market b: two equal members -> HHI 5000, gini 1/4? hand-compute
    val d = Seq(("a", 1L, 100.0),
      ("b", 1L, 50.0), ("b", 2L, 50.0),
      ("c", 1L, 10.0), ("c", 2L, 20.0), ("c", 3L, 70.0))
      .toDF("mkt", "member", "rev")
    val out = Forensics.concentration(d, Seq("mkt"), "rev", "member")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getAs[Double]("hhi") == 10000.0 &&
      out("a").getAs[Double]("gini") == 0.0)
    assert(out("b").getAs[Double]("hhi") == 5000.0)
    // gini(b): ranks (1,2) values (50,50): 2*(50+100)/(2*100) - 3/2 = 0
    assert(out("b").getAs[Double]("gini") == 0.0)
    // market c: values 10,20,70: HHI = (100+400+4900)/10000 * 1e4 = 5400
    assert(out("c").getAs[Double]("hhi") == 5400.0)
    // gini(c): 2*(10*1+20*2+70*3)/(3*100) - 4/3 = 2*260/300 - 4/3
    assert(out("c").getAs[Double]("gini") ==
      r6(2.0 * 260 / 300 - 4.0 / 3))
    assert(out("c").getAs[Double]("total") == 100.0)
    intercept[IllegalArgumentException](
      Forensics.concentration(d, Seq.empty, "rev", "member"))
  }
}
