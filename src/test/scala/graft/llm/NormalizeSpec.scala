package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("minMax: [0,1] per group, constants to 0, exact values") {
    val df = Seq(("a", Some(10.0)), ("a", Some(20.0)), ("a", Some(15.0)),
      ("b", Some(7.0)), ("b", Some(7.0)), ("b", None))
      .map { case (g, v) => (g, v.map(Double.box).orNull) }.toDF("g", "v")
    val rows = Normalize.minMax(df, Seq("v"), by = Seq("g"))
      .select("g", "v", "v_mm").collect()
    val got = rows.filterNot(_.isNullAt(1))
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(got(("a", 10.0)) == 0.0 && got(("a", 20.0)) == 1.0 &&
      got(("a", 15.0)) == 0.5)
    assert(got(("b", 7.0)) == 0.0) // constant group
    // a null in a constant group stays null, not 0.0
    assert(rows.filter(_.isNullAt(1)).forall(_.isNullAt(2)))
  }

  test("zscore: mean 0 / unit variance per group; zero-variance to 0") {
    val df = Seq(("a", 2.0), ("a", 4.0), ("a", 6.0), ("b", 5.0), ("b", 5.0))
      .toDF("g", "v")
    val rows = Normalize.zscore(df, Seq("v"), by = Seq("g"))
      .select("g", "v", "v_z").as[(String, Double, Double)].collect()
    val a = rows.filter(_._1 == "a").map(_._3)
    assert(math.abs(a.sum) < 1e-9)
    assert(rows.filter(_._1 == "b").forall(_._3 == 0.0))
    // sample stddev of {2,4,6} = 2 → z = (2-4)/2 = -1
    assert(rows.find(r => r._1 == "a" && r._2 == 2.0).get._3 == -1.0)
  }

  test("global (ungrouped) stats broadcast back; null values pass through") {
    val df = Seq(Some(1.0), Some(3.0), None).map(v =>
      Tuple1(v.map(Double.box).orNull)).toDF("v")
    val mm = Normalize.minMax(df, Seq("v")).select("v_mm").collect()
    assert(mm.count(_.isNullAt(0)) == 1)
    assert(mm.flatMap(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
      .toSet == Set(0.0, 1.0))
  }

  test("quantileRank equals cume_dist, ties share the rank") {
    val df = Seq(1.0, 2.0, 2.0, 3.0).map(Tuple1(_)).toDF("v")
    val got = Normalize.quantileRank(df, Seq("v"))
      .select("v", "v_qr").as[(Double, Double)].collect().toSet
    assert(got == Set((1.0, 0.25), (2.0, 0.75), (3.0, 1.0)))
  }

  test("quantileRank: multiple columns independently, nulls stay null") {
    val df = Seq((Some(1.0), Some(10.0)), (Some(2.0), None))
      .map { case (a, b) =>
        (a.map(Double.box).orNull, b.map(Double.box).orNull) }
      .toDF("a", "b")
    val out = Normalize.quantileRank(df, Seq("a", "b")).collect()
    val byA = out.map(r => r.getDouble(r.fieldIndex("a")) -> r).toMap
    assert(byA(1.0).getDouble(byA(1.0).fieldIndex("a_qr")) == 0.5)
    assert(byA(2.0).getDouble(byA(2.0).fieldIndex("a_qr")) == 1.0)
    assert(byA(1.0).getDouble(byA(1.0).fieldIndex("b_qr")) == 1.0)
    assert(byA(2.0).isNullAt(byA(2.0).fieldIndex("b_qr")))
  }

  test("guards: missing / non-numeric columns rejected") {
    val df = Seq((1L, "x")).toDF("id", "s")
    intercept[IllegalArgumentException](Normalize.minMax(df, Nil))
    intercept[IllegalArgumentException](Normalize.zscore(df, Seq("s")))
    intercept[IllegalArgumentException](Normalize.quantileRank(df, Seq("no")))
  }
}
