package graft.operators

import graft.SparkSpec

class RobustStatsSpec extends SparkSpec {
  import spark.implicits._

  private def naive(vs: Seq[Double]) = {
    def lowerMed(xs: Seq[Double]) = xs.sorted.apply((xs.size - 1) / 2)
    val med = lowerMed(vs)
    val mad = lowerMed(vs.map(v => math.abs(v - med)))
    (med, mad)
  }

  test("robust z and outlier flags match the naive median/MAD") {
    val rnd = new scala.util.Random(42)
    val base = (1 to 400).map(_ => rnd.nextGaussian() * 10 + 100)
    val vs = base ++ Seq(10000.0, -10000.0) // two wild outliers
    val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val (med, mad) = naive(vs)
    val got = RobustStats.outliers(df, "v", cutoff = 3.5)
      .as[(Long, Double, Double, Boolean)].collect()
    got.foreach { case (i, v, rz, out) =>
      val wantZ = math.rint((v - med) / (1.4826 * mad) * 1e6) / 1e6
      assert(math.abs(rz - wantZ) < 1e-9, s"row $i")
      assert(out == (math.abs(v - med) > 3.5 * 1.4826 * mad), s"flag $i")
    }
    // the two planted outliers are flagged; the gaussian bulk mostly not
    assert(got.count(_._4) >= 2 && got.count(_._4) < 20)
  }

  test("zero MAD (majority-constant column): z=0, nothing flagged") {
    val df = (Seq.fill(10)(5.0) ++ Seq(9.0)).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val got = RobustStats.outliers(df, "v").as[(Long, Double, Double, Boolean)]
      .collect()
    assert(got.forall(r => r._3 == 0.0 && !r._4))
  }

  test("nulls stay null in both outputs; guards reject bad input") {
    val df = Seq(Some(1.0), Some(2.0), Some(3.0), None)
      .zipWithIndex.map { case (v, i) => (i.toLong, v.map(Double.box).orNull) }
      .toDF("id", "v")
    val rows = RobustStats.outliers(df, "v").collect()
    val nullRow = rows.find(_.isNullAt(1)).get
    assert(nullRow.isNullAt(2) && nullRow.isNullAt(3))
    intercept[IllegalArgumentException](RobustStats.outliers(df, "nope"))
    intercept[IllegalArgumentException](RobustStats.outliers(df, "v", cutoff = 0))
  }

  test("trimmed mean: hand ranks, tied extremes, p=0 degenerates to mean") {
    // 1..10 at p=0.1: k=1, keep sorted ranks 2..9 -> mean 5.5
    val d = (1 to 10).map(v => ("a", v.toDouble)).toDF("k", "v")
    val r = RobustStats.trimmedMean(d, "k", "v").collect()(0)
    assert(r.getLong(1) == 10L && r.getLong(2) == 8L)
    assert(r.getDouble(3) == 5.5)
    // tied extremes: [1,1,1,5,9,9,9] at p=0.2: k=floor(1.4)=1 ->
    // exactly ONE of the tied 1s and ONE 9 drop (span-overlap
    // arithmetic, not value-level filtering): mean of [1,1,5,9,9]=5.0
    val t = Seq(1.0, 1.0, 1.0, 5.0, 9.0, 9.0, 9.0)
      .map(("a", _)).toDF("k", "v")
    val rt = RobustStats.trimmedMean(t, "k", "v", p = 0.2).collect()(0)
    assert(rt.getLong(2) == 5L && rt.getDouble(3) == 5.0)
    // p=0: the plain mean, all rows kept
    val r0 = RobustStats.trimmedMean(d, "k", "v", p = 0.0).collect()(0)
    assert(r0.getLong(2) == 10L && r0.getDouble(3) == 5.5)
    // per-key independence
    val multi = ((1 to 10).map(v => ("a", v.toDouble)) ++
      Seq(("b", 100.0), ("b", 200.0))).toDF("k", "v")
    val byKey = RobustStats.trimmedMean(multi, "k", "v")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(byKey("a") == 5.5 && byKey("b") == 150.0)
    intercept[IllegalArgumentException](
      RobustStats.trimmedMean(d, "k", "v", p = 0.5))
    intercept[IllegalArgumentException](
      RobustStats.trimmedMean(d, "nope", "v"))
  }
}
