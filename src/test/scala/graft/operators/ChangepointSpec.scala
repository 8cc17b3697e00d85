package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChangepointSpec extends SparkSpec {
  import spark.implicits._

  /** Reference implementation: the literal Page recursion. */
  private def pageRecursion(vs: Seq[Double], target: Double, slack: Double)
      : (Seq[Double], Seq[Double]) = {
    var hi = 0.0; var lo = 0.0
    val his = Seq.newBuilder[Double]; val los = Seq.newBuilder[Double]
    for (v <- vs) {
      hi = math.max(0.0, hi + (v - target - slack))
      lo = math.max(0.0, lo + (target - v - slack))
      his += hi; los += lo
    }
    (his.result(), los.result())
  }

  test("prefix-min formulation equals the literal Page recursion") {
    val rnd = new scala.util.Random(11)
    val rows = for {
      k <- 1 to 5
      i <- 1 to 200
    } yield (k.toLong, i.toLong, i.toLong,
      math.floor((rnd.nextGaussian() * 10 + (if (i > 120) 65.0 else 50.0)) *
        100) / 100)
    val df = rows.toDF("key", "t", "id", "v")
    val got = Changepoint.cusum(df, Seq("key"), "t", "id", "v",
        target = 50.0, slack = 5.0, threshold = 100.0)
      .select("key", "t", "cusum_high", "cusum_low", "alarm_high")
      .as[(Long, Long, Double, Double, Boolean)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    for (k <- 1L to 5L) {
      val vs = rows.filter(_._1 == k).sortBy(_._2).map(_._4)
      val (hiWant, loWant) = pageRecursion(vs, 50.0, 5.0)
      val kGot = got(k)
      kGot.map(_._3).zip(hiWant).zipWithIndex.foreach { case ((g, w), i) =>
        assert(math.abs(g - w) < 1e-9, s"key $k high[$i]: $g vs $w") }
      kGot.map(_._4).zip(loWant).zipWithIndex.foreach { case ((g, w), i) =>
        assert(math.abs(g - w) < 1e-9, s"key $k low[$i]: $g vs $w") }
      // the engineered level shift at i>120 must eventually alarm high
      assert(kGot.exists(_._5), s"key $k: shift never alarmed")
      assert(!kGot.take(60).exists(_._5), s"key $k: alarmed before any shift")
    }
  }

  test("a level DROP drives the low side, not the high side") {
    val vs = (1 to 60).map(i => if (i > 30) 20.0 else 50.0)
    val df = vs.zipWithIndex.map { case (v, i) =>
      (1L, i.toLong, i.toLong, v) }.toDF("key", "t", "id", "v")
    val out = Changepoint.cusum(df, Seq("key"), "t", "id", "v",
        target = 50.0, slack = 5.0, threshold = 100.0)
      .orderBy("t").select("alarm_high", "alarm_low")
      .as[(Boolean, Boolean)].collect()
    assert(!out.exists(_._1), "high side must stay quiet on a drop")
    assert(out.exists(_._2), "low side must alarm on a sustained drop")
    // evidence accumulates at 25/step from row 30; h=100 → 5th drop,
    // S = 125 > 100 at index 34
    assert(out.indexWhere(_._2) == 34, "alarm row must be deterministic")
  }

  test("slack absorbs small drift; zero slack accumulates it") {
    val vs = (1 to 50).map(_ => 53.0) // +3 drift forever
    val df = vs.zipWithIndex.map { case (v, i) =>
      (1L, i.toLong, i.toLong, v) }.toDF("key", "t", "id", "v")
    def alarms(slack: Double) = Changepoint.cusum(df, Seq("key"), "t", "id",
        "v", target = 50.0, slack = slack, threshold = 100.0)
      .filter(col("alarm_high")).count()
    assert(alarms(5.0) == 0, "drift below slack must never alarm")
    assert(alarms(0.0) > 0, "zero slack must accumulate the drift")
  }

  test("null values: null statistics, false alarms, zero evidence") {
    val df = Seq(
      (1L, 1L, 1L, Some(100.0)), (1L, 2L, 2L, None),
      (1L, 3L, 3L, Some(100.0)))
      .toDF("key", "t", "id", "v")
    val out = Changepoint.cusum(df, Seq("key"), "t", "id", "v",
        target = 50.0, slack = 0.0, threshold = 60.0)
      .orderBy("t")
      .select("cusum_high", "alarm_high").collect()
    assert(out(1).isNullAt(0) && !out(1).getBoolean(1))
    // the null contributed nothing: 50 + 50 = 100 of evidence at row 3
    assert(out(2).getDouble(0) == 100.0 && out(2).getBoolean(1))
  }

  test("equal timestamps break ties on idCol deterministically") {
    val df = Seq((1L, 5L, 2L, 80.0), (1L, 5L, 1L, 20.0))
      .toDF("key", "t", "id", "v")
    val out = Changepoint.cusum(df, Seq("key"), "t", "id", "v",
        target = 50.0, slack = 0.0, threshold = 1000.0)
      .orderBy("id").select("id", "cusum_high", "cusum_low")
      .as[(Long, Double, Double)].collect()
    // id=1 first: hi=max(0,-30)=0, lo=30; then id=2: hi=30, lo=0
    assert(out.toSeq == Seq((1L, 0.0, 30.0), (2L, 30.0, 0.0)))
  }

  test("alarm decides on exact scaled integers at the boundary") {
    // statistic lands EXACTLY on h — alarm is strictly-greater, so no
    val df = Seq((1L, 1L, 1L, 60.0)).toDF("key", "t", "id", "v")
    val at = Changepoint.cusum(df, Seq("key"), "t", "id", "v",
        target = 50.0, slack = 0.0, threshold = 10.0)
      .select("alarm_high").as[Boolean].head()
    assert(!at, "S == h must not alarm (strictly greater)")
    val over = Changepoint.cusum(df, Seq("key"), "t", "id", "v",
        target = 50.0, slack = 0.0, threshold = 9.9999)
      .select("alarm_high").as[Boolean].head()
    assert(over)
  }

  test("misuse is loud: keyless, negative slack, reserved columns") {
    val df = Seq((1L, 1L, 1L, 1.0)).toDF("key", "t", "id", "v")
    intercept[IllegalArgumentException](
      Changepoint.cusum(df, Nil, "t", "id", "v", 0, 0, 1))
    intercept[IllegalArgumentException](
      Changepoint.cusum(df, Seq("key"), "t", "id", "v", 0, -1, 1))
    intercept[IllegalArgumentException](
      Changepoint.cusum(df.withColumn("cusum_high", lit(1)),
        Seq("key"), "t", "id", "v", 0, 0, 1))
  }

  test("plan: ONE exchange (hash by key), no join, no global sort") {
    val df = (1 to 100).map(i => ((i % 5).toLong, i.toLong, i.toLong,
      i.toDouble)).toDF("key", "t", "id", "v")
    val plan = Changepoint.cusum(df, Seq("key"), "t", "id", "v",
        50.0, 5.0, 100.0)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected one hash exchange:\n$plan")
    assert(!plan.contains("Join"), s"no join expected:\n$plan")
    assert(!plan.contains("Exchange rangepartitioning"),
      s"no global sort expected:\n$plan")
  }
}
