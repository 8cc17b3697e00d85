package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class DecaySpec extends SparkSpec {
  import spark.implicits._

  private val asOf = "2024-03-01 00:00:00"
  private val asOfMs = Timestamp.valueOf(asOf).getTime
  private def tsAgo(secs: Long) = new Timestamp(asOfMs - secs * 1000L)

  test("decayed score matches the per-row closed form") {
    val half = 3600.0
    val rows = Seq(
      (1L, tsAgo(0), 10.0),      // weight 1
      (1L, tsAgo(3600), 10.0),   // weight 1/2
      (1L, tsAgo(7200), 10.0),   // weight 1/4
      (2L, tsAgo(1800), 8.0))    // weight 2^-0.5
    val got = Decay.decayedScore(rows.toDF("k", "ts", "v"), Seq("k"),
        "ts", "v", asOf, half)
      .as[(Long, Double, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val (s1, r1, n1) = got(1L)
    assert(math.abs(s1 - (10.0 + 5.0 + 2.5)) < 1e-9)
    assert(r1 == 30.0 && n1 == 3L)
    val (s2, r2, n2) = got(2L)
    assert(math.abs(s2 - 8.0 * math.pow(2.0, -0.5)) < 1e-9)
    assert(r2 == 8.0 && n2 == 1L)
  }

  test("events after the as-of instant and null timestamps are excluded") {
    val rows = Seq(
      (1L, Some(tsAgo(60)), 5.0),
      (1L, Some(tsAgo(-60)), 100.0), // future: dropped, not amplified
      (1L, None, 100.0))
      .map { case (k, t, v) => (k, t.orNull, v) }
    val got = Decay.decayedScore(rows.toDF("k", "ts", "v"), Seq("k"),
        "ts", "v", asOf, 3600.0)
      .as[(Long, Double, Double, Long)].collect()
    assert(got.length == 1)
    assert(got.head._4 == 1L && got.head._3 == 5.0)
  }

  test("an event exactly at the as-of instant keeps weight 1") {
    val rows = Seq((1L, new Timestamp(asOfMs), 7.0))
    val got = Decay.decayedScore(rows.toDF("k", "ts", "v"), Seq("k"),
        "ts", "v", asOf, 60.0)
      .as[(Long, Double, Double, Long)].collect().head
    assert(got._2 == 7.0)
  }

  test("guards: missing columns, non-positive half-life") {
    val df = Seq((1L, tsAgo(0), 1.0)).toDF("k", "ts", "v")
    intercept[IllegalArgumentException](
      Decay.decayedScore(df, Seq("k"), "nope", "v", asOf, 60.0))
    intercept[IllegalArgumentException](
      Decay.decayedScore(df, Seq("k"), "ts", "v", asOf, 0.0))
  }
}
