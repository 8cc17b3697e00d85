package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RollingSpec extends SparkSpec {
  import spark.implicits._

  test("trailing counts/sums match a naive per-row scan, ties included") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 500).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(300).toLong, i.toLong))
    val df = rows.toDF("key", "t", "v")
    val got = Rolling.withTrailing(df, Seq("key"), "t", 50L)(
        w => count(lit(1)).over(w).as("n"),
        w => sum(col("v")).over(w).as("s"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val want = rows.map { case (k, t, v) =>
      val in = rows.filter(r => r._1 == k && r._2 >= t - 50 && r._2 <= t)
      (k, t, v, in.size.toLong, in.map(_._3).sum)
    }.toSet
    assert(got == want)
  }

  test("timestamp columns: exact microsecond bounds, inclusive ends") {
    val t0 = java.sql.Timestamp.valueOf("2024-03-01 10:00:00")
    def at(ms: Long) = new java.sql.Timestamp(t0.getTime + ms)
    // 1h window = 3_600_000_000 µs; rows at exactly -1h and now both count
    val df = Seq((1L, at(0), 1L), (1L, at(3600000L), 2L),
      (1L, at(3600001L), 3L)).toDF("key", "ts", "v")
    val got = Rolling.withTrailing(df, Seq("key"), "ts", 3600L * 1000000)(
        w => count(lit(1)).over(w).as("n"))
      .select("v", "n").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 2L))
  }

  test("guards: keyless windows and bad time types rejected") {
    val df = Seq((1L, 2L)).toDF("t", "v")
    intercept[IllegalArgumentException](
      Rolling.trailingSpec(df, Nil, "t", 10L))
    val bad = Seq(("x", 1L)).toDF("t", "v")
    intercept[IllegalArgumentException](
      Rolling.trailingSpec(bad, Seq("v"), "t", 10L))
  }

  test("plan: single window node, one exchange on the keys") {
    val df = (1 to 100).map(i => (i % 3, i.toLong, i.toLong))
      .toDF("key", "t", "v")
    val plan = Rolling.withTrailing(df, Seq("key"), "t", 10L)(
        w => count(lit(1)).over(w).as("n"),
        w => sum(col("v")).over(w).as("s"))
      .queryExecution.executedPlan.toString
    assert("Window".r.findAllIn(plan).length >= 1)
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1,
      s"both aggs must share one window exchange:\n$plan")
  }
}
