package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DistributionsSpec extends SparkSpec {
  import spark.implicits._

  test("cumulativeByKey equals the serial formulation across many partitions") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 5000).map(_ =>
      (s"k${rnd.nextInt(3)}", rnd.nextInt(400).toDouble))
    val dist = rows.toDF("c", "v").groupBy("c", "v")
      .agg(count(lit(1)).as("cnt"))
    val got = Distributions.cumulativeByKey(dist)
      .as[(String, Double, Long, Long, Long)].collect().toSet
    val want = rows.groupBy(_._1).flatMap { case (c, rs) =>
      val counts = rs.map(_._2).groupBy(identity).view
        .mapValues(_.size.toLong).toSeq.sortBy(_._1)
      val n = rs.size.toLong
      counts.scanLeft(("", 0.0, 0L, 0L, n)) { case ((_, _, _, e, _), (v, cnt)) =>
        (c, v, cnt, e + cnt, n)
      }.drop(1)
    }.toSet
    assert(got == want)
  }

  test("plan: range partitioning + partitioned windows, no keyless window") {
    val dist = (1 to 1000).map(i => ("k", i.toDouble))
      .toDF("c", "v").groupBy("c", "v").agg(count(lit(1)).as("cnt"))
    val plan = Distributions.cumulativeByKey(dist)
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"),
      s"expected a range exchange:\n$plan")
    // the big window must be partitioned by (c, __pid) — a window spec
    // over the raw distribution with no partitioning would serialize it
    val winSpecs = "windowspecdefinition\\(([^)]*)\\)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(winSpecs.nonEmpty && winSpecs.exists(_.contains("__pid")),
      s"expected a (c, __pid)-partitioned window:\n$plan")
  }
}
