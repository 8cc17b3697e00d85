package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AllocationSpec extends SparkSpec {
  import spark.implicits._

  /** Naive largest-remainder reference over one group. */
  private def hamilton(t: Long, ws: Seq[(Long, Long)]): Map[Long, Long] = {
    val sumW = ws.map(_._2).sum
    val eff = if (sumW == 0) ws.map { case (id, _) => (id, 1L) } else ws
    val w = eff.map(_._2).sum
    val floors = eff.map { case (id, wi) => (id, t * wi / w, t * wi % w) }
    var left = t - floors.map(_._2).sum
    val order = floors.sortBy { case (id, _, rem) => (-rem, id) }
    order.map { case (id, f, _) =>
      val bump = if (left > 0) { left -= 1; 1L } else 0L
      (id, f + bump)
    }.toMap
  }

  test("shares sum exactly to the total and match the reference") {
    val rnd = new scala.util.Random(17)
    val groups = (1 to 40).map { g =>
      val n = 1 + rnd.nextInt(8)
      val t = rnd.nextInt(100000).toLong
      (g.toLong, t, (1 to n).map(i => (i.toLong, rnd.nextInt(50).toLong)))
    }
    val rows = groups.flatMap { case (g, t, ws) =>
      ws.map { case (id, w) => (g, id, w.toDouble, t.toDouble) } }
    val df = rows.toDF("grp", "id", "w", "total")
    val got = Allocation.prorate(df, Seq("grp"), "w", "total", "id",
        totalScale = 0, weightScale = 0)
      .select("grp", "id", "allocated").as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    for ((g, t, ws) <- groups) {
      assert(got(g).values.sum == t, s"group $g does not reconcile")
      assert(got(g) == hamilton(t, ws), s"group $g diverged from reference")
    }
  }

  test("cents-scale snap: 10.00 across weights 1,1,1 gives 334/333/333") {
    val df = Seq((1L, 1L, 1.0, 10.0), (1L, 2L, 1.0, 10.0),
        (1L, 3L, 1.0, 10.0)).toDF("grp", "id", "w", "total")
    val got = Allocation.prorate(df, Seq("grp"), "w", "total", "id")
      .select("id", "allocated").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 334L, 2L -> 333L, 3L -> 333L))
  }

  test("remainder ties break on idCol: lowest id wins the extra unit") {
    // t=5 over equal weights 1,1: rems equal, id 1 gets the extra
    val df = Seq((1L, 2L, 1.0, 5.0), (1L, 1L, 1.0, 5.0))
      .toDF("grp", "id", "w", "total")
    val got = Allocation.prorate(df, Seq("grp"), "w", "total", "id",
        totalScale = 0)
      .select("id", "allocated").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 2L))
  }

  test("all-zero weights fall back to uniform; null weights are zero") {
    val df = Seq((1L, 1L, 0.0, 9.0), (1L, 2L, 0.0, 9.0), (1L, 3L, 0.0, 9.0),
        (2L, 1L, Double.NaN, 0.0))
      .toDF("grp", "id", "w", "total")
      .withColumn("w", when(isnan(col("w")), lit(null)).otherwise(col("w")))
    val got = Allocation.prorate(df, Seq("grp"), "w", "total", "id",
        totalScale = 0)
      .select("grp", "id", "allocated").as[(Long, Long, Long)].collect()
    assert(got.filter(_._1 == 1L).map(_._3).sorted.toSeq == Seq(3L, 3L, 3L))
    assert(got.find(_._1 == 2L).get._3 == 0L)
  }

  test("zero total allocates zero everywhere") {
    val df = Seq((1L, 1L, 3.0, 0.0), (1L, 2L, 5.0, 0.0))
      .toDF("grp", "id", "w", "total")
    val got = Allocation.prorate(df, Seq("grp"), "w", "total", "id")
      .select("allocated").as[Long].collect().toSeq
    assert(got == Seq(0L, 0L))
  }

  test("contract violations are loud: varying total, negatives, null total") {
    def run(df: org.apache.spark.sql.DataFrame) =
      intercept[Exception](Allocation.prorate(df, Seq("grp"), "w", "total",
        "id", totalScale = 0).collect())
    assert(run(Seq((1L, 1L, 1.0, 5.0), (1L, 2L, 1.0, 6.0))
      .toDF("grp", "id", "w", "total")).getMessage != null)
    assert(run(Seq((1L, 1L, -1.0, 5.0)).toDF("grp", "id", "w", "total"))
      .getMessage != null)
    assert(run(Seq((1L, 1L, 1.0, Double.NaN)).toDF("grp", "id", "w", "total")
      .withColumn("total", when(isnan(col("total")), lit(null))
        .otherwise(col("total")))).getMessage != null)
  }

  test("plan: one hash exchange on the keys, no join") {
    val df = (1 to 200).map(i => ((i % 10).toLong, i.toLong, (i % 7).toDouble,
      1000.0)).toDF("grp", "id", "w", "total")
    val plan = Allocation.prorate(df, Seq("grp"), "w", "total", "id")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected one hash exchange:\n$plan")
    assert(!plan.contains("Join"), s"no join expected:\n$plan")
  }
}
