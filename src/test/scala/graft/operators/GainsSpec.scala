package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GainsSpec extends SparkSpec {
  import spark.implicits._

  test("perfect model: all responders in the top buckets, lift = 1/rate") {
    // 100 rows, 20 responders with the 20 highest scores, 5 buckets
    val df = (1 to 100).map(i => (i.toLong, (101 - i).toDouble, i <= 20))
      .toDF("id", "score", "label")
    val got = Gains.liftTable(df, "score", "label", "id", buckets = 5)
      .orderBy("bucket")
      .select("bucket", "n", "responders", "response_rate", "cum_capture",
        "lift", "cum_lift")
      .as[(Int, Long, Long, Double, Double, Double, Double)].collect()
    assert(got.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((1, 20L, 20L), (2, 20L, 0L), (3, 20L, 0L), (4, 20L, 0L),
        (5, 20L, 0L)))
    assert(got(0)._4 == 1.0 && got(0)._5 == 1.0)
    assert(got(0)._6 == 5.0) // 100% rate vs 20% base = 5x
    assert(got(4)._7 == 1.0) // full population: lift 1 by definition
  }

  test("uniform responders: every bucket sits at lift 1") {
    val df = (1 to 200).map(i => (i.toLong, (i % 97).toDouble, i % 4 == 0))
      .toDF("id", "score", "label")
    val got = Gains.liftTable(df, "score", "label", "id")
      .select("n", "lift").as[(Long, Double)].collect()
    assert(got.map(_._1).sum == 200)
    // responders are uncorrelated with score mod-pattern; lifts hover
    // near 1 — just pin totals and bounds here
    assert(got.forall(r => r._2 >= 0.0))
  }

  test("bucket cuts replay NTILE exactly, ties broken by id") {
    // 7 rows, 3 buckets: NTILE gives 3/2/2
    val df = Seq((1L, 5.0, true), (2L, 5.0, false), (3L, 5.0, true),
        (4L, 4.0, false), (5L, 3.0, true), (6L, 2.0, false),
        (7L, 1.0, true))
      .toDF("id", "score", "label")
    val got = Gains.liftTable(df, "score", "label", "id", buckets = 3)
      .orderBy("bucket").select("bucket", "n", "responders")
      .as[(Int, Long, Long)].collect().toSeq
    // positions 0..6: buckets 0,0,0 | 1,1 | 2,2 → ids 1,2,3 | 4,5 | 6,7
    assert(got == Seq((1, 3L, 2L), (2, 2L, 1L), (3, 2L, 1L)))
  }

  test("numeric labels, null scores excluded, no responders → null lifts") {
    val df = Seq((1L, Some(9.0), 0L), (2L, Some(8.0), 0L),
        (3L, None, 1L))
      .toDF("id", "score", "label")
    val got = Gains.liftTable(df, "score", "label", "id", buckets = 2)
      .orderBy("bucket").collect()
    assert(got.map(_.getAs[Long]("n")).sum == 2) // null score dropped
    assert(got.forall(r => r.isNullAt(r.fieldIndex("lift"))))
  }

  test("null labels are loud") {
    val df = Seq((1L, 1.0, Some(true)), (2L, 2.0, None))
      .toDF("id", "score", "label")
    val ex = intercept[Exception](
      Gains.liftTable(df, "score", "label", "id").collect())
    assert(ex.getMessage != null)
  }

  test("plan: no single-reducer global window over the full data") {
    val df = (1 to 1000).map(i => (i.toLong, (i % 37).toDouble, i % 5 == 0))
      .toDF("id", "score", "label")
    val plan = Gains.liftTable(df, "score", "label", "id")
      .queryExecution.executedPlan.toString
    // the only Exchange SinglePartition allowed is over the tiny
    // per-partition-counts / per-bucket frames, never the row stream:
    // assert the row-level path is a range exchange
    assert(plan.contains("Exchange rangepartitioning"),
      s"row positions must ride range partitioning:\n$plan")
  }
}
