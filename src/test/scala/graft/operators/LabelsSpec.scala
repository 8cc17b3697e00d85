package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LabelsSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, Long)], horizon: Long,
                  asOf: Option[Long] = None) =
    Labels.futureActivity(rows.toDF("k", "t", "id"), Seq("k"), "t", "id",
        horizon, asOf)
      .orderBy("k", "t", "id")
      .select("k", "t", "next_gap", "label_active", "label_censored")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getBoolean(3), r.getBoolean(4)))

  test("active within horizon, churned beyond it, censored near the end") {
    // corpus end = 1000. horizon 100.
    val got = run(Seq(
      (1L, 0L, 1L), (1L, 50L, 2L),    // gap 50  -> active
      (1L, 300L, 3L),                 // gap 650 -> churned, knowable
      (1L, 950L, 4L),                 // last, end-t=50 < 100 -> censored
      (2L, 1000L, 5L)), horizon = 100)
    assert(got.toSeq == Seq(
      (1L, 0L, Some(50L), true, false),
      (1L, 50L, Some(250L), false, false),
      (1L, 300L, Some(650L), false, false),
      (1L, 950L, None, false, true),
      (2L, 1000L, None, false, true)))
  }

  test("a key's old last event is NOT censored against the corpus end") {
    // key 1's last event sits 900 before the corpus end (key 2): its
    // inactivity is proven, label churned with no censor flag
    val got = run(Seq((1L, 100L, 1L), (2L, 1000L, 2L)), horizon = 100)
    assert(got.toSeq(0) == ((1L, 100L, None, false, false)))
  }

  test("explicit asOfEnd overrides the derived corpus end") {
    val got = run(Seq((1L, 100L, 1L)), horizon = 100, asOf = Some(150L))
    assert(got.toSeq == Seq((1L, 100L, None, false, true)))
    val got2 = run(Seq((1L, 100L, 1L)), horizon = 100, asOf = Some(500L))
    assert(got2.toSeq == Seq((1L, 100L, None, false, false)))
  }

  test("gap exactly at the horizon is active (inclusive)") {
    val got = run(Seq((1L, 0L, 1L), (1L, 100L, 2L)), horizon = 100,
      asOf = Some(1000L))
    assert(got.toSeq(0)._4)
  }

  test("misuse is loud: keyless, bad horizon, reserved names") {
    val df = Seq((1L, 1L, 1L)).toDF("k", "t", "id")
    intercept[IllegalArgumentException](
      Labels.futureActivity(df, Nil, "t", "id", 10))
    intercept[IllegalArgumentException](
      Labels.futureActivity(df, Seq("k"), "t", "id", 0))
    intercept[IllegalArgumentException](Labels.futureActivity(
      df.withColumn("label_active", lit(true)), Seq("k"), "t", "id", 10))
  }
}
