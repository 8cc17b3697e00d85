package graft.operators

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CohortSpec extends SparkSpec {
  import spark.implicits._

  // 2024-01-01 is a Monday: week boundaries are jan 1/8/15/22
  private def d(day: Int, h: Int = 12): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")

  test("retention triangle: offset 0 is the full cohort; gaps drop out") {
    val df = Seq(
      (1L, d(1)), (1L, d(9)), (1L, d(16)),   // w0 cohort, active w1, w2
      (2L, d(2)), (2L, d(17)),               // w0 cohort, skips w1, active w2
      (3L, d(10))                            // w1 cohort only
    ).toDF("u", "t")
    val got = Cohort.retention(df, "u", "t")
      .as[(Timestamp, Int, Long)].collect().toSet
    val w0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val w1 = Timestamp.valueOf("2024-01-08 00:00:00")
    assert(got == Set(
      (w0, 0, 2L), (w0, 1, 1L), (w0, 2, 2L),
      (w1, 0, 1L)))
  }

  test("multiple events in one week count a user once") {
    val df = Seq((1L, d(1)), (1L, d(3)), (1L, d(5))).toDF("u", "t")
    val got = Cohort.retention(df, "u", "t").as[(Timestamp, Int, Long)]
      .collect().toSeq
    assert(got == Seq((Timestamp.valueOf("2024-01-01 00:00:00"), 0, 1L)))
  }

  test("missing columns rejected") {
    intercept[IllegalArgumentException] {
      Cohort.retention(Seq((1L, d(1))).toDF("u", "t"), "u", "nope")
    }
  }
}
