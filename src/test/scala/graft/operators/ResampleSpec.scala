package graft.operators

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int, m: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("grid spans first..last bucket; gaps forward-fill and count zero") {
    val df = Seq(
      (1L, ts(1, 10), 2.0), (1L, ts(1, 50), 4.0), // hour 1: avg 3
      (1L, ts(4, 5), 10.0),                       // hours 2,3 are gaps
      (2L, ts(2), 7.0)
    ).toDF("k", "t", "v")
    val got = Resample.resample(df, Seq("k"), "t", "v")
      .select(col("k"), col("bucket_start"), col("avg_value"),
        col("n_events"), col("filled"))
      .as[(Long, Timestamp, Double, Long, Boolean)].collect().toSet
    assert(got == Set(
      (1L, ts(1), 3.0, 2L, false),
      (1L, ts(2), 3.0, 0L, true),
      (1L, ts(3), 3.0, 0L, true),
      (1L, ts(4), 10.0, 1L, false),
      (2L, ts(2), 7.0, 1L, false)))
  }

  test("all-null bucket: not a gap, zero count, value fills forward") {
    val df = Seq(
      (1L, ts(1), Some(5.0)), (1L, ts(2), None), (1L, ts(3), Some(9.0))
    ).toDF("k", "t", "v")
    val got = Resample.resample(df, Seq("k"), "t", "v")
      .select(col("bucket_start"), col("avg_value"), col("n_events"),
        col("filled"))
      .as[(Timestamp, Double, Long, Boolean)].collect().toSet
    assert(got == Set(
      (ts(1), 5.0, 1L, false),
      (ts(2), 5.0, 0L, false), // rows existed, values all null
      (ts(3), 9.0, 1L, false)))
  }

  test("custom interval; single-bucket key emits one cell") {
    val df = Seq((1L, ts(1, 7), 2.0), (1L, ts(1, 22), 4.0)).toDF("k", "t", "v")
    val got = Resample.resample(df, Seq("k"), "t", "v", every = "15 minutes")
      .select(col("bucket_start"), col("avg_value"), col("filled"))
      .as[(Timestamp, Double, Boolean)].collect().toSet
    assert(got == Set((ts(1, 0), 2.0, false), (ts(1, 15), 4.0, false)))
    val one = Resample.resample(df.limit(1), Seq("k"), "t", "v")
    assert(one.count() == 1)
  }

  test("reserved names and missing columns rejected") {
    val df = Seq((1L, ts(1), 2.0)).toDF("k", "t", "v")
    intercept[IllegalArgumentException] {
      Resample.resample(df, Nil, "t", "v")
    }
    intercept[IllegalArgumentException] {
      Resample.resample(df.withColumn("filled", lit(true)), Seq("k"), "t", "v")
    }
    intercept[IllegalArgumentException] {
      Resample.resample(df, Seq("k"), "nope", "v")
    }
  }
}
