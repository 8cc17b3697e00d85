package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnomalySpec extends SparkSpec {
  import spark.implicits._

  private def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6

  test("hand-computed z against the prior window, self-exclusion") {
    // integral time axis (one unit apart), width 100 covers everything
    // prior; baseline of the 6th point = 5 alternating values
    val vals = Seq(10.0, 12.0, 10.0, 12.0, 10.0, 100.0, 11.0)
    val d = vals.zipWithIndex
      .map { case (v, i) => ("u1", i.toLong, v) }
      .toDF("k", "t", "v")
    val out = Anomaly.trailingZScore(d, Seq("k"), "t", "v", width = 100L)
      .orderBy("t").collect()
    // first five points: under minBaseline -> null z, false flag
    (0 until 4).foreach { i =>
      assert(out(i).isNullAt(out(i).fieldIndex("zscore")))
      assert(!out(i).getAs[Boolean]("is_anomaly"))
    }
    // 6th point: baseline {10,12,10,12,10} -> mean 10.8, var 1.2
    val mu = 10.8
    val sd = math.sqrt(1.2)
    val z5 = out(5)
    assert(z5.getAs[Long]("n_baseline") == 5L)
    assert(z5.getAs[Double]("zscore") == r6((100.0 - mu) / sd))
    assert(z5.getAs[Boolean]("is_anomaly"))
    // 7th point: baseline now includes the spike -> huge variance, tame z
    val z6 = out(6)
    assert(z6.getAs[Long]("n_baseline") == 6L)
    assert(!z6.getAs[Boolean]("is_anomaly"))
  }

  test("zero-variance baseline yields null z; window width truncates") {
    val d = Seq(
      ("u", 0L, 5.0), ("u", 1L, 5.0), ("u", 2L, 5.0),
      ("u", 3L, 5.0), ("u", 4L, 5.0), ("u", 5L, 50.0)
    ).toDF("k", "t", "v")
    val out = Anomaly.trailingZScore(d, Seq("k"), "t", "v", width = 100L)
      .orderBy("t").collect()
    // constant history: vr = 0 -> null z even over minBaseline
    assert(out(5).isNullAt(out(5).fieldIndex("zscore")))
    assert(!out(5).getAs[Boolean]("is_anomaly"))
    // width 2: only the prior 2 units are baseline
    val narrow = Anomaly.trailingZScore(d, Seq("k"), "t", "v",
        width = 2L, minBaseline = 2)
      .orderBy("t").collect()
    assert(narrow(5).getAs[Long]("n_baseline") == 2L)
  }

  test("simultaneous rows exclude each other; guards fire") {
    // two rows at t=5 share a baseline of exactly the four prior rows
    val d = Seq(
      ("u", 0L, 1.0), ("u", 1L, 2.0), ("u", 2L, 1.0), ("u", 3L, 2.0),
      ("u", 5L, 9.0), ("u", 5L, 1.5)
    ).toDF("k", "t", "v")
    val out = Anomaly.trailingZScore(d, Seq("k"), "t", "v",
        width = 100L, minBaseline = 4)
      .orderBy("t", "v").collect()
    assert(out(4).getAs[Long]("n_baseline") == 4L)
    assert(out(5).getAs[Long]("n_baseline") == 4L)
    // same baseline stats for both: mean 1.5, var = 1/3
    val sd = math.sqrt(1.0 / 3)
    assert(out(4).getAs[Double]("zscore") == r6((1.5 - 1.5) / sd))
    assert(out(5).getAs[Double]("zscore") == r6((9.0 - 1.5) / sd))
    intercept[IllegalArgumentException](
      Anomaly.trailingZScore(d, Seq.empty, "t", "v", 100L))
    intercept[IllegalArgumentException](
      Anomaly.trailingZScore(d, Seq("k"), "t", "v", 0L))
    intercept[IllegalArgumentException](
      Anomaly.trailingZScore(d.withColumn("zscore", lit(1.0)),
        Seq("k"), "t", "v", 100L))
  }
}
