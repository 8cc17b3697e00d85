package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EwmaSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("hand-checked fold: head renormalization and weights") {
    // series 10, 20, 40 at alpha=0.5: s1 = 10 (head = itself);
    // s2 = (20·1 + 10·0.5)/(1.5) = 50/3; s3 = (40 + 20·0.5 + 10·0.25)
    //      / 1.75 = 52.5/1.75 = 30
    val df = Seq((1L, 1L, ts(1), 10.0), (2L, 1L, ts(2), 20.0),
      (3L, 1L, ts(3), 40.0)).toDF("id", "k", "ts", "v")
    val out = Ewma.smooth(df, "k", "id", "ts", "v").orderBy($"id")
      .select($"id", $"ewma").as[(Long, Double)].collect()
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(out.toSeq == Seq((1L, 10.0), (2L, r6(50.0 / 3)), (3L, 30.0)))
  }

  test("within the lookback the form is the adjust=True EWM mean") {
    // for t <= lookback+1 every observation is in-frame and the value
    // is the bias-corrected EWM mean (pandas ewm(adjust=True)):
    // y_t = Σ_j (1-a)^j x_{t-j} / Σ_j (1-a)^j
    val xs = Seq(3.0, 7.0, 2.0, 9.0, 4.0, 6.0)
    val df = xs.zipWithIndex.map { case (x, i) =>
      (i.toLong, 1L, ts(i + 1), x)
    }.toDF("id", "k", "ts", "v")
    val got = Ewma.smooth(df, "k", "id", "ts", "v", alpha = 0.5,
        lookback = 8)
      .orderBy($"id").select($"ewma").as[Double].collect()
    val exp = xs.indices.map { t =>
      val w = (0 to t).map(j => math.pow(0.5, j))
      (0 to t).map(j => w(j) * xs(t - j)).sum / w.sum
    }
    got.zip(exp).foreach { case (g, e) =>
      assert(math.abs(g - e) < 1e-6, s"got $g expected $e") }
  }

  test("keys are independent; ties order by id; guards") {
    val df = Seq(
      (1L, 1L, ts(1), 100.0), (2L, 2L, ts(1), 0.0),
      // same ts: id tie-break makes 3 precede 4
      (3L, 1L, ts(2), 0.0), (4L, 1L, ts(2), 30.0))
      .toDF("id", "k", "ts", "v")
    val out = Ewma.smooth(df, "k", "id", "ts", "v")
      .orderBy($"id").select($"id", $"ewma").as[(Long, Double)]
      .collect().toMap
    assert(out(2L) == 0.0) // own key, untouched by key 1's values
    // id 3: (0 + 100·0.5)/1.5 = 33.333333 — only rows 1,3 in frame
    assert(math.abs(out(3L) - 100.0 / 3) < 1e-6)
    // id 4: (30 + 0·0.5 + 100·0.25)/1.75
    assert(math.abs(out(4L) - 55.0 / 1.75) < 1e-6)
    intercept[IllegalArgumentException](
      Ewma.smooth(df, "k", "id", "ts", "v", alpha = 1.0))
    intercept[IllegalArgumentException](
      Ewma.smooth(df, "k", "id", "ts", "v", lookback = -1))
  }
}
