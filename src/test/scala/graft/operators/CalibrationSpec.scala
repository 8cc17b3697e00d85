package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CalibrationSpec extends SparkSpec {
  import spark.implicits._

  test("reliability bins: hand means/rates, scaffold, edge score 1.0") {
    // bin 0 (scores 0.0x): 2 preds mean 0.05, 0 positives
    // bin 9: includes score 1.0 (clamped); 2 preds, both positive
    val d = Seq(
      (0.04, false), (0.06, false),
      (0.95, true), (1.0, true),
      (0.55, true), (0.55, false)
    ).toDF("p", "y")
    val out = Calibration.reliability(d, "p", "y")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.size == 10)
    assert(out(0L).getAs[Long]("n") == 2L &&
      out(0L).getAs[Double]("mean_predicted") == 0.05 &&
      out(0L).getAs[Double]("observed_rate") == 0.0 &&
      out(0L).getAs[Double]("gap") == 0.05)
    assert(out(9L).getAs[Long]("n") == 2L &&
      out(9L).getAs[Double]("mean_predicted") == 0.975 &&
      out(9L).getAs[Double]("observed_rate") == 1.0)
    assert(out(5L).getAs[Long]("n") == 2L &&
      out(5L).getAs[Double]("observed_rate") == 0.5)
    // empty bins scaffolded with null stats
    assert(out(3L).getAs[Long]("n") == 0L &&
      out(3L).isNullAt(out(3L).fieldIndex("mean_predicted")))
    // ECE: weighted mean of gaps over non-empty bins
    val e = Calibration.ece(Calibration.reliability(d, "p", "y"))
      .collect()(0).getDouble(0)
    val expected = (2 * 0.05 + 2 * math.abs(0.975 - 1.0) +
      2 * math.abs(0.55 - 0.5)) / 6
    assert(math.abs(e - expected) < 1e-6, s"$e vs $expected") // ece is 6dp
    intercept[IllegalArgumentException](
      Calibration.reliability(d, "p", "y", bins = 1))
  }
}
