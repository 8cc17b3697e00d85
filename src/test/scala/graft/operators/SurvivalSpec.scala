package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  private def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6

  test("kaplan-meier: textbook hand curve with censoring") {
    // classic small example: durations (event?) =
    // 1(died), 2(died), 3(censored), 4(died), 5(censored)
    val d = Seq((1L, true), (2L, true), (3L, false), (4L, true),
      (5L, false)).toDF("dur", "ev")
    val out = Survival.kaplanMeier(d, "dur", "ev")
      .collect().map(r => r.getLong(0) -> r).toMap
    // t=1: n=5, d=1 -> S = 4/5
    assert(out(1L).getAs[Long]("n_at_risk") == 5L)
    assert(out(1L).getAs[Double]("survival") == r6(math.exp(math.log(0.8))))
    // t=2: n=4, d=1 -> S = 0.8 * 3/4 = 0.6
    assert(out(2L).getAs[Double]("survival") ==
      r6(math.exp(math.log(0.8) + math.log(0.75))))
    // t=3: censoring only — survival unchanged, at-risk shrinks after
    assert(out(3L).getAs[Long]("events") == 0L &&
      out(3L).getAs[Long]("censored") == 1L)
    assert(out(3L).getAs[Double]("survival") ==
      out(2L).getAs[Double]("survival"))
    // t=4: n=2 (the censored subject left the risk set), d=1
    assert(out(4L).getAs[Long]("n_at_risk") == 2L)
    assert(out(4L).getAs[Double]("survival") ==
      r6(math.exp(math.log(0.8) + math.log(0.75) + math.log(0.5))))
    // censoring never counts as churn: survival stays positive
    assert(out(5L).getAs[Double]("survival") > 0.0)
  }

  test("extinction and censoring-bias guard") {
    // everyone observed dying: survival hits exactly 0 at the end
    val all = Seq((1L, true), (2L, true)).toDF("dur", "ev")
    val o = Survival.kaplanMeier(all, "dur", "ev")
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("survival")).toMap
    assert(o(2L) == 0.0 && o(1L) == 0.5)
    // naive retention would call censored subjects churned; KM must not:
    // 10 died at t=1, 90 censored at t=1 -> S(1) = 0.9, not 0.1
    val cens = ((1 to 10).map(_ => (1L, true)) ++
      (1 to 90).map(_ => (1L, false))).toDF("dur", "ev")
    val s1 = Survival.kaplanMeier(cens, "dur", "ev")
      .collect()(0).getAs[Double]("survival")
    assert(s1 == 0.9)
    intercept[IllegalArgumentException](
      Survival.kaplanMeier(all, "nope", "ev"))
  }
}
