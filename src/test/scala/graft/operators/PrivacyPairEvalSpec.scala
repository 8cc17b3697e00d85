package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PrivacyPairEvalSpec extends SparkSpec {
  import spark.implicits._

  test("k-anonymity: classes, summary, suppression, null QIs group") {
    val d = Seq(
      (1L, "02139", "F"), (2L, "02139", "F"), (3L, "02139", "F"),
      (4L, "94105", "M"),                     // singleton: at risk
      (5L, null.asInstanceOf[String], "F"),
      (6L, null.asInstanceOf[String], "F")    // null zip is its own class
    ).toDF("id", "zip", "sex")
    val classes = Privacy.kAnonymityClasses(d, Seq("zip", "sex"), k = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getBoolean(3))).toMap
    assert(classes(("02139", "F")) == ((3L, false)))
    assert(classes(("94105", "M")) == ((1L, true)))
    assert(classes((null, "F")) == ((2L, false)))
    val sum = Privacy.kAnonymitySummary(d, Seq("zip", "sex"), k = 2)
      .collect()(0)
    assert(sum.getAs[Long]("n_rows") == 6L &&
      sum.getAs[Long]("n_classes") == 3L)
    assert(sum.getAs[Long]("risky_classes") == 1L &&
      sum.getAs[Long]("risky_rows") == 1L)
    assert(sum.getAs[Long]("achieved_k") == 1L)
    // suppression drops exactly the risky rows
    val kept = Privacy.suppress(d, Seq("zip", "sex"), k = 2)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 2L, 3L, 5L, 6L))
    intercept[IllegalArgumentException](
      Privacy.kAnonymityClasses(d, Seq.empty, 2))
    intercept[IllegalArgumentException](
      Privacy.kAnonymityClasses(d, Seq("zip"), 1))
  }

  test("pair eval: hand P/R/F1, direction/repeat immunity, zero cases") {
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    // predicted {12, 13, 14}; truth {12, 15}: tp=1, P=1/3, R=1/2
    val pred = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("id_a", "id_b")
    val truth = Seq((2L, 1L), (1L, 5L)).toDF("id_a", "id_b") // reversed dir
    val r = PairEval.score(pred, truth).collect()(0)
    assert(r.getAs[Long]("n_predicted") == 3L &&
      r.getAs[Long]("n_truth") == 2L &&
      r.getAs[Long]("true_positives") == 1L)
    assert(r.getAs[Double]("precision") == r6(1.0 / 3))
    assert(r.getAs[Double]("recall") == r6(0.5))
    val p = 1.0 / 3; val rr = 0.5
    assert(r.getAs[Double]("f1") == r6(2.0 * p * rr / (p + rr)))
    // repeats and self-pairs in inputs are ignored
    val noisy = PairEval.score(
      Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L)).toDF("id_a", "id_b"),
      Seq((1L, 2L)).toDF("id_a", "id_b")).collect()(0)
    assert(noisy.getAs[Long]("n_predicted") == 1L &&
      noisy.getAs[Double]("precision") == 1.0 &&
      noisy.getAs[Double]("f1") == 1.0)
    // empty predictions: null precision/f1, recall 0
    val empty = PairEval.score(
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"),
      Seq((1L, 2L)).toDF("id_a", "id_b")).collect()(0)
    assert(empty.isNullAt(empty.fieldIndex("precision")))
    assert(empty.getAs[Double]("recall") == 0.0)
    assert(empty.isNullAt(empty.fieldIndex("f1")))
    intercept[IllegalArgumentException](
      PairEval.score(Seq((1L, 2L)).toDF("x", "y"), truth))
  }
}
