package graft.operators

import graft.SparkSpec

class CorrelationsSpec extends SparkSpec {
  import spark.implicits._

  private def toMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => ((r.getString(0), r.getString(1)),
      if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap

  test("hand-computed correlations: perfect, zero, and constant column") {
    val df = Seq(
      (1.0, 2.0, 1.0, 5.0),
      (2.0, 4.0, 0.0, 5.0),
      (3.0, 6.0, 1.0, 5.0)
    ).toDF("x", "y", "z", "c")
    val m = toMap(Correlations.matrix(df, Seq("x", "y", "z", "c")))
    assert(math.abs(m(("x", "y")).get - 1.0) < 1e-12, "y = 2x → corr 1")
    assert(math.abs(m(("x", "z")).get) < 1e-12, "engineered zero covariance")
    assert(m(("x", "c")).isEmpty && m(("y", "c")).isEmpty &&
      m(("z", "c")).isEmpty, "constant column → NULL, not NaN")
    assert(m.size == 6, "4 columns → 6 pairs")
  }

  test("complete-case semantics: a null in any column drops the row") {
    val df = Seq(
      (Some(1.0), Some(2.0)), (Some(2.0), Some(4.0)),
      (Some(3.0), None), (None, Some(8.0)), (Some(4.0), Some(8.0))
    ).toDF("x", "y")
    val m = toMap(Correlations.matrix(df, Seq("x", "y")))
    // surviving rows (1,2),(2,4),(4,8) are exactly proportional
    assert(math.abs(m(("x", "y")).get - 1.0) < 1e-12)
  }

  test("anti-symmetry of pair order is fixed (i < j), misuse is loud") {
    intercept[IllegalArgumentException](
      Correlations.matrix(Seq((1.0, 2.0)).toDF("a", "b"), Seq("a")))
    intercept[IllegalArgumentException](
      Correlations.matrix(Seq((1.0, 2.0)).toDF("a", "b"), Seq("a", "a")))
  }

  test("fixedPoint variant: agrees with matrix, stays long-backed exact") {
    // 2dp fixed-point values; Pearson is invariant under the ×100
    // integer scaling, so the two paths agree to double precision
    val df = (1 to 500).map { i =>
      (i * 0.25, i * 0.5 + (i % 7) * 0.01, ((i * 37) % 100) * 0.01)
    }.toDF("x", "y", "z")
    val slow = toMap(Correlations.matrix(df, Seq("x", "y", "z")))
    val fast = toMap(Correlations.matrixFixedPoint(df,
      Seq("x" -> 2, "y" -> 2, "z" -> 2)))
    slow.keySet.foreach { k =>
      assert(math.abs(slow(k).get - fast(k).get) < 1e-9,
        s"$k: ${slow(k)} vs ${fast(k)}")
    }
    // constant column → NULL on the fixed-point path too
    val c = Seq((1.0, 5.0), (2.0, 5.0), (3.0, 5.0)).toDF("x", "c")
    assert(toMap(Correlations.matrixFixedPoint(c,
      Seq("x" -> 2, "c" -> 2)))(("x", "c")).isEmpty)
    // digits out of range is loud (scale the units, not the row count)
    intercept[IllegalArgumentException](Correlations.matrixFixedPoint(
      df, Seq("x" -> 2, "y" -> 10)))
    // ONE aggregation, one scan — same plan shape as matrix
    val plan = Correlations.matrixFixedPoint(df, Seq("x" -> 2, "y" -> 2))
      .queryExecution.optimizedPlan
    assert(plan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.size == 1)
  }

  test("all moments ride ONE aggregation over one scan") {
    val df = Seq((1.0, 2.0, 3.0), (4.0, 5.0, 6.0)).toDF("a", "b", "c")
    val plan = Correlations.matrix(df, Seq("a", "b", "c"))
      .queryExecution.optimizedPlan
    val aggs = plan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(aggs.size == 1, s"expected one Aggregate, saw ${aggs.size}")
    val scans = plan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }
    assert(scans.size == 1, s"expected one scan, saw ${scans.size}")
  }
}
