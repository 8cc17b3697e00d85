package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CrossTabSpec extends SparkSpec {
  import spark.implicits._

  /** Naive chi2 with the same per-cell 6dp snap. */
  private def naive(rows: Seq[(String, String)]): (Double, Long) = {
    val n = rows.size.toDouble
    val as = rows.map(_._1).distinct.sorted
    val bs = rows.map(_._2).distinct.sorted
    val cnt = rows.groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val ra = rows.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val rb = rows.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
    var scaled = 0L
    for (a <- as; b <- bs) {
      val o = cnt.getOrElse((a, b), 0.0)
      val e = ra(a) * rb(b) / n
      scaled += math.floor((o - e) * (o - e) / e * 1e6 + 0.5).toLong
    }
    (scaled / 1e6, (as.size - 1).toLong * (bs.size - 1))
  }

  test("independent columns: near-zero statistic; perfect association: max V") {
    // perfectly associated: b == a
    val assoc = (1 to 90).map(i => (s"c${i % 3}", s"c${i % 3}"))
    val (chiA, dofA) = naive(assoc)
    val gotA = CrossTab.chi2(assoc.toDF("a", "b"), "a", "b")
      .select("chi2", "dof", "cramers_v", "n").distinct().collect().head
    assert(gotA.getDouble(0) == chiA && gotA.getLong(1) == dofA)
    assert(gotA.getDouble(2) == 1.0) // perfect association
    assert(gotA.getLong(3) == 90)
    // independent: b cycles at a coprime period → exactly uniform cells
    val ind = (0 until 90).map(i => (s"a${i % 3}", s"b${i % 5}"))
    val gotI = CrossTab.chi2(ind.toDF("a", "b"), "a", "b")
      .select("chi2").distinct().as[Double].head()
    assert(gotI == 0.0)
  }

  test("random tables match the naive reference exactly (snapped sum)") {
    val rnd = new scala.util.Random(41)
    val rows = Seq.fill(500)((s"a${rnd.nextInt(4)}", s"b${rnd.nextInt(3)}"))
    val (want, dof) = naive(rows)
    val got = CrossTab.chi2(rows.toDF("a", "b"), "a", "b")
      .select("chi2", "dof").distinct().as[(Double, Long)].collect()
    assert(got.length == 1 && got.head == ((want, dof)))
  }

  test("zero-observed cells are present with expected > 0") {
    val rows = Seq(("x", "1"), ("x", "1"), ("y", "2"))
    val got = CrossTab.chi2(rows.toDF("a", "b"), "a", "b")
      .select("a", "b", "observed").as[(String, String, Long)]
      .collect().toSet
    assert(got == Set(("x", "1", 2L), ("x", "2", 0L),
      ("y", "1", 0L), ("y", "2", 1L)))
  }

  test("nulls excluded; single-category side → dof 0, null V") {
    val df = Seq((Some("x"), Some("1")), (Some("x"), Some("2")),
        (None, Some("1")), (Some("x"), None))
      .toDF("a", "b")
    val got = CrossTab.chi2(df, "a", "b")
      .select("dof", "n", "cramers_v").distinct().collect().head
    assert(got.getLong(0) == 0L && got.getLong(1) == 2L)
    assert(got.isNullAt(2))
  }

  test("cardinality guard is loud") {
    val df = (1 to 100).map(i => (s"a$i", "b")).toDF("a", "b")
    val ex = intercept[Exception](
      CrossTab.chi2(df, "a", "b", maxCategories = 10).collect())
    assert(ex.getMessage != null)
  }

  test("misuse is loud: same column, missing column") {
    val df = Seq(("x", "y")).toDF("a", "b")
    intercept[IllegalArgumentException](CrossTab.chi2(df, "a", "a"))
    intercept[IllegalArgumentException](CrossTab.chi2(df, "a", "nope"))
  }
}
