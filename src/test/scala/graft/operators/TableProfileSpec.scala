package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TableProfileSpec extends SparkSpec {
  import spark.implicits._

  test("summarize: exact nulls/distinct/min/max, typed ordering, loud misuse") {
    val d = Seq(
      (1L, Some(10.5), "b"),
      (2L, Some(-5.25), "a"),
      (3L, None, "b"),
      (4L, Some(10.5), null),
      (5L, None, "c")
    ).toDF("id", "v", "s")
    val rows = TableProfile.summarize(d, exact = true)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))))
      .toMap
    assert(rows("id") == ((5L, 0L, 5L, "1", "5")))
    // min is NUMERIC (-5.25 < 10.5), not lexicographic ("10.5" < "-5.25")
    assert(rows("v") == ((5L, 2L, 2L, "-5.25", "10.5")))
    assert(rows("s") == ((5L, 1L, 3L, "a", "c")))

    // columns subset + order preserved
    val sub = TableProfile.summarize(d, Seq("s", "id"), exact = true)
      .select("column_name").as[String].collect().toSeq
    assert(sub == Seq("s", "id"))

    // the scale path (HLL) agrees to its documented tolerance
    val approx = TableProfile.summarize(d, Seq("id")).head
    assert(math.abs(approx.getLong(3) - 5L) <= 1L)

    intercept[IllegalArgumentException](
      TableProfile.summarize(d, Seq("nope")))
    // duplicate column requests dedupe instead of tripping an
    // ambiguous-alias analysis error
    assert(TableProfile.summarize(d, Seq("id", "id"), exact = true)
      .count() == 1)
    // non-atomic columns: skipped silently in all-columns mode, loud
    // when requested explicitly
    val withMap = d.withColumn("m", map(lit("k"), $"id"))
    assert(TableProfile.summarize(withMap, exact = true)
      .select("column_name").as[String].collect().toSet == Set("id", "v", "s"))
    val e = intercept[IllegalArgumentException](
      TableProfile.summarize(withMap, Seq("m")))
    assert(e.getMessage.contains("not profilable"))
  }

  test("summarize: column names containing dots profile as columns, not field paths") {
    val d = Seq((1L, "x"), (2L, "y"), (3L, null))
      .toDF("order.key", "ship.mode")
    val rows = TableProfile.summarize(d, exact = true)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))))
      .toMap
    assert(rows("order.key") == ((3L, 0L, 3L, "1", "3")))
    assert(rows("ship.mode") == ((3L, 1L, 2L, "x", "y")))
    // explicit request resolves the dotted name too
    assert(TableProfile.summarize(d, Seq("ship.mode"), exact = true)
      .count() == 1)
  }

  test("numericProfile: exact moments + (n-1)p interpolated quantiles; loud misuse") {
    // 1..5: mean 3, sample stddev sqrt(2.5), p25 at idx 1.0 → 2.0,
    // p50 → 3.0, p75 at idx 3.0 → 4.0, p95 at idx 3.8 → 4.8
    val d = Seq(1.0, 2.0, 3.0, 4.0, 5.0).toDF("v")
    val r = TableProfile.numericProfile(d, Seq("v"), exact = true).head
    assert(r.getString(0) == "v")
    assert(r.getDouble(1) == 3.0)
    assert(r.getDouble(2) == math.rint(math.sqrt(2.5) * 1e4) / 1e4)
    assert((r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))
      == ((2.0, 3.0, 4.0, 4.8)))

    // approx mode agrees on a small corpus (sketch is exact here)
    val a = TableProfile.numericProfile(d, Seq("v")).head
    assert(a.getDouble(1) == 3.0 && a.getDouble(4) == 3.0)

    // nulls ignored; single-row and all-null columns degrade to null
    // stats instead of NaN/Infinity
    val sparse = Seq(Some(7.0), None, None).toDF("v")
    val s = TableProfile.numericProfile(sparse, Seq("v"), exact = true).head
    assert(s.getDouble(1) == 7.0 && s.isNullAt(2))
    val empty = Seq.empty[Option[Double]].toDF("v")
    val e = TableProfile.numericProfile(empty, Seq("v"), exact = true).head
    assert(e.isNullAt(1) && e.isNullAt(2))

    // dotted names are column names, not field paths
    val dotted = Seq(1.0, 2.0).toDF("unit.price")
    assert(TableProfile.numericProfile(dotted, Seq("unit.price"), exact = true)
      .head.getDouble(1) == 1.5)

    intercept[IllegalArgumentException](
      TableProfile.numericProfile(d, Nil))
    intercept[IllegalArgumentException](
      TableProfile.numericProfile(d, Seq("nope")))
    val bad = intercept[IllegalArgumentException](
      TableProfile.numericProfile(d.withColumn("s", lit("x")), Seq("s")))
    assert(bad.getMessage.contains("not numeric"))
  }

  test("histogram: edge folding, zero-filled empty bins, degenerate ranges") {
    val df = Seq(Some(0.0), Some(1.0), Some(2.5), Some(5.0), Some(5.0),
      Some(9.9), Some(10.0), Some(-1.0), Some(11.0), None).toDF("v")
    val h = TableProfile.histogram(df, "v", bins = 4,
      lo = Some(0.0), hi = Some(10.0))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
      .sortBy(_._1)
    // width 2.5; -1.0/11.0/null dropped; 10.0 (== hi) folds into bin 3
    assert(h.toSeq == Seq(
      (0L, 0.0, 2.5, 2L),   // 0.0, 1.0
      (1L, 2.5, 5.0, 1L),   // 2.5
      (2L, 5.0, 7.5, 2L),   // 5.0, 5.0
      (3L, 7.5, 10.0, 2L))) // 9.9, 10.0
    // empty bins appear as zero rows, not holes
    val sparse = TableProfile.histogram(Seq(0.0, 9.0).toDF("v"), "v",
      bins = 3, lo = Some(0.0), hi = Some(9.0))
      .collect().map(r => (r.getLong(0), r.getLong(3))).sortBy(_._1)
    assert(sparse.toSeq == Seq((0L, 1L), (1L, 0L), (2L, 1L)))
    // data-driven range: min/max probed with one narrow agg
    val auto = TableProfile.histogram(Seq(2.0, 4.0, 6.0).toDF("v"), "v", bins = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
      .sortBy(_._1)
    assert(auto.toSeq == Seq((0L, 2.0, 4.0, 1L), (1L, 4.0, 6.0, 2L)))
    // constant column: single unit-width bin holds everything
    val const = TableProfile.histogram(Seq(3.0, 3.0).toDF("v"), "v", bins = 1)
    assert(const.collect().map(r => (r.getLong(0), r.getLong(3))).toSeq
      == Seq((0L, 2L)))
    // all-null column: every bin zero, nothing throws
    val nulls = TableProfile.histogram(
      Seq.empty[Option[Double]].toDF("v"), "v", bins = 2)
    assert(nulls.collect().map(_.getLong(3)).sum == 0L)
    intercept[IllegalArgumentException](
      TableProfile.histogram(df, "v", bins = 0))
    intercept[IllegalArgumentException](
      TableProfile.histogram(df, "v", lo = Some(5.0), hi = Some(1.0)))
  }

  test("equiDepthHistogram: equal depths, tie overflow, deterministic bins") {
    import spark.implicits._
    // 100 distinct values, uniform → 10 bins of exactly 10 rows
    val uniform = (1 to 100).map(_.toDouble).toDF("v")
    val bins = TableProfile.equiDepthHistogram(uniform, "v", 10)
      .orderBy("bin").collect()
    assert(bins.length == 10)
    assert(bins.forall(_.getLong(3) == 10L))
    assert(bins.map(r => (r.getDouble(1), r.getDouble(2))).toSeq ==
      (0 until 10).map(i => (i * 10 + 1.0, i * 10 + 10.0)))
    // one value holding 60% of rows overflows its bin; totals preserved
    val skewed = (Seq.fill(60)(5.0) ++ (1 to 40).map(_ + 100.0)).toDF("v")
    val sb = TableProfile.equiDepthHistogram(skewed, "v", 4)
      .orderBy("bin").collect()
    assert(sb.map(_.getLong(3)).sum == 100L)
    val bin0 = sb.find(_.getInt(0) == 0).get
    assert(bin0.getLong(3) == 60L && bin0.getDouble(1) == 5.0)
    // nulls excluded entirely
    val withNulls = (Seq[java.lang.Double](1.0, 2.0, null)).toDF("v")
    assert(TableProfile.equiDepthHistogram(withNulls, "v", 2)
      .agg(org.apache.spark.sql.functions.sum("n_rows")).head.getLong(0) == 2L)
    intercept[IllegalArgumentException](
      TableProfile.equiDepthHistogram(uniform, "v", 0))
  }

  test("topValues: rank, deterministic tie-break, nulls count as values") {
    val d = Seq(
      (Some("a"), 1), (Some("a"), 1), (Some("a"), 2),
      (Some("b"), 2), (Some("b"), 3), (None, 3)
    ).toDF("s", "n")
    val r = TableProfile.topValues(d, k = 2)
      .collect()
      .map(x => (x.getString(0), Option(x.getString(1)), x.getLong(2),
        x.getInt(3)))
      .sortBy(t => (t._1, t._4))
    // s: a×3, b×2, null×1 → top2 = a, b; n: 1×2, 2×2, 3×2 all tied →
    // string-sorted "1","2"
    assert(r.toSeq == Seq(
      ("n", Some("1"), 2L, 1), ("n", Some("2"), 2L, 2),
      ("s", Some("a"), 3L, 1), ("s", Some("b"), 2L, 2)))
    // null flood surfaces as rank 1 with a null value
    val nulls = Seq(Option.empty[String], None, Some("x")).toDF("s")
    val top = TableProfile.topValues(nulls, Seq("s"), k = 1).head
    assert(top.isNullAt(1) && top.getLong(2) == 2L && top.getInt(3) == 1)
    intercept[IllegalArgumentException](TableProfile.topValues(d, k = 0))
    intercept[IllegalArgumentException](
      TableProfile.topValues(d, Seq("nope")))
  }

  test("numericProfile exact: no unbounded percentile buffer in the plan") {
    // the distributed order-statistics path must not plan a
    // TypedImperativeAggregate (ObjectHashAggregate) holding a whole
    // column's values — that was the old percentile-based shape
    val plan = TableProfile.numericProfile(sf("lineitem"),
      Seq("l_quantity", "l_extendedprice"), exact = true)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ObjectHashAggregate"), plan.take(2000))
    assert(!plan.contains("percentile("), plan.take(2000))
    // approx mode stays a single sketch pass (ObjectHashAggregate is
    // expected there — bounded sketch, not raw values)
    val approx = TableProfile.numericProfile(sf("lineitem"),
      Seq("l_quantity"))
      .queryExecution.executedPlan.toString
    assert(approx.contains("approx_percentile") ||
      approx.contains("ObjectHashAggregate"), approx.take(2000))
  }

  test("summarize: approx mode plans without Expand; exact mode is one agg pass") {
    val li = sf("lineitem")
    val approxPlan = TableProfile.summarize(
      li, Seq("l_orderkey", "l_quantity")).queryExecution.executedPlan.toString
    assert(!approxPlan.contains("Expand"),
      s"HLL profile must not expand the input:\n$approxPlan")
    val exactPlan = TableProfile.summarize(
      li, Seq("l_orderkey", "l_quantity"), exact = true)
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"),
      "exact multi-column distinct is expected to plan via Expand (documented cost)")
  }
}
