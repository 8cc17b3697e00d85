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
