package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JsonFlattenSpec extends SparkSpec {
  import spark.implicits._

  test("nested objects flatten recursively with typed leaves") {
    val df = Seq(
      (1L, """{"a": 1, "b": {"c": "x", "d": {"e": 2.5}}, "f": true}"""),
      (2L, """{"a": 7, "b": {"c": "y", "d": {"e": 0.5}}, "f": false}""")
    ).toDF("id", "js")
    val out = JsonFlatten.flatten(df, "js")
    assert(out.columns.toSeq == Seq("id", "a", "b_c", "b_d_e", "f"))
    val r = out.orderBy($"id").collect()
    assert(r(0).getLong(1) == 1L && r(0).getString(2) == "x" &&
      r(0).getDouble(3) == 2.5 && r(0).getBoolean(4))
    assert(r(1).getLong(1) == 7L && !r(1).getBoolean(4))
    // source column dropped by default, kept on request
    assert(JsonFlatten.flatten(df, "js", keepSource = true)
      .columns.contains("js"))
  }

  test("malformed rows yield NULL flattened cells, not failures") {
    val df = Seq((1L, """{"a": 1}"""), (2L, "not json at all"), (3L, null))
      .toDF("id", "js")
    val out = JsonFlatten.flatten(df, "js").orderBy($"id").collect()
    assert(out(0).getLong(1) == 1L)
    assert(out(1).isNullAt(1) && out(2).isNullAt(1))
  }

  test("keys outside the sample are dropped (bounded inference contract)") {
    val rows = (1 to 50).map(i => (i.toLong, s"""{"a": $i}""")) :+
      (51L, """{"a": 51, "late_key": "only here"}""")
    val out = JsonFlatten.flatten(rows.toDF("id", "js"), "js",
      sampleRows = 10)
    assert(out.columns.toSeq == Seq("id", "a"),
      s"late_key must be dropped: ${out.columns.toSeq}")
  }

  test("name collisions and empty payloads fail loudly") {
    val clash = Seq((1L, """{"id": 9}""")).toDF("id", "js")
    val e = intercept[IllegalArgumentException](
      JsonFlatten.flatten(clash, "js"))
    assert(e.getMessage.contains("collide"))
    val empty = Seq((1L, "null")).toDF("id", "js")
    intercept[IllegalArgumentException](JsonFlatten.flatten(empty, "js"))
    intercept[IllegalArgumentException](
      JsonFlatten.flatten(clash, "nope"))
  }

  test("the data path is one projection — no shuffle, no extra scan") {
    val df = Seq((1L, """{"a": 1, "b": "x"}""")).toDF("id", "js")
    val qe = JsonFlatten.flatten(df, "js").queryExecution
    val physical = qe.executedPlan.toString
    assert(!physical.contains("Exchange"), s"flatten must not shuffle:\n$physical")
    // the literal-backed frame constant-folds to a LocalTableScan in the
    // physical plan, so the one-projection shape is asserted on the
    // analyzed plan (from_json appears exactly once per leaf's parent)
    val analyzed = qe.analyzed.toString.toLowerCase
    assert(analyzed.contains("from_json") || analyzed.contains("jsontostructs"),
      s"expected a from_json projection:\n$analyzed")
  }
}
