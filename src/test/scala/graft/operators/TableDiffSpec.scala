package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TableDiffSpec extends SparkSpec {
  import spark.implicits._

  private val old = Seq(
    (1L, "a", Some(10.0)),   // unchanged
    (2L, "b", Some(20.0)),   // value change
    (3L, "c", None),         // null -> value change
    (4L, "d", Some(40.0)),   // removed
    (6L, "f", Some(60.0))    // value -> null change
  ).toDF("id", "name", "v")
  private val cur = Seq(
    (1L, "a", Some(10.0)),
    (2L, "b", Some(21.0)),
    (3L, "c", Some(30.0)),
    (5L, "e", Some(50.0)),   // added
    (6L, "f", None)
  ).toDF("id", "name", "v")

  private def types(viaHash: Boolean): Map[Long, String] =
    TableDiff.diff(old, cur, Seq("id"), viaHash = viaHash)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("diff: added/removed/changed; nulls are values; unchanged dropped") {
    val m = types(viaHash = true)
    assert(m == Map(2L -> "changed", 3L -> "changed", 4L -> "removed",
      5L -> "added", 6L -> "changed"))
  }

  test("hash and value-comparison paths agree") {
    assert(types(viaHash = true) == types(viaHash = false))
    // null-position swap must read as changed (xxhash64 skips nulls,
    // so the fingerprint needs the null-flag tail to see this)
    val a = Seq((1L, Some("x"), Option.empty[String])).toDF("id", "p", "q")
    val b = Seq((1L, Option.empty[String], Some("x"))).toDF("id", "p", "q")
    val swapped = TableDiff.diff(a, b, Seq("id")).collect()
    assert(swapped.map(r => (r.getLong(0), r.getString(1))).toSeq
      == Seq((1L, "changed")))
  }

  test("compareCols restricts change detection; extra columns ignored") {
    // only `name` compared: the value edits on 2/3/6 become unchanged
    val m = TableDiff.diff(old, cur, Seq("id"), compareCols = Seq("name"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m == Map(4L -> "removed", 5L -> "added"))
    // a column only one side has never makes rows read as changed
    val m2 = TableDiff.diff(old.withColumn("extra", lit(1)), cur, Seq("id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m2(2L) == "changed" && !m2.contains(1L))
  }

  test("diffWithPayload: survivors carry the right side's values") {
    val p = TableDiff.diffWithPayload(old, cur, Seq("id"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), if (r.isNullAt(3)) None
          else Some(r.getDouble(3)))))
      .toMap
    assert(p(2L) == (("changed", "b", Some(21.0)))) // cur's value
    assert(p(4L) == (("removed", "d", Some(40.0)))) // old's value
    assert(p(5L) == (("added", "e", Some(50.0))))
    assert(p(6L) == (("changed", "f", None)))
    assert(!p.contains(1L))
  }

  test("hash path plan ships fingerprints, not payload, through the join") {
    val plan = TableDiff.diff(old, cur, Seq("id"))
      .queryExecution.executedPlan.toString
    // both exchange inputs must already be the projected
    // (pk, fingerprint, flag) shape — the payload columns may not
    // appear below the shuffle
    val exchanges = plan.split("Exchange").drop(1)
    assert(exchanges.nonEmpty)
    assert(!plan.contains("name#") || exchanges.forall(e =>
      !e.takeWhile(_ != '\n').contains("name#")))
  }

  test("loud misuse: missing pk, no shared compare columns") {
    intercept[IllegalArgumentException](TableDiff.diff(old, cur, Nil))
    intercept[IllegalArgumentException](
      TableDiff.diff(old, cur.withColumnRenamed("id", "k"), Seq("id")))
    intercept[IllegalArgumentException](
      TableDiff.diff(old.select("id"), cur.select("id"), Seq("id")))
    intercept[IllegalArgumentException](
      TableDiff.diff(old, cur, Seq("id"), compareCols = Seq("nope")))
  }
}
