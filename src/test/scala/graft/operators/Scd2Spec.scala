package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  test("versions chain half-open per key; last version open and current") {
    val ups = Seq(
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"),
      (2L, 15L, "x")
    ).toDF("id", "ts", "state")
    val h = Scd2.history(ups, Seq("id"), "ts")
      .select("id", "state", "valid_from", "valid_to", "is_current")
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSet
    assert(h == Set(
      (1L, "a", 10L, Some(20L), false),
      (1L, "b", 20L, Some(30L), false),
      (1L, "c", 30L, None, true),
      (2L, "x", 15L, None, true)))
  }

  test("merge = history over old versions plus the new batch; tails re-close") {
    val old = Seq((1L, 10L, "a"), (1L, 20L, "b")).toDF("id", "ts", "state")
    val v1 = Scd2.history(old, Seq("id"), "ts")
    // new update arrives: the open 'b' tail must close at 25
    val merged = Scd2.history(
      v1.drop("valid_from", "valid_to", "is_current")
        .unionByName(Seq((1L, 25L, "c")).toDF("id", "ts", "state")),
      Seq("id"), "ts")
    val b = merged.filter(col("state") === "b").head
    assert(b.getLong(b.fieldIndex("valid_to")) == 25L &&
      !b.getBoolean(b.fieldIndex("is_current")))
    assert(merged.filter(col("is_current")).count() == 1)
  }

  test("ties break by orderCols; reserved names and missing columns rejected") {
    val ups = Seq((1L, 10L, 2L, "late"), (1L, 10L, 1L, "early"))
      .toDF("id", "ts", "seq", "state")
    val h = Scd2.history(ups, Seq("id"), "ts", orderCols = Seq("seq"))
      .orderBy("valid_from", "seq")
      .select("state", "is_current").as[(String, Boolean)].collect().toSeq
    assert(h == Seq(("early", false), ("late", true)))
    intercept[IllegalArgumentException](Scd2.history(ups, Nil, "ts"))
    intercept[IllegalArgumentException](Scd2.history(ups, Seq("id"), "nope"))
    intercept[IllegalArgumentException](Scd2.history(
      ups.withColumnRenamed("state", "is_current"), Seq("id"), "ts"))
  }
}
