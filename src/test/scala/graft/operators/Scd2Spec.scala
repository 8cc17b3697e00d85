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

  test("composes with RangeJoin: facts attach their dimension version") {
    // the warehouse pattern: fact rows pick the dimension version whose
    // [valid_from, valid_to) interval contains the fact time — SCD2
    // output feeds the bucketized range join directly (open tails
    // closed at a horizon)
    val ups = Seq((1L, 10L, "bronze"), (1L, 50L, "gold")).toDF("id", "ts", "plan")
    val dim = Scd2.history(ups, Seq("id"), "ts")
      .withColumn("valid_to_c", coalesce(col("valid_to"), lit(1000L)))
      .select(col("id"), col("plan"), col("valid_from"), col("valid_to_c"))
    val facts = Seq((1L, 5L, 100L), (1L, 30L, 101L), (1L, 70L, 102L))
      .toDF("id", "t", "fact_id")
    val got = RangeJoin.join(facts, dim, Seq("id"), "t",
        "valid_from", "valid_to_c", granularity = 32L, joinType = "left")
      .select("fact_id", "plan").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getString(1)))).toMap
    assert(got == Map(100L -> None,          // before any version
      101L -> Some("bronze"), 102L -> Some("gold")))
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
