package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AbcSpec extends SparkSpec {
  import spark.implicits._

  test("textbook cut: crossing items belong to the class they cross into") {
    // values 50, 30, 15, 5 → cum prev 0, 50, 80, 95
    // A: prev < 80 → items 1,2; B: prev < 95 → item 3; C: item 4
    val df = Seq(("k", "i1", 50.0), ("k", "i2", 30.0), ("k", "i3", 15.0),
        ("k", "i4", 5.0)).toDF("grp", "item", "v")
    val full = Abc.classify(df, Seq("grp"), "item", "v")
      .select("item", "abc_class").as[(String, String)].collect().toMap
    assert(full == Map("i1" -> "A", "i2" -> "A", "i3" -> "B", "i4" -> "C"))
  }

  test("one dominant item: it is A even though it crosses 100%") {
    val df = Seq(("k", "big", 99.0), ("k", "small", 1.0))
      .toDF("grp", "item", "v")
    val got = Abc.classify(df, Seq("grp"), "item", "v")
      .select("item", "abc_class").as[(String, String)].collect().toMap
    assert(got("big") == "A")
    assert(got("small") == "C") // prev = 99% >= 95
  }

  test("pre-aggregation sums duplicate item rows; shares reconcile to 1") {
    val df = Seq(("k", "a", 10.0), ("k", "a", 20.0), ("k", "b", 70.0))
      .toDF("grp", "item", "v")
    val got = Abc.classify(df, Seq("grp"), "item", "v")
      .select("item", "value", "share").as[(String, Double, Double)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got("a") == ((30.0, 0.3)))
    assert(got("b") == ((70.0, 0.7)))
  }

  test("ties order by item; zero-total keys emit null class") {
    val df = Seq(("z", "a", 0.0), ("z", "b", 0.0),
        ("t", "x", 5.0), ("t", "y", 5.0)).toDF("grp", "item", "v")
    val got = Abc.classify(df, Seq("grp"), "item", "v", aPct = 50, bPct = 95)
      .select("grp", "item", "abc_class")
      .as[(String, String, Option[String])].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got(("t", "x")) == Some("A")) // prev 0% < 50
    assert(got(("t", "y")) == Some("B")) // prev 50%: not < 50, < 95
    assert(got(("z", "a")).isEmpty && got(("z", "b")).isEmpty)
  }

  test("keyless classification works; negatives are loud") {
    val df = Seq(("a", 60.0), ("b", 40.0)).toDF("item", "v")
    val got = Abc.classify(df, Nil, "item", "v", aPct = 50, bPct = 95)
      .select("item", "abc_class").as[(String, String)].collect().toMap
    // b's prior cumulative is 60%: past the 50% A-cut, inside B
    assert(got == Map("a" -> "A", "b" -> "B"))
    intercept[Exception](Abc.classify(
      Seq(("a", -1.0)).toDF("item", "v"), Nil, "item", "v").collect())
  }

  test("misuse is loud: bad thresholds, missing columns") {
    val df = Seq(("a", 1.0)).toDF("item", "v")
    intercept[IllegalArgumentException](
      Abc.classify(df, Nil, "item", "v", aPct = 90, bPct = 80))
    intercept[IllegalArgumentException](
      Abc.classify(df, Nil, "item", "nope"))
  }
}
