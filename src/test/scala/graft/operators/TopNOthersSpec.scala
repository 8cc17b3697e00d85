package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopNOthersSpec extends SparkSpec {
  import spark.implicits._

  test("top rows keep identity, Others reconciles exactly to the group total") {
    val df = Seq(("g", "a", 50.25), ("g", "b", 30.10), ("g", "c", 10.05),
        ("g", "d", 5.30), ("g", "e", 4.30)).toDF("grp", "item", "v")
    val got = GroupTopK.topNOthers(df, Seq("grp"), "item", "v", n = 2)
      .orderBy(col("rank").asc_nulls_last).collect()
    assert(got.length == 3)
    assert(got(0).getAs[String]("item") == "a" && got(0).getAs[Int]("rank") == 1)
    assert(got(1).getAs[String]("item") == "b")
    val others = got(2)
    assert(others.getAs[String]("item") == "Others")
    assert(others.getAs[Boolean]("is_others"))
    assert(others.getAs[Long]("items_collapsed") == 3L)
    assert(others.getAs[Double]("value") == 19.65) // 10.05+5.30+4.30 exact
    assert(got.map(_.getAs[Double]("value")).sum == 100.0)
  }

  test("no Others row when nothing collapses; duplicate items pre-aggregate") {
    val df = Seq(("g", "a", 1.0), ("g", "a", 2.0), ("g", "b", 5.0))
      .toDF("grp", "item", "v")
    val got = GroupTopK.topNOthers(df, Seq("grp"), "item", "v", n = 5)
      .collect()
    assert(got.length == 2)
    assert(!got.exists(_.getAs[Boolean]("is_others")))
    assert(got.find(_.getAs[String]("item") == "a").get
      .getAs[Double]("value") == 3.0)
  }

  test("ties rank deterministically by item; groups independent") {
    val df = Seq(("x", "b", 5.0), ("x", "a", 5.0), ("x", "c", 1.0),
        ("y", "z", 9.0)).toDF("grp", "item", "v")
    val got = GroupTopK.topNOthers(df, Seq("grp"), "item", "v", n = 1)
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[String]("item")))
      .toSet
    assert(got == Set(("x", "a"), ("x", "Others"), ("y", "z")))
  }

  test("misuse is loud") {
    val df = Seq(("g", "a", 1.0)).toDF("grp", "item", "v")
    intercept[IllegalArgumentException](
      GroupTopK.topNOthers(df, Nil, "item", "v", 1))
    intercept[IllegalArgumentException](
      GroupTopK.topNOthers(df, Seq("grp"), "item", "v", 0))
  }
}
