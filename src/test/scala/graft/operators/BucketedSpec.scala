package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketedSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed join: zero exchanges, same result as the plain join") {
    val wh = tmpDir("bucketed_wh")
    val left = (1 to 2000).map(i => (i.toLong % 97, i.toLong))
      .toDF("k", "lv")
    val right = (1 to 500).map(i => (i.toLong % 97, i.toLong * 10))
      .toDF("k", "rv")
    Bucketed.write(left, "b_left_test", Seq("k"), 8, Some(s"$wh/l"))
    Bucketed.write(right, "b_right_test", Seq("k"), 8, Some(s"$wh/r"))

    val joined = Bucketed.join(spark, "b_left_test", "b_right_test", Seq("k"))
      .groupBy("k").agg(count(lit(1)).as("n"), sum("rv").as("s"))
    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must not exchange; the groupBy afterwards is on
    // the same keys, so it rides the bucketing too
    assert(!plan.contains("Exchange"),
      s"bucketed join+agg must be exchange-free:\n$plan")

    val want = left.join(right, Seq("k"))
      .groupBy("k").agg(count(lit(1)).as("n"), sum("rv").as("s"))
      .collect().toSet
    assert(joined.collect().toSet == want)

    spark.sql("DROP TABLE IF EXISTS b_left_test")
    spark.sql("DROP TABLE IF EXISTS b_right_test")
  }

  test("guards: empty keys and absurd bucket counts rejected") {
    val df = Seq((1L, 2L)).toDF("k", "v")
    intercept[IllegalArgumentException](Bucketed.write(df, "t", Nil, 4))
    intercept[IllegalArgumentException](Bucketed.write(df, "t", Seq("k"), 0))
  }
}
