package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class GroupTopKSpec extends SparkSpec {
  import spark.implicits._

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int,
                         desc: Boolean) = {
    val ord = if (desc) col("key").desc else col("key").asc
    df.withColumn("rank", row_number().over(
        Window.partitionBy("g").orderBy(ord, col("id").asc)))
      .filter(col("rank") <= k)
      .select(col("g"), col("rank"), col("id"), col("key"))
  }

  private def gen(seed: Int, n: Int) = {
    val rnd = new scala.util.Random(seed)
    // few keys → heavy ties; one hot group
    (1 to n).map { i =>
      (if (i % 3 == 0) "hot" else s"g${rnd.nextInt(10)}",
        rnd.nextInt(20).toLong, i.toLong)
    }.toDF("g", "key", "id")
  }

  for (desc <- Seq(true, false))
    test(s"topK desc=$desc equals the row_number window formulation") {
      val df = gen(42, 5000)
      val got = GroupTopK.topK(df, Seq("g"), "key", "id", 7, desc).collect().toSet
      val want = windowTopK(df, 7, desc).collect().toSet
      assert(got == want)
    }

  test("groups smaller than k emit all rows, still ranked") {
    val df = Seq(("a", 5L, 1L), ("a", 9L, 2L), ("b", 1L, 3L)).toDF("g", "key", "id")
    val got = GroupTopK.topK(df, Seq("g"), "key", "id", 10)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == Set(("a", 1, 2L), ("a", 2, 1L), ("b", 1, 3L)))
  }

  test("ties break deterministically by smaller id") {
    val df = Seq(("a", 5L, 9L), ("a", 5L, 2L), ("a", 5L, 7L)).toDF("g", "key", "id")
    val got = GroupTopK.topK(df, Seq("g"), "key", "id", 2)
      .orderBy("rank").collect().map(_.getLong(2)).toSeq
    assert(got == Seq(2L, 7L))
  }

  test("null keys and ids are ignored, not ranked") {
    val df = Seq(
      (Some("a"), Some(5L), Some(1L)), (Some("a"), None, Some(2L)),
      (Some("a"), Some(9L), None)
    ).map { case (g, k, i) =>
      (g.orNull, k.map(java.lang.Long.valueOf).orNull,
        i.map(java.lang.Long.valueOf).orNull)
    }.toDF("g", "key", "id")
    val got = GroupTopK.topK(df, Seq("g"), "key", "id", 5).collect()
    assert(got.length == 1 && got.head.getLong(2) == 1L)
  }

  test("plan: hash aggregate with map-side partial, no Window, no sort of the input") {
    val df = gen(7, 1000)
    val plan = GroupTopK.topK(df, Seq("g"), "key", "id", 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"no window expected:\n$plan")
    // partial + final aggregation pair around one exchange
    assert("HashAggregate".r.findAllIn(plan).length >= 2 ||
      "SortAggregate".r.findAllIn(plan).length >= 2,
      s"expected two-phase aggregation:\n$plan")
  }
}
