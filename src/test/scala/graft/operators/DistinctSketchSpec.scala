package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DistinctSketchSpec extends SparkSpec {
  import spark.implicits._

  test("exact sub-case: below k the sketch is the distinct hash set") {
    val d = Seq(1L, 2L, 3L, 2L, 1L, 3L, 3L).toDF("v")
    val out = d.agg(
        DistinctSketch.sketch($"v", 8).as("sk"))
      .select(size($"sk").as("n"),
        DistinctSketch.estimate($"sk", 8).as("est"))
      .collect()(0)
    assert(out.getInt(0) == 3 && out.getLong(1) == 3L)
  }

  test("estimator: ~1/sqrt(k) relative error on 20k sequential ids") {
    val k = 256
    val d = (1L to 20000L).toDF("v")
    val est = d.agg(DistinctSketch.sketch($"v", k).as("sk"))
      .select(DistinctSketch.estimate($"sk", k)).as[Long].collect()(0)
    // 1/sqrt(k-2) ~ 6.3%; allow 4 sigma
    assert(math.abs(est - 20000.0) / 20000.0 < 0.25,
      s"KMV estimate too far off: $est vs 20000")
  }

  test("mergeability: sketch(A union B) == merge(sketch(A), sketch(B))") {
    val k = 64
    val a = (1L to 500L).map(v => ("a", v)).toDF("g", "v")
    val b = (300L to 900L).map(v => ("b", v)).toDF("g", "v")
    val whole = a.union(b)
      .agg(DistinctSketch.sketch($"v", k).as("sk"))
      .select($"sk").as[Seq[Long]].collect()(0)
    val parts = a.union(b).groupBy($"g")
      .agg(DistinctSketch.sketch($"v", k).as("sk"))
    val merged = DistinctSketch.mergeSketches(parts, Seq.empty, "sk", k)
      .select($"sk").as[Seq[Long]].collect()(0)
    assert(merged == whole, "k smallest of union must equal global k smallest")
  }

  test("duplicates, nulls and grouped rollup") {
    val d = Seq(
      ("d1", java.lang.Long.valueOf(1L)), ("d1", java.lang.Long.valueOf(1L)),
      ("d1", java.lang.Long.valueOf(2L)), ("d1", null),
      ("d2", java.lang.Long.valueOf(2L)), ("d2", java.lang.Long.valueOf(3L))
    ).toDF("day", "v")
    val daily = d.groupBy($"day")
      .agg(DistinctSketch.sketch($"v", 4).as("sk"))
    val ests = daily
      .select($"day", DistinctSketch.estimate($"sk", 4).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ests == Map("d1" -> 2L, "d2" -> 2L)) // null ignored, dups collapse
    // rollup of the two days: distinct {1,2,3} = 3
    val all = DistinctSketch.mergeSketches(daily, Seq.empty, "sk", 4)
    assert(all.select(DistinctSketch.estimate($"sk", 4))
      .as[Long].collect()(0) == 3L)
    // grouped merge keeps the group columns
    val byDay = DistinctSketch.mergeSketches(daily, Seq("day"), "sk", 4)
    assert(byDay.columns.toSeq == Seq("day", "sk"))
  }

  test("set-operation estimates: exact sub-case, accuracy, identity") {
    val k = 8
    def sk(vs: Seq[Long]) = vs.toDF("v")
      .agg(DistinctSketch.sketch($"v", k).as("s"))
      .select($"s").as[Seq[Long]].collect()(0)
    val d = Seq((sk(Seq(1L, 2L, 3L)), sk(Seq(2L, 3L, 4L)),
      sk(Seq(10L, 11L)), sk(Seq(1L, 2L, 3L))))
      .toDF("a", "b", "c", "a2")
    val r = d.select(
      DistinctSketch.jaccardEstimate($"a", $"b", k).as("jab"),
      DistinctSketch.jaccardEstimate($"a", $"c", k).as("jac"),
      DistinctSketch.jaccardEstimate($"a", $"a2", k).as("jaa"),
      DistinctSketch.intersectionEstimate($"a", $"b", k).as("iab"))
      .collect()(0)
    // below k the sketches are the sets: J({1,2,3},{2,3,4}) = 2/4
    assert(r.getAs[Double]("jab") == 0.5)
    assert(r.getAs[Double]("jac") == 0.0)
    assert(r.getAs[Double]("jaa") == 1.0)
    // intersection estimate = 0.5 * exact-union(4) = 2
    assert(r.getAs[Long]("iab") == 2L)

    // estimator accuracy on large overlapping ranges (true J = 1/3)
    val k2 = 256
    val big = Seq(1).toDF("x").select(
      DistinctSketch.jaccardEstimate(
        typedLit((1L to 20000L).map(hashOf).sorted.take(k2)),
        typedLit((10000L to 30000L).map(hashOf).sorted.take(k2)),
        k2).as("j")).collect()(0).getDouble(0)
    assert(math.abs(big - 1.0 / 3) < 0.12, s"far off: $big vs 1/3")
  }

  private def hashOf(v: Long): Long = {
    val P = 1000000007L
    ((v % P) * 2654435761L) % P
  }

  test("guards: k bounds and non-integral input are loud") {
    val d = Seq(1L).toDF("v")
    intercept[IllegalArgumentException](
      d.agg(DistinctSketch.sketch($"v", 1)).collect())
    intercept[Exception](
      Seq("x").toDF("v")
        .agg(org.apache.spark.sql.GraftBridge.column(
          DistinctSketch.BottomKDistinct(
            org.apache.spark.sql.GraftBridge.expression(col("v")), 8)
            .toAggregateExpression()))
        .collect())
  }
}
