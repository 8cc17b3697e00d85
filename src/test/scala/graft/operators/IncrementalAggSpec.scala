package graft.operators

import graft.SparkSpec

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private def snap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

  test("combine of partials equals partials of the union (the merge identity)") {
    val rnd = new scala.util.Random(13)
    val a = (1 to 300).map(_ => (rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong))
    val b = (1 to 200).map(_ => (rnd.nextInt(25).toLong, rnd.nextInt(1000).toLong))
    val pa = IncrementalAgg.partials(a.toDF("k", "v"), Seq("k"), Seq("v"))
    val pb = IncrementalAgg.partials(b.toDF("k", "v"), Seq("k"), Seq("v"))
    val merged = snap(IncrementalAgg.combine(Seq(pa, pb), Seq("k"), Seq("v")))
    val full = snap(IncrementalAgg.partials(
      (a ++ b).toDF("k", "v"), Seq("k"), Seq("v")))
    assert(merged == full)
  }

  test("keys present in only one part merge; three-way combine associates") {
    val p1 = IncrementalAgg.partials(
      Seq((1L, 10L), (1L, 20L)).toDF("k", "v"), Seq("k"), Seq("v"))
    val p2 = IncrementalAgg.partials(
      Seq((2L, 5L)).toDF("k", "v"), Seq("k"), Seq("v"))
    val p3 = IncrementalAgg.partials(
      Seq((1L, 1L), (2L, 7L)).toDF("k", "v"), Seq("k"), Seq("v"))
    val all = snap(IncrementalAgg.combine(Seq(p1, p2, p3), Seq("k"), Seq("v")))
    assert(all(1L) == ((3L, 31L, 1L, 20L)))
    assert(all(2L) == ((2L, 12L, 5L, 7L)))
    val nested = snap(IncrementalAgg.combine(Seq(
      IncrementalAgg.combine(Seq(p1, p2), Seq("k"), Seq("v")), p3),
      Seq("k"), Seq("v")))
    assert(nested == all)
  }

  test("null measures count rows but not sums/mins/maxes") {
    val df = Seq((1L, Some(10L)), (1L, None), (1L, Some(4L)))
      .map { case (k, v) => (k, v.map(Long.box).orNull) }.toDF("k", "v")
    val p = IncrementalAgg.partials(df, Seq("k"), Seq("v")).collect().head
    assert(p.getLong(1) == 3L && p.getLong(2) == 14L &&
      p.getLong(3) == 4L && p.getLong(4) == 10L)
  }

  test("guards: missing columns, malformed partial frames") {
    val df = Seq((1L, 2L)).toDF("k", "v")
    intercept[IllegalArgumentException](
      IncrementalAgg.partials(df, Seq("k"), Seq("nope")))
    intercept[IllegalArgumentException](
      IncrementalAgg.partials(df, Seq.empty, Seq("v")))
    intercept[IllegalArgumentException](
      IncrementalAgg.combine(Seq(df), Seq("k"), Seq("v")))
    intercept[IllegalArgumentException](
      IncrementalAgg.combine(Seq.empty, Seq("k"), Seq("v")))
  }
}
