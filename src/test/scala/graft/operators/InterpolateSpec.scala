package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class InterpolateSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, Long, Option[Double])],
                  fillEdges: Boolean = false) =
    Resample.interpolate(rows.toDF("k", "t", "id", "v"), Seq("k"), "t",
        "id", "v", fillEdges = fillEdges)
      .orderBy("k", "t", "id")
      .select("t", "value_interp", "interpolated")
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)),
        r.getBoolean(2)))

  test("interior nulls take the time-weighted blend") {
    val got = run(Seq(
      (1L, 0L, 1L, Some(10.0)), (1L, 25L, 2L, None),
      (1L, 75L, 3L, None), (1L, 100L, 4L, Some(20.0))))
    assert(got.toSeq == Seq(
      (0L, Some(10.0), false), (25L, Some(12.5), true),
      (75L, Some(17.5), true), (100L, Some(20.0), false)))
  }

  test("edges stay null by default; fillEdges takes the nearest known") {
    val rows = Seq((1L, 0L, 1L, Option.empty[Double]),
      (1L, 10L, 2L, Some(5.0)), (1L, 20L, 3L, None))
    assert(run(rows).toSeq == Seq(
      (0L, None, false), (10L, Some(5.0), false), (20L, None, false)))
    assert(run(rows, fillEdges = true).toSeq == Seq(
      (0L, Some(5.0), true), (10L, Some(5.0), false), (20L, Some(5.0), true)))
  }

  test("all-null key stays null; keys never cross") {
    val got = run(Seq((1L, 0L, 1L, None), (2L, 5L, 2L, Some(7.0))),
      fillEdges = true)
    assert(got.toSeq == Seq((0L, None, false), (5L, Some(7.0), false)))
  }

  test("duplicate timestamps break ties on id deterministically") {
    // at t=10: id 2 (null) sits between id 1 (known, same t) and t=20
    val got = run(Seq((1L, 10L, 1L, Some(0.0)), (1L, 10L, 2L, None),
      (1L, 20L, 3L, Some(10.0))))
    // prev = (t=10, v=0): blend at t=10 → 0 + 10*(0/10) = 0
    assert(got.toSeq(1) == ((10L, Some(0.0), true)))
  }

  test("negative values round tie-safely toward +inf consistently") {
    val got = run(Seq((1L, 0L, 1L, Some(-10.0)), (1L, 50L, 2L, None),
      (1L, 100L, 3L, Some(-20.0))))
    assert(got.toSeq(1)._2.contains(-15.0))
  }

  test("misuse is loud: keyless, reserved names, bad time type") {
    val df = Seq((1L, 1L, 1L, 1.0)).toDF("k", "t", "id", "v")
    intercept[IllegalArgumentException](
      Resample.interpolate(df, Nil, "t", "id", "v"))
    intercept[IllegalArgumentException](Resample.interpolate(
      df.withColumn("interpolated", lit(true)), Seq("k"), "t", "id", "v"))
    intercept[IllegalArgumentException](Resample.interpolate(
      df.withColumn("t", lit("x")), Seq("k"), "t", "id", "v"))
  }
}
