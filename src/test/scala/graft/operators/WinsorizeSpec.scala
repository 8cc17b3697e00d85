package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WinsorizeSpec extends SparkSpec {
  import spark.implicits._

  /** Naive bounds: value at floor((n-1)p) / ceil((n-1)p) of the sorted
    * non-null values. */
  private def naiveBounds(vs: Seq[Double], pLo: Double, pHi: Double) = {
    val s = vs.sorted
    (s(math.floor((s.size - 1) * pLo).toInt),
      s(math.ceil((s.size - 1) * pHi).toInt))
  }

  test("clamps to exact order-statistic bounds on random data with ties") {
    val rnd = new scala.util.Random(42)
    val vs = (1 to 997).map(_ => rnd.nextInt(200).toDouble) // heavy ties
    val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val (lo, hi) = naiveBounds(vs, 0.05, 0.95)
    val got = Winsorize.clamp(df, Seq("v"), 0.05, 0.95)
      .as[(Long, Double)].collect().toMap
    vs.zipWithIndex.foreach { case (v, i) =>
      val want = math.max(lo, math.min(hi, v))
      assert(got(i.toLong) == want, s"row $i: $v -> ${got(i.toLong)}, want $want")
    }
  }

  test("multiple columns clamp independently; non-requested columns untouched") {
    val df = (1 to 100).map(i => (i.toLong, i.toDouble, (101 - i).toDouble, s"s$i"))
      .toDF("id", "a", "b", "tag")
    val out = Winsorize.clamp(df, Seq("a", "b"), 0.10, 0.90)
      .as[(Long, Double, Double, String)].collect()
    val (aLo, aHi) = naiveBounds((1 to 100).map(_.toDouble), 0.10, 0.90)
    assert(out.forall { case (_, a, b, _) =>
      a >= aLo && a <= aHi && b >= aLo && b <= aHi })
    assert(out.map(_._4).toSet == (1 to 100).map(i => s"s$i").toSet)
    // interior values pass through unchanged
    val byId = out.map(r => r._1 -> r._2).toMap
    assert(byId(50L) == 50.0)
  }

  test("nulls pass through; all-null column leaves values unchanged") {
    val df = Seq((1L, Some(5.0)), (2L, None), (3L, Some(6.0)))
      .map { case (i, v) => (i, v.map(Double.box).orNull) }
      .toDF("id", "v")
    val got = Winsorize.clamp(df, Seq("v"), 0.25, 0.75).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(2L).isEmpty && got(1L).nonEmpty && got(3L).nonEmpty)
  }

  test("guards: unknown / non-numeric columns and bad percentiles rejected") {
    val df = Seq((1L, "x")).toDF("id", "s")
    intercept[IllegalArgumentException](Winsorize.clamp(df, Seq("nope")))
    intercept[IllegalArgumentException](Winsorize.clamp(df, Seq("s")))
    intercept[IllegalArgumentException](
      Winsorize.clamp(df, Seq("id"), 0.9, 0.1))
  }

  test("plan: broadcast join of the bounds, no global sort of the table") {
    val df = (1 to 500).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val plan = Winsorize.clamp(df, Seq("v")).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), s"bounds must broadcast:\n$plan")
  }
}
