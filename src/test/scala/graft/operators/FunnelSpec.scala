package graft.operators

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  test("stages must happen in order; out-of-order events don't count") {
    val df = Seq(
      // user 1: full funnel in order
      (1L, ts(1), "view"), (1L, ts(2), "click"), (1L, ts(3), "buy"),
      // user 2: click BEFORE view — click can't count; later click does
      (2L, ts(1), "click"), (2L, ts(2), "view"), (2L, ts(5), "click"),
      // user 3: buy before anything — reaches only stage 1 at the view
      (3L, ts(1), "buy"), (3L, ts(2), "view")
    ).toDF("u", "t", "et")
    val got = Funnel.funnel(df, Seq("u"), "t", "et",
        Seq("view", "click", "buy"))
      .select(col("u"), col("t_view"), col("t_click"), col("t_buy"),
        col("stages_reached"))
      .as[(Long, Option[Timestamp], Option[Timestamp], Option[Timestamp], Int)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(1L) == ((Some(ts(1)), Some(ts(2)), Some(ts(3)), 3)))
    assert(got(2L) == ((Some(ts(2)), Some(ts(5)), None, 2)))
    assert(got(3L) == ((Some(ts(2)), None, None, 1)))
  }

  test("strict ordering: same-timestamp next stage does not count") {
    val df = Seq(
      (1L, ts(1), "view"), (1L, ts(1), "click"), // simultaneous
      (2L, ts(1), "view"), (2L, ts(2), "click")
    ).toDF("u", "t", "et")
    val got = Funnel.funnel(df, Seq("u"), "t", "et", Seq("view", "click"))
      .select(col("u"), col("stages_reached"))
      .as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 1, 2L -> 2))
  }

  test("matches a naive per-user scan on random event streams") {
    val rnd = new scala.util.Random(17)
    val types = Vector("a", "b", "c", "x")
    val rows = Seq.fill(3000)((rnd.nextInt(50).toLong,
      ts(rnd.nextInt(59)), types(rnd.nextInt(4))))
    val stages = Seq("a", "b", "c")
    val got = Funnel.funnel(rows.toDF("u", "t", "et"), Seq("u"), "t", "et",
        stages)
      .select(col("u"), col("t_a"), col("t_b"), col("t_c"))
      .as[(Long, Option[Timestamp], Option[Timestamp], Option[Timestamp])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    rows.groupBy(_._1).foreach { case (u, evs) =>
      var prev: Option[Timestamp] = None
      var blocked = false
      val reach = stages.map { st =>
        if (blocked) None
        else {
          val t = evs.filter(e => e._3 == st &&
              prev.forall(p => e._2.after(p)))
            .map(_._2).sorted(Ordering.by((x: Timestamp) => x.getTime))
            .headOption
          if (t.isDefined) prev = t else blocked = true
          t
        }
      }
      assert(got(u) == ((reach(0), reach(1), reach(2))), s"user $u")
    }
  }

  test("guards: duplicate stages, too few stages, missing columns") {
    val df = Seq((1L, ts(1), "a")).toDF("u", "t", "et")
    intercept[IllegalArgumentException] {
      Funnel.funnel(df, Seq("u"), "t", "et", Seq("a"))
    }
    intercept[IllegalArgumentException] {
      Funnel.funnel(df, Seq("u"), "t", "et", Seq("a", "a"))
    }
    intercept[IllegalArgumentException] {
      Funnel.funnel(df, Seq("u"), "t", "nope", Seq("a", "b"))
    }
  }
}
