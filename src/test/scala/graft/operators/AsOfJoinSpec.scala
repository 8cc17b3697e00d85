package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** AsOfJoin vs a naive per-row oracle, plus the explicit edge pins the
  * advisor asked for: nullable carried columns (the matched row's NULL
  * must survive — no forward-fill mixture), tolerance reading the true
  * source row, exact-time ties, no-match rows, null keys, and the
  * reserved-name / type guards. */
// (key, t, lv) left / (key, rt, a, b) right; a is nullable.
// Top-level so Spark can derive encoders.
case class AsofL(key: Long, t: Long, lv: Long)
case class AsofR(key: Long, rt: Long, a: java.lang.Long, b: String)

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._
  private type L = AsofL
  private type R = AsofR
  private val L = AsofL
  private val R = AsofR

  /** Naive oracle: scan all right rows per left row. Assumes (key, rt)
    * unique (the generators guarantee it), so no tie-break needed. */
  private def naive(ls: Seq[L], rs: Seq[R], tol: Option[Long],
                    forward: Boolean): Map[(Long, Long, Long), Option[R]] =
    ls.map { l =>
      val cands = rs.filter(r => r.key == l.key &&
        (if (forward) r.rt >= l.t else r.rt <= l.t) &&
        tol.forall(d => math.abs(r.rt - l.t) <= d))
      val best =
        if (cands.isEmpty) None
        else Some(if (forward) cands.minBy(_.rt) else cands.maxBy(_.rt))
      (l.key, l.t, l.lv) -> best
    }.toMap

  private def runAsof(ls: Seq[L], rs: Seq[R], tol: Option[Long],
                      forward: Boolean): Map[(Long, Long, Long), Option[R]] = {
    val out = AsOfJoin.asof(
      ls.toDF("key", "t", "lv"), rs.toDF("key", "rt", "a", "b"),
      on = Seq("key"), leftTime = "t", rightTime = "rt",
      matchedTimeAs = Some("mt"),
      tolerance = tol.map(lit(_)),
      direction = if (forward) "forward" else "backward")
    out.collect().map { r =>
      val m = if (r.isNullAt(r.fieldIndex("mt"))) None
      else Some(R(r.getLong(0), r.getLong(r.fieldIndex("mt")),
        if (r.isNullAt(r.fieldIndex("a"))) null else r.getLong(r.fieldIndex("a")),
        if (r.isNullAt(r.fieldIndex("b"))) null else r.getString(r.fieldIndex("b"))))
      (r.getLong(0), r.getLong(1), r.getLong(2)) -> m
    }.toMap
  }

  private def gen(seed: Int): (Seq[L], Seq[R]) = {
    val rnd = new scala.util.Random(seed)
    val ls = (1 to 300).map(i =>
      L(rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong, i.toLong))
    // unique (key, rt); every third a is NULL — the mixture trap
    val rs = rnd.shuffle((0 until 8).flatMap { k =>
      rnd.shuffle((0 until 1000).toList).take(60).zipWithIndex.map {
        case (rt, i) =>
          R(k.toLong, rt.toLong,
            if (i % 3 == 0) null else (k * 10000L + rt),
            s"v${k}_$rt")
      }
    })
    (ls, rs)
  }

  for (forward <- Seq(false, true); tol <- Seq(None, Some(25L))) {
    val dir = if (forward) "forward" else "backward"
    test(s"asof $dir tol=$tol matches the naive per-row oracle") {
      val (ls, rs) = gen(42 + (if (forward) 1 else 0))
      assert(runAsof(ls, rs, tol, forward) == naive(ls, rs, tol, forward))
    }
  }

  test("matched row's NULL carried column stays NULL (no mixture fill)") {
    val ls = Seq(L(1, 100, 1))
    val rs = Seq(R(1, 50, 7L, "old"), R(1, 90, null, "new"))
    val got = runAsof(ls, rs, None, forward = false)((1L, 100L, 1L))
    // the rt=90 row matches; its a IS NULL and must NOT fill from rt=50
    assert(got.contains(R(1, 90, null, "new")))
  }

  test("tolerance applies to the true source row, not a newer mt") {
    val ls = Seq(L(1, 100, 1))
    val rs = Seq(R(1, 10, 7L, "stale"), R(1, 90, null, "near"))
    val got = runAsof(ls, rs, Some(15L), forward = false)((1L, 100L, 1L))
    // rt=90 is in tolerance and wins as one row — a stays null; the
    // stale rt=10 value must not ride along under rt=90's tolerance
    assert(got.contains(R(1, 90, null, "near")))
    // and when the only match is out of tolerance: no match at all
    val got2 = runAsof(Seq(L(2, 100, 1)), Seq(R(2, 10, 7L, "stale")),
      Some(15L), forward = false)((2L, 100L, 1L))
    assert(got2.isEmpty)
  }

  test("right row at exactly the left time matches in both directions") {
    val ls = Seq(L(1, 100, 1))
    val rs = Seq(R(1, 100, 5L, "exact"))
    assert(runAsof(ls, rs, None, forward = false)((1L, 100L, 1L))
      .contains(R(1, 100, 5L, "exact")))
    assert(runAsof(ls, rs, None, forward = true)((1L, 100L, 1L))
      .contains(R(1, 100, 5L, "exact")))
  }

  test("tied right rows: carried-ascending-LAST wins, from original values") {
    val out = AsOfJoin.asof(
      Seq((1L, 100L)).toDF("key", "t"),
      Seq((1L, 50L, 1L, "x"), (1L, 50L, 9L, "y"), (1L, 50L, 5L, "z"))
        .toDF("key", "rt", "a", "b"),
      on = Seq("key"), leftTime = "t", rightTime = "rt").collect()
    assert(out.length == 1)
    // largest (a, b) = (9, "y") — one coherent row
    assert(out.head.getLong(out.head.fieldIndex("a")) == 9L &&
      out.head.getString(out.head.fieldIndex("b")) == "y")
  }

  test("null equi-keys: right nulls never match, left nulls survive unmatched") {
    val ls = Seq((java.lang.Long.valueOf(1L), 100L, 1L),
      (null.asInstanceOf[java.lang.Long], 100L, 2L)).toDF("key", "t", "lv")
    val rs = Seq((java.lang.Long.valueOf(1L), 50L, 7L),
      (null.asInstanceOf[java.lang.Long], 60L, 8L)).toDF("key", "rt", "a")
    val out = AsOfJoin.asof(ls, rs, Seq("key"), "t", "rt").collect()
      .map(r => Option(r.get(r.fieldIndex("lv"))).map(_.toString.toLong).get ->
        (if (r.isNullAt(r.fieldIndex("a"))) None else Some(r.getLong(r.fieldIndex("a")))))
      .toMap
    assert(out(1L).contains(7L))   // normal match untouched
    assert(out(2L).isEmpty)        // null-key left row survives, no match
  }

  test("guards: reserved matchedTimeAs and mismatched time types rejected") {
    val l = Seq((1L, 100L)).toDF("key", "t")
    val r = Seq((1L, 50L, 2L)).toDF("key", "rt", "a")
    for (bad <- Seq("__t", "__side", "__asof_p", "__mt"))
      intercept[IllegalArgumentException](
        AsOfJoin.asof(l, r, Seq("key"), "t", "rt", matchedTimeAs = Some(bad)))
    val rInt = Seq((1L, 50, 2L)).toDF("key", "rt", "a") // rt is Int
    intercept[IllegalArgumentException](
      AsOfJoin.asof(l, rInt, Seq("key"), "t", "rt"))
  }

  test("plan shape: one exchange, no join node") {
    val (ls, rs) = gen(7)
    val out = AsOfJoin.asof(
      ls.toDF("key", "t", "lv"), rs.toDF("key", "rt", "a", "b"),
      Seq("key"), "t", "rt")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"asof must not plan a join node:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly one hash exchange, got $exchanges")
  }
}
