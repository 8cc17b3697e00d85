package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  /** Naive in-memory power iteration, same formulation. */
  private def naive(edges: Seq[(Long, Long)], iters: Int,
                    d: Double): Map[Long, Double] = {
    val e = edges.distinct
    val deg = e.groupBy(_._1).view.mapValues(_.size).toMap
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    var r = nodes.map(_ -> 1.0).toMap
    for (_ <- 1 to iters) {
      val in = e.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => r(s) / deg(s) }.sum).toMap
      r = nodes.map(n => n -> ((1 - d) + d * in.getOrElse(n, 0.0))).toMap
    }
    r
  }

  test("matches the naive power iteration on a random graph") {
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val got = PageRank.ranks(edges.toDF("s", "t"), "s", "t", iters = 4)
      .as[(Long, Double)].collect().toMap
    val want = naive(edges, 4, 0.85)
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-9,
      s"node $k: $v vs ${want(k)}") }
  }

  test("star graph: the hub outranks its leaves; sources settle at 1-d") {
    // leaves 1..5 -> hub 0; hub links back to leaf 1 only
    val edges = (1L to 5L).map(_ -> 0L) :+ (0L -> 1L)
    val r = PageRank.ranks(edges.toDF("s", "t"), "s", "t", iters = 10)
      .as[(Long, Double)].collect().toMap
    // the 0<->1 cycle concentrates mass: both far outrank leaves 2..5
    assert(r(0L) > 2.0 && r(1L) > 2.0 && r(0L) > r(2L) * 10)
    // leaves 2..5 have no in-links: exactly 1-d
    (2L to 5L).foreach(l => assert(math.abs(r(l) - 0.15) < 1e-12))
  }

  test("deterministic across runs; guards reject bad inputs") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)).toDF("s", "t")
    val a = PageRank.ranks(e, "s", "t").as[(Long, Double)].collect().toMap
    val b = PageRank.ranks(e, "s", "t").as[(Long, Double)].collect().toMap
    assert(a == b)
    intercept[IllegalArgumentException] { PageRank.ranks(e, "nope", "t") }
    intercept[IllegalArgumentException] { PageRank.ranks(e, "s", "t", iters = 0) }
    intercept[IllegalArgumentException] { PageRank.ranks(e, "s", "t", damping = 1.0) }
  }

  test("duplicate edge rows count once (distinct-edge matrix form)") {
    val dup = Seq((1L, 2L), (1L, 2L), (1L, 3L)).toDF("s", "t")
    val uniq = Seq((1L, 2L), (1L, 3L)).toDF("s", "t")
    val a = PageRank.ranks(dup, "s", "t").as[(Long, Double)].collect().toMap
    val b = PageRank.ranks(uniq, "s", "t").as[(Long, Double)].collect().toMap
    assert(a == b)
  }
}
