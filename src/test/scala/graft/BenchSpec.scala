package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench contention tripwire is pure logic — r13's committed
  * artifact was taken on a loaded box and read ~25% hot, so the
  * trigger that would have caught it gets its own pins. */
class BenchSpec extends AnyFunSuite {

  private def qs(n: Int, sec: Double): Map[String, Double] =
    (1 to n).map(i => s"q_$i" -> sec).toMap

  test("contentionRatio: shared-query total ratio, growth-tolerant") {
    // identical runs → ratio 1
    assert(Bench.contentionRatio(qs(20, 1.0), qs(20, 1.0)).contains(1.0))
    // a 25% inflated run → ratio 1.25 (the r13 failure mode)
    assert(Bench.contentionRatio(qs(20, 1.25), qs(20, 1.0)).contains(1.25))
    // NEW queries this round don't pollute the comparison: ratio is
    // over the intersection only
    val cur = qs(20, 1.0) ++ Map("q_new_a" -> 50.0, "q_new_b" -> 50.0)
    assert(Bench.contentionRatio(cur, qs(20, 1.0)).contains(1.0))
    // queries REMOVED since the baseline don't pollute either
    assert(Bench.contentionRatio(qs(20, 1.0),
      qs(20, 1.0) + ("q_gone" -> 99.0)).contains(1.0))
  }

  test("contentionRatio: refuses tiny overlaps and degenerate baselines") {
    // fewer than minShared common queries → no verdict
    assert(Bench.contentionRatio(qs(5, 2.0), qs(5, 1.0)).isEmpty)
    assert(Bench.contentionRatio(qs(5, 2.0), qs(5, 1.0), minShared = 5)
      .contains(2.0))
    // disjoint sets → no verdict
    val other = (1 to 20).map(i => s"p_$i" -> 1.0).toMap
    assert(Bench.contentionRatio(qs(20, 1.0), other).isEmpty)
    // zero baseline total → no verdict (never divide by zero)
    assert(Bench.contentionRatio(qs(20, 1.0), qs(20, 0.0)).isEmpty)
    // empty baseline (first run at an sf) → no verdict
    assert(Bench.contentionRatio(qs(20, 1.0), Map.empty).isEmpty)
  }

  test("minBaseline defeats drift laundering: two successively drifted " +
      "runs still trip against the min of the window (the r14 hole)") {
    def flagged(cur: Map[String, Double],
                history: Seq[Map[String, Double]]) =
      Bench.contentionRatio(cur, Bench.minBaseline(history)).exists(_ > 1.2)
    // figure of record 1.0s/query, then a +10% drift, then another
    // +10% on top: vs the LAST entry alone the second drift is ratio
    // ~1.10 (launders through); vs the window min it is 1.21 → trips
    val record = qs(20, 1.0)
    val drift1 = qs(20, 1.10)
    val drift2 = qs(20, 1.21)
    assert(Bench.contentionRatio(drift2, drift1).exists(_ < 1.2),
      "precondition: last-entry comparison would launder this")
    assert(flagged(drift2, Seq(drift1, record)))
    // newest-first windows with per-query mins across partial overlaps
    val m = Bench.minBaseline(Seq(
      Map("a" -> 2.0, "b" -> 1.0), Map("a" -> 1.5), Map("c" -> 3.0)))
    assert(m == Map("a" -> 1.5, "b" -> 1.0, "c" -> 3.0))
    // a genuinely flat run against a window never flags
    assert(!flagged(record, Seq(drift1, record)))
    // empty history (first run at an sf) → no verdict
    assert(Bench.contentionRatio(qs(20, 1.0),
      Bench.minBaseline(Nil)).isEmpty)
  }

  test("the 1.2 trip threshold: flat and improved runs never flag") {
    def flagged(cur: Map[String, Double], prev: Map[String, Double]) =
      Bench.contentionRatio(cur, prev).exists(_ > 1.2)
    assert(!flagged(qs(20, 1.0), qs(20, 1.0)))
    assert(!flagged(qs(20, 0.7), qs(20, 1.0))) // faster: fine
    assert(!flagged(qs(20, 1.19), qs(20, 1.0))) // inside noise band
    assert(flagged(qs(20, 1.25), qs(20, 1.0))) // the r13 case trips
  }

  test("bestQuietArtifact: emits the round's quiet min over the " +
      "IDENTICAL query set AND committed src tree; contended, " +
      "different-set, different-tree, pre-v3, and slower entries " +
      "never substitute, nor does anything for a dirty tree") {
    def line(sf: String, total: Double, contended: Boolean,
             keys: Seq[String], v: Int = 3, src: String = "tree-A"): String = {
      val q = keys.map(k => s""""$k":1.0""").mkString("{", ",", "}")
      s"""{"sf":"$sf","iters":3,"bench_version":$v,"contended":$contended""" +
        s""","total":$total,"src":"$src","queries":$q""" +
        s""","artifact":"{\\"total\\":$total}"""" +
        s""","artifact_tail":"{\\"t\\":$total}"}"""
    }
    val keys = Seq("q_a", "q_b")
    val sf = "/root/testdata/sf0.1"
    // the quiet min of the matching set wins over a slower current run
    val lines = Seq(
      line(sf, 140.0, contended = false, keys),
      line(sf, 150.0, contended = false, keys),
      line(sf, 120.0, contended = true, keys),     // contended: excluded
      line(sf, 100.0, contended = false, Seq("q_a")), // other set: excluded
      line("/other/sf", 90.0, contended = false, keys), // other sf
      line(sf, 95.0, contended = false, keys, v = 2),   // pre-v3
      line(sf, 85.0, contended = false, keys, src = "tree-B")) // other code
    val got = Bench.bestQuietArtifact(lines, sf, keys.toSet, 148.0, "tree-A")
    assert(got.map(_._3).contains(140.0), s"got $got")
    assert(got.get._1 == """{"total":140.0}""")
    // current run IS the min → None (print the fresh run)
    assert(Bench.bestQuietArtifact(lines, sf, keys.toSet, 139.0, "tree-A")
      .isEmpty)
    // no quiet matching entry at all → None
    assert(Bench.bestQuietArtifact(lines, sf, Set("q_z"), 148.0, "tree-A")
      .isEmpty)
    // a DIRTY/unknown current tree never substitutes — conservative
    assert(Bench.bestQuietArtifact(lines, sf, keys.toSet, 148.0, "").isEmpty)
    // a different-iters methodology never substitutes either
    assert(Bench.bestQuietArtifact(lines, sf, keys.toSet, 148.0, "tree-A",
      curIters = 10).isEmpty)
    // garbage lines never throw
    assert(Bench.bestQuietArtifact(Seq("not json", ""), sf,
      keys.toSet, 1.0, "tree-A").isEmpty)
  }

  test("pipeline registry: both committed example stage lists are named") {
    assert(Bench.PipelineNames == Seq("pretrain_curation", "target_selection"))
  }
}
