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

  test("briefLine is bounded (<500 bytes) no matter how the run went — " +
      "the r17 failure was an unbounded 'compact' line outgrowing the " +
      "driver's 2 KB tail capture") {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    // worst case: 100 failed queries with long names, contended run,
    // substitution fields present — everything that can appear at once
    val manyFailed = (1 to 100).map(i =>
      s"q_some_extremely_long_query_name_number_$i")
    val worst = Bench.briefLine(
      value = 12345.6789, totalCold = 23456.7891, iters = 10,
      contended = Some(true), contentionRatio = Some(1.2756),
      failed = manyFailed, sfDir = "/root/testdata/sf0.1",
      artifactSource = Some("round_history_min"),
      currentTotal = Some(99999.9999))
    assert(worst.getBytes("UTF-8").length < 500,
      s"briefLine is ${worst.length} bytes: $worst")
    // and it is complete, parseable JSON carrying the scalars
    val n = om.readTree(worst)
    assert(n.get("value").asDouble() == 12345.6789)
    assert(n.get("failed_count").asInt() == 100)
    assert(n.get("failed_sample").size() == 3)
    assert(n.get("contended").asBoolean())
    assert(n.get("artifact_source").asText() == "round_history_min")
    // the happy path carries no failure/substitution noise
    val clean = Bench.briefLine(136.08, 210.0, 3, Some(false), Some(1.01),
      Nil, "/root/testdata/sf0.1")
    val cn = om.readTree(clean)
    assert(cn.get("failed_count").asInt() == 0)
    assert(!cn.has("failed_sample") && !cn.has("artifact_source"))
    assert(clean.getBytes("UTF-8").length < 250)
  }

  test("pruneHistory strips artifacts outside the read window but keeps " +
      "the depth window, current-tree entries, other-sf lines, and " +
      "garbage untouched") {
    def full(sf: String, total: Double, src: String): String =
      s"""{"sf":"$sf","iters":3,"bench_version":3,"contended":false""" +
        s""","total":$total,"src":"$src","queries":{"q_a":1.0}""" +
        s""","artifact":"{}","artifact_tail":"{}"}"""
    val sf = "/root/testdata/sf0.1"
    val lines = Seq(
      "not json at all",
      full("/other/sf", 50.0, "tree-X"),   // other sf: untouched
      full(sf, 200.0, "tree-old"),         // old, other tree → stripped
      full(sf, 190.0, "tree-cur"),         // old but CURRENT tree → kept
      full(sf, 180.0, "tree-old2"),        // inside depth-3 window → kept
      full(sf, 170.0, "tree-old3"),
      full(sf, 160.0, "tree-cur"))
    val out = Bench.pruneHistory(lines, sf, "tree-cur", depth = 3)
    assert(out.size == lines.size)
    assert(out(0) == lines(0) && out(1) == lines(1))
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val stripped = om.readTree(out(2))
    assert(!stripped.has("queries") && !stripped.has("artifact"),
      s"old other-tree entry should be totals-only: ${out(2)}")
    assert(stripped.get("total").asDouble() == 200.0 &&
      stripped.get("src").asText() == "tree-old")
    // current-tree and window entries keep their artifacts
    Seq(3, 4, 5, 6).foreach(i => assert(om.readTree(out(i)).has("artifact"),
      s"line $i should keep its artifact"))
    // idempotent: pruning the pruned output is a no-op
    assert(Bench.pruneHistory(out, sf, "tree-cur", depth = 3) == out)
    // a dirty tree ("" src) still prunes by window alone
    val dirty = Bench.pruneHistory(lines, sf, "", depth = 3)
    assert(!om.readTree(dirty(3)).has("artifact"),
      "with no current tree, only the depth window keeps artifacts")
  }
}
