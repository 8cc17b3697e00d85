package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CosineJoinSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side brute force with the same quantized-idf weights. */
  private def brute(docs: Seq[(Long, String)], tNum: Int, tDen: Int)
      : Seq[(Long, Long, Double)] = {
    val n = docs.size
    val tf = docs.map { case (id, text) =>
      id -> text.toLowerCase.split("\\W+").filter(_.nonEmpty)
        .groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    }.toMap
    val dfc = tf.values.flatMap(_.keys).groupBy(identity)
      .map { case (t, xs) => t -> xs.size.toLong }
    val idf = dfc.map { case (t, d) =>
      t -> math.round(1000.0 * math.log((n + 1.0) / (d + 0.5)))
    }.filter(_._2 > 0)
    val w = tf.map { case (id, m) =>
      id -> m.collect { case (t, f) if idf.contains(t) => t -> f * idf(t) }
    }
    val norm2 = w.map { case (id, m) =>
      id -> m.values.map(x => BigInt(x) * BigInt(x)).sum
    }
    (for {
      a <- docs.map(_._1); b <- docs.map(_._1) if a < b
      num = w(a).keySet.intersect(w(b).keySet).toSeq
        .map(t => BigInt(w(a)(t)) * BigInt(w(b)(t))).sum
      if num > 0
      cos = math.floor(num.toDouble /
        math.sqrt(norm2(a).toDouble * norm2(b).toDouble) * 1e6 + 0.5) / 1e6
      if cos >= tNum.toDouble / tDen
    } yield (a, b, cos)).sortBy(p => (p._1, p._2))
  }

  test("prefix-filtered result equals driver-side brute force") {
    val docs = Seq(
      (1L, "quantum flux capacitor drives the temporal field array"),
      (2L, "quantum flux capacitor drives the temporal field array today"),
      (3L, "the the the common words only and nothing else rare"),
      (4L, "temporal field array with quantum capacitor and flux"),
      (5L, "completely unrelated text about gardening tomatoes soil"),
      (6L, "gardening tomatoes soil and completely unrelated text about"))
    val got = CosineJoin.tfidfCosineJoin(
        docs.toDF("doc_id", "text"), "doc_id", "text",
        thresholdNum = 5, thresholdDen = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq.sortBy(p => (p._1, p._2))
    val exp = brute(docs, 5, 10)
    assert(got == exp, s"filter diverged:\n got=$got\n exp=$exp")
    assert(exp.nonEmpty, "fixture must produce at least one pair")
    // the heavily-overlapping pairs surface above the cut
    assert(got.exists { case (a, b, c) => (a, b) == ((1L, 4L)) && c > 0.5 })
    assert(got.exists { case (a, b, c) => (a, b) == ((5L, 6L)) && c > 0.9 })
  }

  test("identical docs reach cosine 1.0; threshold and caps guard") {
    val docs = Seq((1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),
      (3L, "epsilon zeta eta theta"))
    val out = CosineJoin.tfidfCosineJoin(
        docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, 2L, 1.0)))
    intercept[IllegalArgumentException](CosineJoin.tfidfCosineJoin(
      docs.toDF("doc_id", "text"), "doc_id", "text", thresholdNum = 11))
    intercept[IllegalArgumentException](CosineJoin.tfidfCosineJoin(
      docs.toDF("doc_id", "text"), "doc_id", "text", maxPostings = 1))
  }

  test("join-strategy equivalence: no mandatory broadcast of the " +
      "vocabulary table; forced shuffle-only plan gives same result") {
    val docs = Seq(
      (1L, "quantum flux capacitor drives the temporal field array"),
      (2L, "quantum flux capacitor drives the temporal field array today"),
      (4L, "temporal field array with quantum capacitor and flux"),
      (5L, "completely unrelated text about gardening tomatoes soil"),
      (6L, "gardening tomatoes soil and completely unrelated text about"))
    val out = CosineJoin.tfidfCosineJoin(
      docs.toDF("doc_id", "text"), "doc_id", "text", 5, 10)
    // the logical plan must carry NO broadcast hint — at 100 TB the
    // term dictionary is billions of rows and a mandatory broadcast
    // would sink the job; runtime (AQE) broadcasts are fine. Checked
    // on the ANALYZED plan (round-19, closes the r18 ADVICE gap): the
    // optimizedPlan substitutes the persisted prefix subtree with an
    // InMemoryRelation, hiding the vocabulary join from a collect over
    // Join nodes — the analyzed plan is pre-cache-substitution, so
    // every join of the operator is actually inspected. Hints live as
    // ResolvedHint wrappers at this phase; the operator must add none.
    val hints = out.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hints.isEmpty,
      s"vocabulary join must not carry a mandatory broadcast hint: $hints")
    // sanity: the analyzed plan actually exposes the joins being audited
    val nJoins = out.queryExecution.analyzed.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.size
    assert(nJoins >= 5, s"expected the full join tree pre-cache, saw $nJoins")
    def run() = CosineJoin.tfidfCosineJoin(
        docs.toDF("doc_id", "text"), "doc_id", "text", 5, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq.sortBy(p => (p._1, p._2))
    val default = run()
    val (bt, aqe) = (spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
      spark.conf.get("spark.sql.adaptive.enabled"))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      assert(run() == default,
        "shuffle-only execution diverged from the default plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bt)
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
    }
    assert(default == brute(docs, 5, 10))
  }

  test("loud cap: over-cap terms fail by default, warn/allow opt in") {
    // six identical docs share three mid-rarity terms (df=6 of 12 —
    // rare enough that all three land in the indexed prefix), six
    // junk docs pad the corpus; cap 3 < 6 ⇒ every indexed term of
    // the identical cluster overflows
    val docs = (0 until 6).map(i => (i.toLong, "sharedrare filler alpha")) ++
      (6 until 12).map(i => (i.toLong, s"unique$i distinct$i"))
    val df = docs.toDF("doc_id", "text")
    val ex = intercept[graft.core.GraftError.DataValidation](
      CosineJoin.tfidfCosineJoin(df, "doc_id", "text", 5, 10,
        maxPostings = 3))
    assert(ex.getMessage.contains("maxPostings=3") &&
      ex.getMessage.contains("exceed"),
      s"cap failure must name the cap and count: ${ex.getMessage}")
    // warn + allow proceed; with every shared term capped out of the
    // index no candidate survives — the documented recall loss
    val warned = CosineJoin.tfidfCosineJoin(df, "doc_id", "text", 5, 10,
      maxPostings = 3, onCapped = "warn").collect()
    val allowed = CosineJoin.tfidfCosineJoin(df, "doc_id", "text", 5, 10,
      maxPostings = 3, onCapped = "allow").collect()
    assert(warned.isEmpty && allowed.isEmpty,
      "capping every cluster term must drop the cluster's pairs")
    // and with an adequate cap the same corpus passes the check and
    // returns the full brute-force answer
    val ok = CosineJoin.tfidfCosineJoin(df, "doc_id", "text", 5, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq.sortBy(p => (p._1, p._2))
    assert(ok == brute(docs, 5, 10))
  }

  test("threshold sweep stays complete on a denser corpus") {
    // 12 overlapping docs; verify at two thresholds against brute force
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    val docs = (0 until 12).map { i =>
      (i.toLong,
        (0 until 6).map(j => words((i * 3 + j * 2) % words.length))
          .mkString(" "))
    }
    for ((tn, td) <- Seq((4, 10), (7, 10))) {
      val got = CosineJoin.tfidfCosineJoin(
          docs.toDF("doc_id", "text"), "doc_id", "text", tn, td)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSeq.sortBy(p => (p._1, p._2))
      assert(got == brute(docs, tn, td), s"diverged at $tn/$td")
    }
  }
}
