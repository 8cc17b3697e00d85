package graft.llm

import graft.SparkSpec
import graft.functions.UnigramExprs
import org.apache.spark.sql.functions._

class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  test("trainer: model is a distribution, chars always survive, " +
      "repeats deterministically, scale-invariant") {
    val docs = Seq.fill(4)("low low lower lowest newest newest")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val m1 = UnigramLm.train(docs, "text", vocabSize = 14,
      maxPieceLen = 5, minFrequency = 2)
    val m2 = UnigramLm.train(docs, "text", vocabSize = 14,
      maxPieceLen = 5, minFrequency = 2)
    assert(m1 == m2, "same corpus, same model")
    assert(m1.size == 14)
    // every codepoint of the corpus is present (coverage guarantee)
    val pieces = m1.map(_._1).toSet
    "lowerstn".foreach(c => assert(pieces(c.toString), s"char $c kept"))
    // probabilities form a distribution
    val mass = m1.map { case (_, lp) => math.exp(lp) }.sum
    assert(math.abs(mass - 1.0) < 1e-9, s"prob mass $mass")
    // output order is (logProb desc, piece asc) — a total order
    assert(m1 == m1.sortBy { case (p, lp) => (-lp, p) })
    // frequent subwords beat rare ones: "low" appears in 3 of 4 word
    // types (weighted 4+1+1 per doc) and must out-probable "west"
    val lp = m1.toMap
    assert(lp.contains("low"), s"expected 'low' in ${m1.map(_._1)}")
    // tripling the corpus leaves the 4dp-rounded model unchanged
    // (EM is scale-free)
    val tripled = docs.union(docs).union(docs)
    val m3 = UnigramLm.train(tripled, "text", vocabSize = 14,
      maxPieceLen = 5, minFrequency = 2)
    def r4(m: Seq[(String, Double)]) =
      m.map { case (p, v) => (p, math.floor(v * 1e4 + 0.5) / 1e4) }
    assert(r4(m3) == r4(m1), "scale invariance at 4dp")
    // vocabSize below the char count is a loud error
    intercept[IllegalArgumentException](
      UnigramLm.train(docs, "text", vocabSize = 3))
  }

  test("megaword guard + rescaled lattice: blobs over maxWordLen drop " +
      "(and can't squat in the top word cut), and a word far past the " +
      "plain-probability underflow point trains finite (r11 ADVICE)") {
    // a 500-codepoint base64-ish blob occurs MORE often than the real
    // words — without the pre-cut filter it would claim a top slot
    val blob = "A1b2" * 125
    val docs = Seq.tabulate(4)(i =>
      (i.toLong, s"$blob $blob low lower newest")).toDF("id", "text")
    val m = UnigramLm.train(docs, "text", vocabSize = 14,
      maxPieceLen = 5, minFrequency = 2)
    assert(m.forall { case (p, lp) => !p.contains("A1b2A1b2") &&
      !lp.isNaN }, s"blob leaked or NaN: $m")
    // same corpus with the guard raised above the blob length: the
    // 500-position lattice underflows plain double products (p^n dies
    // ~150 positions at p=1e-2) — rescaling must keep it finite and
    // the blob's dominant piece must now be learnable
    val m2 = UnigramLm.train(docs, "text", vocabSize = 30,
      maxPieceLen = 5, minFrequency = 2, maxWordLen = 600)
    assert(m2.forall { case (_, lp) => !lp.isNaN && lp <= 0.0 },
      s"NaN/positive logProb under 500-cp lattice: $m2")
    val mass2 = m2.map { case (_, lp) => math.exp(lp) }.sum
    assert(math.abs(mass2 - 1.0) < 1e-9, s"prob mass $mass2")
    assert(m2.exists { case (p, lp) => p.length > 1 &&
      blob.contains(p) && lp > math.log(1e-6) },
      s"no high-prob blob subword learned: $m2")
    // maxWordLen below maxPieceLen is a loud config error
    intercept[IllegalArgumentException](UnigramLm.train(docs, "text",
      vocabSize = 14, maxPieceLen = 5, maxWordLen = 3))
  }

  test("viterbi apply: argmax segmentation, tie to longest last piece, " +
      "OOV char fallback") {
    val ln = math.log _
    // p(ab)=0.4 beats p(a)p(b)=0.09
    val model = Seq(("ab", ln(0.4)), ("a", ln(0.3)), ("b", ln(0.3)))
    val got = Seq("ab aab xb").toDF("t")
      .select(UnigramExprs.unigram_tokenize($"t", model).as("tk"))
      .as[Seq[String]].head()
    // "aab" → a + ab (0.3·0.4 = 0.12 beats a·a·b = 0.027)
    // "xb"  → x (OOV fallback) + b
    assert(got == Seq("ab", "a", "ab", "x", "b"), s"got $got")
    val n = Seq("ab aab xb").toDF("t")
      .select(UnigramExprs.unigram_token_count($"t", model).as("n"))
      .as[Long].head()
    assert(n == 5L)
    // exact tie: p(ab)=0.09 equals p(a)p(b)=0.09 → longest last piece
    val tie = Seq(("ab", ln(0.09)), ("a", ln(0.3)), ("b", ln(0.3)))
    val t = Seq("ab").toDF("t")
      .select(UnigramExprs.unigram_tokenize($"t", tie).as("tk"))
      .as[Seq[String]].head()
    assert(t == Seq("ab"), s"tie must take the longer piece: $t")
    // surrogate pairs segment whole (😀 is one codepoint, OOV)
    val emoji = Seq("a😀b").toDF("t")
      .select(UnigramExprs.unigram_tokenize($"t", model).as("tk"))
      .as[Seq[String]].head()
    assert(emoji == Seq("a", "😀", "b"))
  }

  test("apply under a TRAINED model: -infinity coverage anchors act " +
      "as misses, so unreachable words still char-segment (r11 review)") {
    val docs = Seq.tabulate(4)(i => (i.toLong,
      "low low low low low lower lower newest newest newest newest " +
        "newest newest widest widest widest")).toDF("id", "text")
    val model = UnigramLm.train(docs, "text", vocabSize = 14,
      maxPieceLen = 6, minFrequency = 2)
    // the planted model converges to whole-word pieces; chars carry
    // log_prob -infinity — a word made ONLY of those chars must fall
    // back to per-char OOV tokens, not emit one bogus whole-word piece
    val toks = Seq("dew").toDF("t")
      .select(UnigramExprs.unigram_tokenize($"t", model).as("tk"))
      .as[Seq[String]].head()
    assert(toks == Seq("d", "e", "w"),
      s"-inf chars must behave as misses: $toks")
    val n = Seq("dew low").toDF("t")
      .select(UnigramExprs.unigram_token_count($"t", model).as("n"))
      .as[Long].head()
    assert(n == 4L, "3 char fallbacks + 1 whole-word piece")
  }

  test("trainer + apply compose: the learned model segments the " +
      "training corpus into its dominant pieces") {
    val docs = Seq.tabulate(6)(i => (i.toLong, "ababab abab ab"))
      .toDF("id", "text")
    val model = UnigramLm.train(docs, "text", vocabSize = 6,
      maxPieceLen = 4, minFrequency = 2)
    val toks = Seq("ababab").toDF("t")
      .select(UnigramExprs.unigram_tokenize($"t", model).as("tk"))
      .as[Seq[String]].head()
    // whatever the exact probabilities, a corpus that is nothing but
    // ab-repeats must NOT segment to single chars
    assert(toks.exists(_.length > 1), s"learned no subword: $toks")
    assert(toks.mkString == "ababab", "segmentation is a partition")
  }
}
