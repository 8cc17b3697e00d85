package graft.llm

import graft.SparkSpec
import graft.functions.BpeExprs
import org.apache.spark.sql.functions._

class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  test("Sennrich canonical vocabulary: the published merge sequence") {
    // the ACL-2016 paper's worked example: low:5 lower:2 newest:6
    // widest:3 — pair stats make the first merges (e,s) -> (es,t) ->
    // (est,</w>) -> (l,o) -> (lo,w) under count-then-lex tie-breaks
    val corpus = (
      Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    ).mkString(" ")
    val df = Seq(corpus).toDF("text")
    val merges = BpeTrain.learnMerges(df, "text", numMerges = 5)
    assert(merges == Seq(
      ("e", "s"), ("es", "t"), ("est", "</w>"),
      ("l", "o"), ("lo", "w")))
    // the learned artifact drives the apply expressions: "lowest"
    // segments into the learned subwords low + est</w>
    val toks = Seq("lowest").toDF("t")
      .select(BpeExprs.bpe_tokenize($"t", merges).as("tk"))
      .as[Seq[String]].collect()(0)
    assert(toks == Seq("low", "est</w>"))
    // round-trip through the published file format
    val parsed = BpeExprs.parseMerges(
      BpeTrain.mergesLines(merges).iterator)
    assert(parsed == merges)
  }

  test("min-frequency stopping, overlap counting, determinism") {
    // 'aaa' x3: pairs (a,a) count 2 per word (every adjacent position)
    val df = Seq("aaa aaa aaa zq").toDF("text")
    val m = BpeTrain.learnMerges(df, "text", numMerges = 50)
    assert(m.head == ("a", "a"))
    // rare-word pairs (zq appears once) never yield a merge at
    // minFrequency=2 — the loop stops before numMerges
    assert(!m.exists { case (a, b) => (a + b).contains("z") })
    // same corpus, same merges, any run
    assert(m == BpeTrain.learnMerges(df, "text", numMerges = 50))
    // guards
    intercept[IllegalArgumentException](
      BpeTrain.learnMerges(df, "text", 0))
    intercept[IllegalArgumentException](
      BpeTrain.learnMerges(df, "text", 5, vocabSize = 0))
  }

  test("full merge sequence to exhaustion is ratio-invariant — the " +
      "q_bpe_train planting") {
    // the worked-example multiset at per-doc scale factors 1 and 2:
    // all pair counts share the corpus factor S, so the complete
    // sequence matches the hand-derived 15 merges at ANY corpus size
    def corpus(m: Int) = (
      Seq.fill(5 * m)("low") ++ Seq.fill(2 * m)("lower") ++
        Seq.fill(6 * m)("newest") ++ Seq.fill(3 * m)("widest")
    ).mkString(" ")
    val expected = Seq(
      ("e", "s"), ("es", "t"), ("est", "</w>"),
      ("l", "o"), ("lo", "w"),
      ("e", "w"), ("ew", "est</w>"), ("n", "ewest</w>"),
      ("low", "</w>"),
      ("d", "est</w>"), ("i", "dest</w>"), ("w", "idest</w>"),
      ("e", "r"), ("er", "</w>"), ("low", "er</w>"))
    for (docs <- Seq(Seq(corpus(1)), Seq(corpus(1), corpus(2)),
        Seq(corpus(3), corpus(2), corpus(2)))) {
      val m = BpeTrain.learnMerges(docs.toDF("text"), "text",
        numMerges = 15)
      assert(m == expected, s"diverged for ${docs.length} docs")
      // 15 merges fuse every word to one token: asking for more stops
      // exhausted at the same sequence
      assert(BpeTrain.learnMerges(docs.toDF("text"), "text",
        numMerges = 40) == expected)
    }
  }

  test("case-preserving whitespace pre-tokenization matches apply side") {
    // 'The' and 'the' are distinct words (the apply-side contract);
    // punctuation stays attached to its word
    val df = Seq("The the the The. the").toDF("text")
    val merges = BpeTrain.learnMerges(df, "text", numMerges = 3)
    // 'the' (count 3) drives the first merges: (h,e) or (t,h) by tie
    // rules — just assert nothing learned from 'The.' alone and that
    // the top merges only involve lowercase t/h/e symbols + </w>
    assert(merges.nonEmpty)
    assert(merges.forall { case (a, b) =>
      (a + b).forall(c => "the</w>".contains(c)) })
  }
}
