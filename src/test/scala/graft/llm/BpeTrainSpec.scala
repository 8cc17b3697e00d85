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
