package graft.llm

import graft.SparkSpec
import graft.functions.WordPieceExprs
import org.apache.spark.sql.functions._

class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  // the published worked example (HuggingFace course, WordPiece
  // chapter): corpus hug×10 pug×5 pun×12 bun×4 hugs×5 — first merge is
  // (##g, ##s) because the LIKELIHOOD score 5/(20·5) beats every
  // 1/36-scoring pair, even though (##u, ##g) has 4× its raw count
  private def corpus(scale: Int) = Seq.tabulate(3)(i => (i.toLong,
    (("hug " * (10 * scale)) + ("pug " * (5 * scale)) +
      ("pun " * (12 * scale)) + ("bun " * (4 * scale)) +
      ("hugs " * (5 * scale))).trim)).toDF("id", "text")

  test("trainer: likelihood score picks ##gs first (worked example); " +
      "vocab = alphabet ++ merges; scale-invariant") {
    val v1 = WordPieceTrain.learnVocab(corpus(1), "text", numMerges = 4,
      minFrequency = 1)
    // alphabet sorted first: ## continuations then word-initials
    assert(v1.take(7) == Seq("##g", "##n", "##s", "##u", "b", "h", "p"),
      s"alphabet: ${v1.take(7)}")
    assert(v1(7) == "##gs", s"first merge must be ##gs (score 1/20): $v1")
    // the whole sequence is deterministic and scale-invariant
    val v3 = WordPieceTrain.learnVocab(corpus(3), "text", numMerges = 4,
      minFrequency = 1)
    assert(v1 == v3, "WordPiece scores share one corpus factor")
  }

  test("apply: greedy longest-match-first, ## continuations, [UNK] " +
      "for dead words and megawords") {
    val vocab = Seq("h", "hug", "hugg", "##s", "##ing", "p", "##u",
      "##un", "b")
    val got = Seq("hug hugs hugging pun xyz b").toDF("t")
      .select(WordPieceExprs.wordpiece_tokenize($"t", vocab).as("tk"))
      .as[Seq[String]].head()
    // hugging: hugg + ##ing (longest-first beats hug + ...)
    // pun: p + ##un (longest continuation)
    // xyz: no match at position 0 → whole word [UNK]
    assert(got == Seq("hug", "hug", "##s", "hugg", "##ing",
      "p", "##un", "[UNK]", "b"), s"got $got")
    val n = Seq("hug hugs hugging pun xyz b").toDF("t")
      .select(WordPieceExprs.wordpiece_token_count($"t", vocab).as("n"))
      .as[Long].head()
    assert(n == 9L)
    // a word with a matchable head but dead tail is STILL whole-[UNK]
    val dead = Seq("hugx").toDF("t")
      .select(WordPieceExprs.wordpiece_tokenize($"t", vocab).as("tk"))
      .as[Seq[String]].head()
    assert(dead == Seq("[UNK]"), s"dead tail must void the word: $dead")
    // megaword guard
    val mega = Seq("h" * 250).toDF("t")
      .select(WordPieceExprs.wordpiece_tokenize($"t", vocab).as("tk"))
      .as[Seq[String]].head()
    assert(mega == Seq("[UNK]"))
  }

  test("train + apply round-trip: the corpus segments under its own " +
      "learned vocabulary with no [UNK]") {
    val vocab = WordPieceTrain.learnVocab(corpus(1), "text",
      numMerges = 10, minFrequency = 1)
    val toks = corpus(1)
      .select(explode(WordPieceExprs.wordpiece_tokenize($"text", vocab))
        .as("t"))
      .groupBy($"t").count().collect().map(r => r.getString(0)).toSet
    assert(!toks.contains("[UNK]"),
      s"training corpus must stay fully coverable: $toks")
  }
}
