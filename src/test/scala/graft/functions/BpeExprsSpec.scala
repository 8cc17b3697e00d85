package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import BpeExprs._

class BpeExprsSpec extends SparkSpec {
  import spark.implicits._

  /** The published worked example of Sennrich, Haddow & Birch 2016
    * (ACL, "Neural Machine Translation of Rare Words with Subword
    * Units"): merges learned from the corpus {low×5, lower×2,
    * newest×6, widest×3}, in the paper's frequency order. */
  private val sennrich: Seq[(String, String)] = Seq(
    ("e", "s"), ("es", "t"), ("est", "</w>"),
    ("l", "o"), ("lo", "w"),
    ("n", "e"), ("ne", "w"), ("new", "est</w>"),
    ("low", "</w>"),
    ("w", "i"), ("wi", "d"), ("wid", "est</w>"))

  test("published Sennrich 2016 vectors: the worked-example merges replay") {
    val df = Seq("low", "lower", "newest", "widest", "unk",
      "newest widest low").toDF("t")
    val got = df.select($"t",
        bpe_tokenize($"t", sennrich).as("toks"),
        bpe_token_count($"t", sennrich).as("n"))
      .collect().map(r => r.getString(0) ->
        (r.getSeq[String](1).toList, r.getLong(2))).toMap
    // in-vocabulary words collapse exactly as the paper derives
    assert(got("low") == (List("low</w>"), 1L))
    assert(got("newest") == (List("newest</w>"), 1L))
    assert(got("widest") == (List("widest</w>"), 1L))
    // 'lower': low + e + r + </w> — no (e,r) merge was learned
    assert(got("lower") == (List("low", "e", "r", "</w>"), 4L))
    // OOV: one token per codepoint + </w>, nothing merges
    assert(got("unk") == (List("u", "n", "k", "</w>"), 4L))
    // whitespace pre-tokenization: counts add per word
    assert(got("newest widest low")._2 == 3L)
  }

  test("merge PRIORITY is rank order, not left-to-right scan order") {
    // with pair ranks (b,c) < (a,b): 'abc' must merge bc first, then
    // nothing — a left-to-right greedy scan would fuse ab instead
    val m = Seq(("b", "c"), ("a", "b"))
    val r = Seq("abc").toDF("t")
      .select(bpe_tokenize($"t", m)).head.getSeq[String](0).toList
    assert(r == List("a", "bc", "</w>"), r.toString)
    // all occurrences of the winning pair fuse in one step
    val m2 = Seq(("a", "a"))
    val r2 = Seq("aaaa").toDF("t")
      .select(bpe_tokenize($"t", m2)).head.getSeq[String](0).toList
    assert(r2 == List("aa", "aa", "</w>"), r2.toString)
  }

  test("merges file: published format round-trip, loud on malformed lines") {
    val dir = java.nio.file.Files.createTempDirectory("bpe").toFile
    val f = new java.io.File(dir, "merges.txt")
    val body = "#version: 0.2\n\ne s\nes t\nest </w>\n# a comment\nl o\n"
    java.nio.file.Files.write(f.toPath, body.getBytes("UTF-8"))
    assert(loadMerges(f.getPath) ==
      Seq(("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o")))
    val bad = new java.io.File(dir, "bad.txt")
    java.nio.file.Files.write(bad.toPath, "e s t\n".getBytes("UTF-8"))
    intercept[IllegalArgumentException](loadMerges(bad.getPath))
    // duplicate merge lines: first rank wins (published tokenizer rule)
    assert(Seq("es").toDF("t")
      .select(bpe_token_count($"t", Seq(("e", "s"), ("e", "s"))))
      .head.getLong(0) == 2L) // es + </w>
  }

  test("codepoint symbols: astral chars never split; null stays null") {
    // 🙂 is one symbol (two UTF-16 units) — count = cp count + 1
    val r = Seq("a🙂b").toDF("t")
      .select(bpe_token_count($"t", Seq.empty)).head.getLong(0)
    assert(r == 4L, s"3 codepoints + </w>: $r")
    val n = Seq[Option[String]](None).toDF("t")
      .select(bpe_token_count($"t", sennrich)).head
    assert(n.isNullAt(0))
    // empty text: zero tokens
    assert(Seq("   ").toDF("t")
      .select(bpe_token_count($"t", sennrich)).head.getLong(0) == 0L)
  }

  test("real-token budgets: tokenBudget consumes BPE counts end-to-end") {
    val docs = (1L to 40L)
      .map(i => (i, ("newest " * (i % 4 + 1).toInt).trim + " unk"))
      .toDF("id", "text")
      .withColumn("n_tokens", bpe_token_count($"text", sennrich))
    // count = (i%4 + 1) + 4
    assert(docs.filter($"id" === 3L).head.getAs[Long]("n_tokens") == 8L)
    val kept = graft.llm.Sampling.tokenBudget(
      docs, "id", "n_tokens", budget = 60, shards = 2)
    val total = kept.agg(sum($"n_tokens")).head.getLong(0)
    assert(total <= 60L && total > 0L, s"budget respected: $total")
  }
}
