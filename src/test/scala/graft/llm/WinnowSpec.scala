package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private val k = 10
  private val w = 6

  private def fps(docs: Seq[(Long, String)]) =
    Indexing.winnowIndex(docs.toDF("id", "text"), "id", "text", k, w)
      .as[(Long, Int, Long)].collect().toSeq

  test("the winnowing guarantee: a shared substring of length >= " +
      "w + k - 1 shares a fingerprint at ANY alignment (shift-invariant)") {
    val shared = "abcdefghijklmnopqrstuvwxyz0123456789ABCD" // 40 >= 15
    // different, unshared contexts at DIFFERENT offsets — a strided
    // window detector would need aligned offsets; winnowing must not
    val a = s"xq $shared zz tail one"
    val b = s"completely different preamble !! $shared end"
    val fa = fps(Seq(1L -> a)).map(_._3).toSet
    val fb = fps(Seq(2L -> b)).map(_._3).toSet
    assert((fa intersect fb).nonEmpty,
      "shared >= w+k-1 substring must share at least one fingerprint")
    // density: selections ≈ 2/(w+1) of grams — allow generous slack
    val nGramsA = a.length - k + 1
    val selA = fps(Seq(1L -> a)).size
    assert(selA <= nGramsA / 2 && selA >= nGramsA / (2 * (w + 1)),
      s"density off: $selA of $nGramsA grams")
  }

  test("short-doc rule, sub-k text, and determinism") {
    // fewer than w grams → exactly ONE selection
    val short = "abcdefghijkl" // 12 chars → 3 grams < w
    assert(fps(Seq(1L -> short)).size == 1)
    // below k chars → no fingerprints
    assert(fps(Seq(1L -> "tiny")).isEmpty)
    // deterministic across runs
    val d = Seq(5L -> "some moderately sized document body for winnowing")
    assert(fps(d) == fps(d))
  }

  test("matchPairs: planted shared passage pairs up; hot fingerprint " +
      "cap drops boilerplate buckets") {
    val passage = "the quick brown fox jumps over the lazy dog again"
    val docs = Seq(
      1L -> s"alpha $passage beta",
      2L -> s"gamma delta $passage",
      3L -> "entirely unrelated content with no overlap at all here")
    val pairs = Indexing.winnowMatchPairs(docs.toDF("id", "text"),
        "id", "text", k, w, minShared = 1)
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)) == Seq((1L, 2L)),
      s"only the passage-sharing pair: $pairs")
    assert(pairs.head._3 >= 1)
    // boilerplate guard: the same passage in MANY docs → its
    // fingerprints exceed the cap and those buckets drop
    val many = (1L to 8L).map(i => i -> s"d$i $passage")
    val capped = Indexing.winnowMatchPairs(many.toDF("id", "text"),
      "id", "text", k, w, minShared = 1, maxDocsPerFp = 4)
    assert(capped.count() == 0,
      "hot fingerprints past the cap must poison their buckets")
    // a non-integral id would cast to NULL and collapse every doc onto
    // one pair key — loud error instead (r11 ADVICE)
    val err = intercept[IllegalArgumentException](Indexing.winnowMatchPairs(
      docs.map { case (i, t) => (s"doc-$i", t) }.toDF("id", "text"),
      "id", "text", k, w))
    assert(err.getMessage.contains("integral id"), err.getMessage)
  }
}
