package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Image-text pair mining + meta-robots opt-out flags: extraction
  * edges, the alt-length floor, the documented `>`-in-attribute miss,
  * consent-token word boundaries. */
class ImageTextSpec extends SparkSpec {

  test("extract: per-tag rows with 0-based positions, NULL absent/empty " +
      "attrs, imageless docs vanish, <imgx is not an img tag") {
    import spark.implicits._
    val docs = Seq(
      (1L, """a <img src="u1" alt="cap one"> b <img alt="" src='u2'> c"""),
      (2L, "no images here"),
      (3L, """<imgx src="not-a-tag"> <img src="u3">""")).toDF("id", "html")
    val rows = ImageText.extract(docs, "id", "html")
      .collect().map(r => (r.getLong(0), r.getInt(1),
        Option(r.getString(2)), Option(r.getString(3)))).toSet
    assert(rows == Set(
      (1L, 0, Some("u1"), Some("cap one")),
      (1L, 1, Some("u2"), None), // empty alt normalizes to NULL
      (3L, 0, Some("u3"), None)))
  }

  test("pairs: url-present + alt-length floor (codepoints); the floor " +
      "is configurable; caption-less pages contribute nothing") {
    import spark.implicits._
    val docs = Seq(
      (1L, """<img src="u1" alt="a fine caption">"""),
      (2L, """<img src="u2" alt="ok">"""), // 2 < 5
      (3L, """<img alt="orphan caption with no source">""")).toDF("id", "html")
    assert(ImageText.pairs(docs, "id", "html").select("id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(ImageText.pairs(docs, "id", "html", minAltChars = 2)
      .count() == 2)
  }

  test("documented caveat: a literal '>' inside an attribute value ends " +
      "the tag match early — a MISS, never a wrong pair") {
    import spark.implicits._
    val docs = Seq(
      (1L, """<img alt="5 > 4 arrow" src="u1">""")).toDF("id", "html")
    val out = ImageText.pairs(docs, "id", "html").collect()
    assert(out.isEmpty, "truncated tag must not produce a pair")
  }

  test("pageMeta: both attribute orders, first title wins (non-greedy), " +
      "absent/empty fields NULL, single-quoted values are the documented " +
      "miss") {
    import spark.implicits._
    val docs = Seq(
      (1L, "<html lang=\"en\"><title>T1</title><title>T2</title>" +
        "<meta content=\"desc rev\" name=\"description\">" +
        "<link href=\"https://c.ex/1\" rel=\"canonical\">"),
      (2L, "<meta property=\"og:image\" content=\"https://i.ex/2.png\">" +
        "<meta property=\"og:title\" content=\"OT\">"),
      (3L, "no tags at all"),
      (4L, "<title></title><html lang=''>")).toDF("id", "html")
    val out = TextAnalysis.pageMeta(docs, "html")
      .select("id", "page_title", "meta_description", "canonical_url",
        "og_title", "og_image", "html_lang")
      .collect().map(r => r.getLong(0) ->
        (1 to 6).map(i => Option(r.getString(i)))).toMap
    assert(out(1L) == Seq(Some("T1"), Some("desc rev"),
      Some("https://c.ex/1"), None, None, Some("en")))
    assert(out(2L) == Seq(None, None, None, Some("OT"),
      Some("https://i.ex/2.png"), None))
    assert(out(3L).forall(_.isEmpty))
    assert(out(4L).forall(_.isEmpty), "empty and single-quoted are NULL")
  }

  test("optOutFlags: tokens flag only inside meta content attributes " +
      "(either quote style), word-bounded, case-insensitive") {
    import spark.implicits._
    val docs = Seq(
      (1L, """<meta name="robots" content="noai, noimageai">"""),
      (2L, "<META NAME='robots' CONTENT='NOINDEX'>"),
      (3L, "prose saying noai and noindex without any meta tag"),
      (4L, """<meta property="og:title" content="paranoia inc">"""),
      (5L, """<meta name="robots" content="noimageai">""")).toDF("id", "html")
    val out = TextAnalysis.optOutFlags(docs, "html")
      .select("id", "noai", "noimageai", "noindex")
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getBoolean(2), r.getBoolean(3)))).toMap
    assert(out(1L) == ((true, true, false)))
    assert(out(2L) == ((false, false, true)))
    assert(out(3L) == ((false, false, false)), "prose must not flag")
    assert(out(4L) == ((false, false, false)), "'paranoia' must not flag")
    // noimageai alone: the noai word boundary holds (no substring hit)
    assert(out(5L) == ((false, true, false)))
  }
}
