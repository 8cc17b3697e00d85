package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** WARC container source: framing, gzip member handling, HTTP envelope
  * parsing, loud damage errors, and the write→read round trip. */
class WarcSpec extends SparkSpec {

  private def rec(warcType: String, uri: String, body: Array[Byte],
                  contentType: String = "text/plain",
                  extraHeader: String = ""): Array[Byte] = {
    val head = (s"WARC/1.0\r\nWARC-Type: $warcType\r\n" +
      s"WARC-Record-ID: <urn:uuid:test-$uri>\r\n" +
      "WARC-Date: 2024-01-01T00:00:00Z\r\n" +
      (if (uri != null) s"WARC-Target-URI: $uri\r\n" else "") +
      extraHeader +
      s"Content-Type: $contentType\r\nContent-Length: ${body.length}\r\n\r\n")
      .getBytes(StandardCharsets.ISO_8859_1)
    head ++ body ++ "\r\n\r\n".getBytes(StandardCharsets.ISO_8859_1)
  }

  private def writeFile(dir: String, name: String,
                        bytes: Array[Byte]): String = {
    val p = Paths.get(dir, name)
    Files.write(p, bytes)
    p.toString
  }

  test("round trip: binary payload survives byte-exact through " +
      "member-per-record gzip, warcinfo filtered by type") {
    import spark.implicits._
    val dir = tmpDir("warc_bin_rt")
    // payload includes non-UTF8 bytes, CRLFs and a blank line — framing
    // must come from Content-Length alone
    val payload = Array[Byte](0, 1, -1, 'W', 'A', 'R', 'C', '/', '\r', '\n',
      '\r', '\n', -128, 127)
    val df = Seq(("http://x.test/a", payload)).toDF("uri", "payload")
    val n = WarcSource.write(df, dir, "uri", "payload",
      asHttpResponse = false)
    assert(n == 1)
    val back = WarcSource.read(spark, dir).collect()
    assert(back.map(r => r.getAs[String]("warc_type")).sorted.toSeq ==
      Seq("resource", "warcinfo"))
    val res = back.find(_.getAs[String]("warc_type") == "resource").get
    assert(res.getAs[Array[Byte]]("content").toSeq == payload.toSeq)
    assert(res.getAs[String]("target_uri") == "http://x.test/a")
    // resource records carry no HTTP envelope
    assert(res.isNullAt(res.fieldIndex("http_status")))
  }

  test("plain .warc and member-per-record .warc.gz parse identically; " +
      "a single multi-record gzip stream also parses (CC tolerance)") {
    val dir = tmpDir("warc_gz_modes")
    val r1 = rec("resource", "http://x.test/1",
      "one".getBytes(StandardCharsets.UTF_8))
    val r2 = rec("resource", "http://x.test/2",
      "two".getBytes(StandardCharsets.UTF_8))
    writeFile(dir, "plain.warc", r1 ++ r2)
    val onegz = new java.io.ByteArrayOutputStream()
    val gz = new GZIPOutputStream(onegz)
    gz.write(r1 ++ r2); gz.close()
    val dir2 = tmpDir("warc_gz_modes2")
    writeFile(dir2, "one-stream.warc.gz", onegz.toByteArray)
    val a = WarcSource.read(spark, dir)
      .select("target_uri", "content").collect()
      .map(r => (r.getString(0), new String(r.getAs[Array[Byte]](1),
        StandardCharsets.UTF_8))).sortBy(_._1).toSeq
    val b = WarcSource.read(spark, dir2)
      .select("target_uri", "content").collect()
      .map(r => (r.getString(0), new String(r.getAs[Array[Byte]](1),
        StandardCharsets.UTF_8))).sortBy(_._1).toSeq
    assert(a == Seq("http://x.test/1" -> "one", "http://x.test/2" -> "two"))
    assert(a == b)
  }

  test("HTTP envelope: status/content-type/body split at the first " +
      "blank line; body blank lines preserved; header case-insensitive") {
    val dir = tmpDir("warc_http")
    val body = "first\r\n\r\nsecond".getBytes(StandardCharsets.UTF_8)
    val env = ("HTTP/1.1 404 Not Found\r\ncOnTeNt-TyPe: text/html\r\n" +
      "X-Other: y\r\n\r\n").getBytes(StandardCharsets.ISO_8859_1) ++ body
    writeFile(dir, "f.warc",
      rec("response", "http://x.test/e", env,
        contentType = "application/http; msgtype=response"))
    val r = WarcSource.read(spark, dir).collect().head
    assert(r.getAs[Int]("http_status") == 404)
    assert(r.getAs[String]("http_content_type") == "text/html")
    assert(new String(r.getAs[Array[Byte]]("http_body"),
      StandardCharsets.UTF_8) == "first\r\n\r\nsecond")
  }

  test("malformed HTTP envelope yields NULL http_* with raw content " +
      "intact — a crawl read must not die on one broken response") {
    val dir = tmpDir("warc_http_bad")
    val junk = "not-an-http-message no blank line either"
      .getBytes(StandardCharsets.UTF_8)
    writeFile(dir, "f.warc",
      rec("response", "http://x.test/bad", junk,
        contentType = "application/http; msgtype=response"))
    val r = WarcSource.read(spark, dir).collect().head
    assert(r.isNullAt(r.fieldIndex("http_status")))
    assert(r.isNullAt(r.fieldIndex("http_body")))
    assert(r.getAs[Array[Byte]]("content").toSeq == junk.toSeq)
  }

  test("structural damage is LOUD: truncated content, missing " +
      "Content-Length, non-WARC leading bytes all name file+record") {
    val okBody = "ok".getBytes(StandardCharsets.UTF_8)
    // truncated: Content-Length says 100, file ends early
    val d1 = tmpDir("warc_trunc")
    val full = rec("resource", "http://x.test/t",
      new Array[Byte](100))
    writeFile(d1, "f.warc", full.take(full.length - 60))
    val e1 = intercept[org.apache.spark.SparkException] {
      WarcSource.read(spark, d1).count()
    }
    assert(e1.getMessage.contains("truncated") ||
      Option(e1.getCause).exists(_.getMessage.contains("truncated")))
    // missing Content-Length
    val d2 = tmpDir("warc_nolen")
    writeFile(d2, "f.warc",
      ("WARC/1.0\r\nWARC-Type: resource\r\n\r\n")
        .getBytes(StandardCharsets.ISO_8859_1) ++ okBody)
    val e2 = intercept[Exception] { WarcSource.read(spark, d2).count() }
    assert(e2.getMessage.contains("Content-Length") ||
      Option(e2.getCause).exists(_.getMessage.contains("Content-Length")))
    // garbage where a version line belongs
    val d3 = tmpDir("warc_magic")
    writeFile(d3, "f.warc",
      "HTML is not WARC\r\n".getBytes(StandardCharsets.ISO_8859_1))
    val e3 = intercept[Exception] { WarcSource.read(spark, d3).count() }
    assert(e3.getMessage.contains("WARC/") ||
      Option(e3.getCause).exists(_.getMessage.contains("WARC/")))
  }

  test("bare-LF header lines still parse (lenient CRLF) and " +
      "Connectors factory dispatches *.warc paths") {
    val dir = tmpDir("warc_lf")
    val body = "lf".getBytes(StandardCharsets.UTF_8)
    writeFile(dir, "f.warc",
      ("WARC/1.0\nWARC-Type: resource\nWARC-Target-URI: http://x.test/lf\n" +
        s"Content-Type: text/plain\nContent-Length: ${body.length}\n\n")
        .getBytes(StandardCharsets.ISO_8859_1) ++ body ++
        "\n\n".getBytes(StandardCharsets.ISO_8859_1))
    val viaFactory = Connectors.read(spark, s"$dir/f.warc")
    val r = viaFactory.collect().head
    assert(r.getAs[String]("target_uri") == "http://x.test/lf")
    assert(new String(r.getAs[Array[Byte]]("content"),
      StandardCharsets.UTF_8) == "lf")
  }

  test("WET sidecars parse: conversion records surface as " +
      "(target_uri, text) through readWet and the #wet fragment") {
    val dir = tmpDir("warc_wet")
    val txt = "Extracted page text.\nSecond line."
    val bytes =
      rec("warcinfo", null, "wet-extractor".getBytes(StandardCharsets.UTF_8),
        contentType = "application/warc-fields") ++
      rec("conversion", "http://x.test/page1",
        txt.getBytes(StandardCharsets.UTF_8)) ++
      rec("conversion", "http://x.test/page2",
        "other".getBytes(StandardCharsets.UTF_8))
    val gz = new java.io.ByteArrayOutputStream()
    val g = new GZIPOutputStream(gz); g.write(bytes); g.close()
    writeFile(dir, "crawl.wet.gz", gz.toByteArray)
    val wet = WarcSource.readWet(spark, dir).collect()
      .map(r => (r.getAs[String]("target_uri"), r.getAs[String]("text")))
      .sortBy(_._1)
    assert(wet.toSeq == Seq("http://x.test/page1" -> txt,
      "http://x.test/page2" -> "other"))
    val viaFrag = Connectors.read(spark, s"$dir/crawl.wet.gz#wet")
    assert(viaFrag.columns.toSeq ==
      Seq("file", "record_id", "target_uri", "warc_date", "text"))
    assert(viaFrag.count() == 2)
    // a DIRECTORY of shards has no extension to dispatch on — the
    // sourceType option covers it (the curation-YAML crawl-dir shape)
    val viaDir = Connectors.read(spark, s"$dir#wet",
      Map("sourceType" -> "warc"))
    assert(viaDir.count() == 2)
  }

  test(".warc.zst parses — single frame AND frame-per-record " +
      "(continuous mode), byte-identical to the gzip read") {
    val r1 = rec("resource", "http://x.test/z1",
      "zstd one".getBytes(StandardCharsets.UTF_8))
    val r2 = rec("resource", "http://x.test/z2",
      "zstd two".getBytes(StandardCharsets.UTF_8))
    // one stream
    val d1 = tmpDir("warc_zst1")
    writeFile(d1, "one.warc.zst",
      com.github.luben.zstd.Zstd.compress(r1 ++ r2))
    // frame per record (the member-per-record analogue)
    val d2 = tmpDir("warc_zst2")
    writeFile(d2, "per-rec.warc.zst",
      com.github.luben.zstd.Zstd.compress(r1) ++
        com.github.luben.zstd.Zstd.compress(r2))
    for (d <- Seq(d1, d2)) {
      val got = WarcSource.read(spark, d)
        .select("target_uri", "content").collect()
        .map(r => (r.getString(0), new String(r.getAs[Array[Byte]](1),
          StandardCharsets.UTF_8))).sortBy(_._1).toSeq
      assert(got == Seq("http://x.test/z1" -> "zstd one",
        "http://x.test/z2" -> "zstd two"), s"dir $d")
    }
  }

  test("http_headers carries the FULL lowercased envelope map; " +
      "X-Robots-Tag surfaces through readText/#text as x_robots, and " +
      "repeated headers comma-fold") {
    val dir = tmpDir("warc_xrobots")
    val body = "page body".getBytes(StandardCharsets.UTF_8)
    val env = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
      "X-Robots-Tag: noai\r\nX-ROBOTS-TAG: noindex\r\n\r\n")
      .getBytes(StandardCharsets.ISO_8859_1) ++ body
    writeFile(dir, "f.warc",
      rec("response", "http://x.test/r", env,
        contentType = "application/http; msgtype=response"))
    val full = WarcSource.read(spark, dir).collect().head
    val hm = full.getMap[String, String](full.fieldIndex("http_headers"))
    assert(hm("x-robots-tag") == "noai, noindex")
    assert(hm("content-type") == "text/html")
    val t = Connectors.read(spark, s"$dir/f.warc#text").collect().head
    assert(t.getAs[String]("x_robots") == "noai, noindex")
    assert(t.getAs[String]("text") == "page body")
  }

  test("readText: responses decode the envelope body, conversions the " +
      "content, and a MALFORMED response gets NULL text (its bytes " +
      "are not a document)") {
    val dir = tmpDir("warc_readtext")
    val goodEnv = ("HTTP/1.1 200 OK\r\n\r\n")
      .getBytes(StandardCharsets.ISO_8859_1) ++
      "good".getBytes(StandardCharsets.UTF_8)
    writeFile(dir, "f.warc",
      rec("response", "http://x.test/good", goodEnv,
        contentType = "application/http; msgtype=response") ++
      rec("conversion", "http://x.test/conv",
        "conv text".getBytes(StandardCharsets.UTF_8)) ++
      rec("response", "http://x.test/broken",
        "no envelope here".getBytes(StandardCharsets.UTF_8),
        contentType = "application/http; msgtype=response") ++
      rec("metadata", "http://x.test/meta",
        "{}".getBytes(StandardCharsets.UTF_8)))
    val got = WarcSource.readText(spark, dir).collect()
      .map(r => (r.getAs[String]("target_uri"), r.getAs[String]("text")))
      .toMap
    assert(got == Map(
      "http://x.test/good" -> "good",
      "http://x.test/conv" -> "conv text",
      "http://x.test/broken" -> null)) // metadata records filtered out
  }

  test("WAT outlink extraction: Links arrays explode per page, extra " +
      "JSON fields are ignored, and records WITHOUT links contribute " +
      "no rows (no nulls, no crash)") {
    val dir = tmpDir("warc_wat")
    def wat(uri: String, json: String) =
      rec("metadata", uri, json.getBytes(StandardCharsets.UTF_8),
        contentType = "application/json")
    val withLinks =
      """{"Container":{"Filename":"x"},"Envelope":{"Payload-Metadata":
        |{"Actual-Content-Type":"application/http",
        |"HTTP-Response-Metadata":{"HTML-Metadata":{
        |"Head":{"Title":"t"},
        |"Links":[{"path":"A@/href","url":"http://a.test/1"},
        |{"url":"http://b.test/2"}]}}}}}""".stripMargin.replace("\n", "")
    val noLinks =
      """{"Envelope":{"Payload-Metadata":{"HTTP-Response-Metadata":
        |{"HTML-Metadata":{"Head":{"Title":"no links"}}}}}}"""
        .stripMargin.replace("\n", "")
    writeFile(dir, "f.wat",
      wat("http://src.test/p1", withLinks) ++
        wat("http://src.test/p2", noLinks) ++
        rec("conversion", "http://src.test/p3",
          "not metadata".getBytes(StandardCharsets.UTF_8)))
    val got = WarcSource.readWatLinks(spark, dir)
      .select("target_uri", "link_url").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(
      ("http://src.test/p1", "http://a.test/1"),
      ("http://src.test/p1", "http://b.test/2")), s"got $got")
  }

  test("revisit records surface refers_to + payload_digest; readText " +
      "drops them (headers, not documents) so a revisit-marked " +
      "re-crawl leaves incremental ingest WITHOUT content hashing; " +
      "revisitHints carries the resolve pointer") {
    val dir = tmpDir("warc_revisit")
    // the day-2 crawl shape Common Crawl emits: one genuinely new page
    // + one revisit of a day-1 capture (no payload — just the original
    // record pointer and the digest the crawler already computed)
    val bytes =
      rec("response", "http://x.test/new",
        ("HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n" +
          "fresh content").getBytes(StandardCharsets.ISO_8859_1),
        contentType = "application/http; msgtype=response") ++
      rec("revisit", "http://x.test/seen", Array.emptyByteArray,
        contentType = "application/http; msgtype=response",
        extraHeader = "WARC-Refers-To: <urn:uuid:day1-original>\r\n" +
          "WARC-Payload-Digest: " +
          "sha1:3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ\r\n" +
          "WARC-Profile: http://netpreserve.org/warc/1.0/revisit/" +
          "identical-payload-digest\r\n")
    writeFile(dir, "day2.warc", bytes)
    val crawl = WarcSource.read(spark, dir)
    val byType = crawl.collect()
      .map(r => r.getAs[String]("warc_type") ->
        ((r.getAs[String]("refers_to"), r.getAs[String]("payload_digest"))))
      .toMap
    assert(byType("revisit") == (("<urn:uuid:day1-original>",
      "sha1:3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ")))
    assert(byType("response") == (("", ""))) // absent headers → empty
    // incremental ingest: the text frame contains ONLY the new page —
    // the revisit never reaches a dedup stage, no bytes hashed
    val texts = WarcSource.readText(spark, dir)
      .select("target_uri", "text").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(texts == Set(("http://x.test/new", "fresh content")),
      s"got $texts")
    // the resolve path: hints address the dropped re-crawl precisely
    val hints = WarcSource.revisitHints(crawl)
      .select("target_uri", "refers_to", "payload_digest").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(hints == Seq(("http://x.test/seen", "<urn:uuid:day1-original>",
      "sha1:3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ")))
  }

  test("resolveRevisits recovers a revisit-marked re-crawl's text from " +
      "the ORIGINAL archive via its CDX index — one URI join + point " +
      "fetch pinned on the refers_to record id, no content re-hash") {
    import spark.implicits._
    val day1 = tmpDir("warc_day1_archive")
    WarcSource.write(Seq(
        ("http://x.test/seen", "day-one body of the seen page"),
        ("http://x.test/other", "unrelated page"))
        .toDF("uri", "payload"),
      day1, "uri", "payload", cdxIndex = true)
    // the original record ids — what a real crawler carries into
    // WARC-Refers-To when it marks the day-2 fetch as a revisit
    val origIds = WarcSource.read(spark, day1)
      .filter(col("warc_type") === "response")
      .select("target_uri", "record_id").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val day2 = tmpDir("warc_day2_crawl")
    writeFile(day2, "day2.warc",
      rec("response", "http://x.test/new",
        ("HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\nfresh")
          .getBytes(StandardCharsets.ISO_8859_1),
        contentType = "application/http; msgtype=response") ++
      rec("revisit", "http://x.test/seen", Array.emptyByteArray,
        contentType = "application/http; msgtype=response",
        extraHeader =
          s"WARC-Refers-To: ${origIds("http://x.test/seen")}\r\n" +
          "WARC-Payload-Digest: sha1:AAA\r\n"))
    val hints = WarcSource.revisitHints(WarcSource.read(spark, day2))
    val resolved = CdxIndex.resolveRevisits(spark, day1, hints)
      .select("target_uri", "refers_to", "text").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(resolved == Seq(("http://x.test/seen",
      origIds("http://x.test/seen"), "day-one body of the seen page")),
      s"got $resolved")
    // a dangling pointer (record id not in the archive) drops, audited
    // by the count difference
    val dangling = hints.withColumn("refers_to", lit("<urn:uuid:gone>"))
    assert(CdxIndex.resolveRevisits(spark, day1, dangling).count() == 0)
  }

  test("resolveRevisits size guard: hints under the row bound broadcast, " +
      "over it the join back runs shuffled (no driver-side ceiling) — " +
      "same results either way (the r17 scale flag)") {
    import spark.implicits._
    val day1 = tmpDir("warc_guard_day1")
    WarcSource.write(Seq(
        ("http://g.test/a", "alpha body"), ("http://g.test/b", "beta body"))
        .toDF("uri", "payload"),
      day1, "uri", "payload", cdxIndex = true)
    val origIds = WarcSource.read(spark, day1)
      .filter(col("warc_type") === "response")
      .select("target_uri", "record_id").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val hints = Seq(
      ("<urn:uuid:rev-a>", "http://g.test/a", "2026-01-02T00:00:00Z",
        origIds("http://g.test/a"), "sha1:AAA"),
      ("<urn:uuid:rev-b>", "http://g.test/b", "2026-01-02T00:00:00Z",
        origIds("http://g.test/b"), "sha1:BBB"))
      .toDF("record_id", "target_uri", "warc_date", "refers_to",
        "payload_digest")
    def hinted(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.optimizedPlan.toString
    // under the bound (default 1M): the join back carries the
    // broadcast hint
    val small = CdxIndex.resolveRevisits(spark, day1, hints)
    assert(hinted(small).contains("broadcast"),
      s"expected a broadcast hint in:\n${hinted(small)}")
    val smallRows = small.select("revisit_record_id", "refers_to", "text")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSet
    // over the bound (forced via the session conf): NO broadcast hint
    // anywhere in the plan — the equi-join shuffles, AQE picks the
    // physical strategy — and the results are identical
    spark.conf.set("graft.cdx.broadcastRowBound", "0")
    try {
      val big = CdxIndex.resolveRevisits(spark, day1, hints)
      assert(!hinted(big).contains("broadcast"),
        s"guarded path must not broadcast:\n${hinted(big)}")
      val bigRows = big.select("revisit_record_id", "refers_to", "text")
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
        .toSet
      assert(bigRows == smallRows && bigRows.size == 2, s"got $bigRows")
      // the guarded lookup leg returns the same records too
      val looked = CdxIndex.lookup(spark, day1,
        Seq("http://g.test/a").toDF("uri"))
      assert(looked.select("target_uri").collect()
        .map(_.getString(0)).toSeq == Seq("http://g.test/a"))
    } finally spark.conf.unset("graft.cdx.broadcastRowBound")
  }

  test("multi-archive lookup/resolve: a week of day archives composes " +
      "by sidecar-list union — originals split across days both " +
      "resolve, and lookupHost unions the days' records") {
    import spark.implicits._
    val dayA = tmpDir("warc_multi_dayA")
    val dayB = tmpDir("warc_multi_dayB")
    WarcSource.write(Seq(("http://m.test/a", "day A body"))
      .toDF("uri", "payload"), dayA, "uri", "payload", cdxIndex = true)
    WarcSource.write(Seq(("http://m.test/b", "day B body"))
      .toDF("uri", "payload"), dayB, "uri", "payload", cdxIndex = true)
    def ids(d: String) = WarcSource.read(spark, d)
      .filter(col("warc_type") === "response")
      .select("target_uri", "record_id").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val origIds = ids(dayA) ++ ids(dayB)
    val hints = Seq(
      ("<urn:uuid:rev-a>", "http://m.test/a", "2026-01-08T00:00:00Z",
        origIds("http://m.test/a"), "sha1:AAA"),
      ("<urn:uuid:rev-b>", "http://m.test/b", "2026-01-08T00:00:00Z",
        origIds("http://m.test/b"), "sha1:BBB"))
      .toDF("record_id", "target_uri", "warc_date", "refers_to",
        "payload_digest")
    val resolved = CdxIndex.resolveRevisits(spark, Seq(dayA, dayB), hints)
      .select("target_uri", "text").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(resolved == Map("http://m.test/a" -> "day A body",
      "http://m.test/b" -> "day B body"), s"got $resolved")
    // host lookup over the union sees both days' captures
    val host = CdxIndex.lookupHost(spark, Seq(dayA, dayB), "m.test")
      .select("target_uri").collect().map(_.getString(0)).toSet
    assert(host == Set("http://m.test/a", "http://m.test/b"))
    // an empty path list is loud, not an empty union
    intercept[graft.core.GraftError.Configuration](
      CdxIndex.read(spark, Seq.empty[String]).count())
  }

  test("record ids are globally unique even when one URI repeats in a " +
      "batch (re-crawl), and stay deterministic across re-runs") {
    import spark.implicits._
    val df = Seq(("http://x.test/same", "crawl one"),
      ("http://x.test/same", "crawl two")).toDF("uri", "payload")
      .repartition(1)
    val d1 = tmpDir("warc_uniq1"); val d2 = tmpDir("warc_uniq2")
    WarcSource.write(df, d1, "uri", "payload")
    WarcSource.write(df, d2, "uri", "payload")
    val ids1 = WarcSource.read(spark, d1).select("record_id")
      .collect().map(_.getString(0)).sorted
    assert(ids1.distinct.length == 3, s"dup record ids: ${ids1.toSeq}")
    val ids2 = WarcSource.read(spark, d2).select("record_id")
      .collect().map(_.getString(0)).sorted
    assert(ids1.toSeq == ids2.toSeq, "re-run must be deterministic")
    // no temp litter from the rename commit
    assert(!Files.list(Paths.get(d1)).toArray.map(_.toString)
      .exists(_.contains("_tmp-")))
  }

  test("writer is deterministic: two writes of the same rows produce " +
      "byte-identical files (stable record ids, stable date)") {
    import spark.implicits._
    val df = Seq(("http://x.test/d", "same text")).toDF("uri", "payload")
      .repartition(1)
    val d1 = tmpDir("warc_det1"); val d2 = tmpDir("warc_det2")
    WarcSource.write(df, d1, "uri", "payload")
    WarcSource.write(df, d2, "uri", "payload")
    val f1 = Files.readAllBytes(Paths.get(d1, "part-00000.warc.gz"))
    val f2 = Files.readAllBytes(Paths.get(d2, "part-00000.warc.gz"))
    assert(f1.toSeq == f2.toSeq)
  }

  test("string payloads UTF-8 encode; multi-partition write shards " +
      "one file per non-empty partition and read unions them") {
    import spark.implicits._
    val rows = (0 until 20).map(i => (s"http://x.test/$i", s"body $i"))
    val df = rows.toDF("uri", "payload").repartition(4)
    val dir = tmpDir("warc_shards")
    val n = WarcSource.write(df, dir, "uri", "payload")
    assert(n == 20)
    val back = WarcSource.read(spark, dir)
      .filter(col("warc_type") === "response")
      .select("target_uri", "http_body", "http_status").collect()
      .map(r => (r.getString(0),
        new String(r.getAs[Array[Byte]](1), StandardCharsets.UTF_8),
        r.getInt(2))).sortBy(_._1)
    assert(back.length == 20)
    assert(back.forall(_._3 == 200))
    assert(back.map { case (u, b, _) => (u, b) }.toMap == rows.toMap)
  }
}
