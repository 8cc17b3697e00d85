package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.ConsentExprs

/** Crawl-layer consent: RFC 9309 robots.txt evaluation (group
  * selection, wildcard rules, precedence), X-Robots-Tag / meta-robots
  * directive flags, and the fromCrawl broadcast-join composition. */
class ConsentSpec extends SparkSpec {

  // ------------------- RFC 9309 evaluator (pure) ----------------------

  private val robots =
    """# example robots.txt
      |User-agent: *
      |Disallow: /private/
      |Allow: /private/public-bit
      |
      |User-agent: ccbot
      |Disallow: /no-cc/
      |
      |User-agent: strictbot
      |Disallow: /
      |""".stripMargin

  test("group selection: the longest matching agent group wins over " +
      "*; agents with no specific group fall back to *") {
    // ccbot has its own group: * rules do NOT apply to it (RFC 9309
    // groups are exclusive, not additive)
    assert(ConsentExprs.disallowed(robots, "/no-cc/x", "CCBot/2.0"))
    assert(!ConsentExprs.disallowed(robots, "/private/x", "CCBot/2.0"))
    // unknown agent → * group
    assert(ConsentExprs.disallowed(robots, "/private/x", "otherbot"))
    assert(!ConsentExprs.disallowed(robots, "/open", "otherbot"))
    // strictbot: everything disallowed
    assert(ConsentExprs.disallowed(robots, "/anything", "strictbot"))
  }

  test("precedence: longest matching rule wins; Allow wins ties; " +
      "empty Disallow allows everything") {
    // Allow /private/public-bit (19) beats Disallow /private/ (9)
    assert(!ConsentExprs.disallowed(robots, "/private/public-bit/a",
      "otherbot"))
    assert(ConsentExprs.disallowed(
      "User-agent: *\nDisallow: /a\nAllow: /b", "/a/x", "bot"))
    // equal length: allow wins
    assert(!ConsentExprs.disallowed(
      "User-agent: *\nDisallow: /ab\nAllow: /ab", "/ab/x", "bot"))
    assert(!ConsentExprs.disallowed(
      "User-agent: *\nDisallow:", "/anything", "bot"))
  }

  test("rule wildcards: * matches any sequence, trailing $ anchors " +
      "the end; matching is a path-prefix check otherwise") {
    val r = "User-agent: *\nDisallow: /*.pdf$\nDisallow: /tmp/*/x"
    assert(ConsentExprs.disallowed(r, "/docs/report.pdf", "bot"))
    assert(!ConsentExprs.disallowed(r, "/docs/report.pdfx", "bot"))
    assert(!ConsentExprs.disallowed(r, "/docs/report.pdf.html", "bot"))
    assert(ConsentExprs.disallowed(r, "/tmp/a/x", "bot"))
    assert(ConsentExprs.disallowed(r, "/tmp/a/b/x-tail", "bot"))
    assert(!ConsentExprs.disallowed(r, "/tmp/x", "bot"))
  }

  test("query strings: RFC 9309 §2.2.2 matches path + query — rules " +
      "targeting ? parameters evaluate against the full path?query") {
    val r = "User-agent: *\nDisallow: /*?print=\nDisallow: /cart?*sess"
    assert(ConsentExprs.disallowed(r, "/article/1?print=1", "bot"))
    assert(!ConsentExprs.disallowed(r, "/article/1", "bot"))
    assert(ConsentExprs.disallowed(r, "/cart?id=1&sess=abc", "bot"))
    assert(!ConsentExprs.disallowed(r, "/cart", "bot"))
    // a literal ? in the rule is a literal character, not a wildcard
    assert(!ConsentExprs.disallowed(r, "/cart-page/sess", "bot"))
  }

  test("same-agent groups merge; comments strip; field names are " +
      "case-insensitive; no robots/no group → allowed") {
    val r = "USER-AGENT: ccbot # our friend\nDisallow: /a\n\n" +
      "User-Agent: ccbot\nDISALLOW: /b # and this\n"
    assert(ConsentExprs.disallowed(r, "/a/1", "ccbot"))
    assert(ConsentExprs.disallowed(r, "/b/1", "ccbot"))
    assert(!ConsentExprs.disallowed(r, "/c/1", "ccbot"))
    // no group addresses this agent at all (and no *): allowed
    assert(!ConsentExprs.disallowed(r, "/a/1", "otherbot"))
    assert(!ConsentExprs.disallowed("", "/a", "bot"))
  }

  test("the expression survives whole-stage codegen and treats NULL " +
      "robots (host had none) as ALLOWED, not NULL") {
    import spark.implicits._
    val df = Seq(
      ("User-agent: *\nDisallow: /x", "/x/1"),
      ("User-agent: *\nDisallow: /x", "/y/1"),
      (null: String, "/x/1")).toDF("robots", "path")
    val got = df.select(ConsentExprs.robotsDisallowed(
      col("robots"), col("path"), "bot").as("d")).collect().map(_.getBoolean(0))
    assert(got.toSeq == Seq(true, false, false))
  }

  // ------------------- fromCrawl composition --------------------------

  test("fromCrawl: robots.txt records gate same-host documents " +
      "(broadcast join), X-Robots-Tag and meta-robots flags merge " +
      "into consent_ok") {
    import spark.implicits._
    val dir = tmpDir("consent_crawl")
    val docs = Seq(
      // host a: robots disallows /blocked/
      ("http://a.test/blocked/1", "plain page", null: String),
      ("http://a.test/open/2", "plain page", null),
      // host b: no robots.txt in the crawl
      ("http://b.test/anything/3", "plain page", null),
      // x-robots objection on an otherwise-allowed page
      ("http://a.test/open/4", "plain page", "X-Robots-Tag: noai"),
      // meta objection in the body
      ("http://a.test/open/5",
        "<meta name=\"robots\" content=\"noai\">page", null),
      // prose mention must NOT flag
      ("http://a.test/open/6", "we discuss noai in prose", null),
      // query-string rule: RFC 9309 matches path + query
      ("http://a.test/open/7?print=1", "printable view", null))
      .toDF("uri", "payload", "hdrs")
    val robotsRows = Seq(
      ("http://a.test/robots.txt",
        "User-agent: *\nDisallow: /blocked/\nDisallow: /*?print=",
        null: String)).toDF("uri", "payload", "hdrs")
    graft.sources.WarcSource.write(docs.union(robotsRows), dir,
      "uri", "payload", extraHttpHeadersCol = "hdrs")
    val crawl = graft.sources.WarcSource.read(spark, dir)
    val out = Consent.fromCrawl(crawl, "ccbot")
    // plan pin: the robots join must be a broadcast, never a shuffle
    assert(out.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"), "robots join must broadcast")
    val m = out.select(col("target_uri"), col("robots_disallowed"),
      col("xrobots_noai"), col("meta_noai"), col("consent_ok"))
      .collect().map(r => r.getString(0) ->
        ((r.getBoolean(1), r.getBoolean(2), r.getBoolean(3),
          r.getBoolean(4)))).toMap
    assert(m.size == 7) // robots.txt row itself excluded
    assert(m("http://a.test/blocked/1") == ((true, false, false, false)))
    assert(m("http://a.test/open/2") == ((false, false, false, true)))
    assert(m("http://b.test/anything/3") == ((false, false, false, true)))
    assert(m("http://a.test/open/4") == ((false, true, false, false)))
    assert(m("http://a.test/open/5") == ((false, false, true, false)))
    assert(m("http://a.test/open/6") == ((false, false, false, true)))
    // the ?print= rule fires on path + query (same path allows above)
    assert(m("http://a.test/open/7?print=1") == ((true, false, false, false)))
  }

  test("consent stage streams: batch/stream parity over x_robots + " +
      "meta objections (per-row, no state)") {
    import spark.implicits._
    val scratch = tmpDir("consent_stream")
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val rows = Seq(
      (1L, "<meta name='robots' content='noai'>page one", null: String, ts0),
      (2L, "clean page two body", "noai", ts0),
      (3L, "clean page three body", null, ts0),
      (4L, "prose about noai only", null, ts0))
    rows.toDF("doc_id", "text", "x_robots", "ts")
      .coalesce(1).write.mode("overwrite").parquet(scratch)
    val cfg = Curation.PipelineConfig(consent = true,
      maxDupWordFrac = 0.9, maxDupNgramFrac = 0.9, maxTopNgramFrac = 0.9)
    val in = spark.readStream
      .schema(spark.read.parquet(scratch).schema).parquet(scratch)
    val q = Curation.pipelineStream(in, "doc_id", "text", "ts", cfg = cfg)
      .writeStream.format("memory").queryName("consent_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000L)
    val streamed = spark.table("consent_stream")
      .select($"doc_id").as[Long].collect().toSet
    val batch = Curation.pipeline(
        spark.read.parquet(scratch).select($"doc_id", $"text", $"x_robots"),
        "doc_id", "text", cfg)
      .select($"doc_id").as[Long].collect().toSet
    assert(streamed == Set(3L, 4L) && streamed == batch,
      s"stream $streamed vs batch $batch")
  }

  test("Consent.keep drives the curation `consent:` stage: meta and " +
      "x_robots objections drop, prose survives; honorNoindex extends") {
    import spark.implicits._
    val df = Seq(
      (1L, "<meta name='robots' content='noai'>page", null: String),
      (2L, "clean page two", "noai"),
      (3L, "clean page three", "noindex, nofollow"),
      (4L, "prose about noai", null),
      (5L, "clean page five", null)).toDF("doc_id", "text", "x_robots")
    val kept = Curation.pipeline(df, "doc_id", "text",
      Curation.PipelineConfig(consent = true,
        maxDupWordFrac = 1.0, maxDupNgramFrac = 1.0, maxTopNgramFrac = 1.0))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L, 4L, 5L)) // noindex NOT honored by default
    val keptStrict = df.where(Consent.keep(df, "text", honorNoindex = true))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptStrict == Set(4L, 5L))
  }
}
