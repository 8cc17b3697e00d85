package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ConsentExprs

/** Crawl-layer consent — the signals a compliant training-data
  * pipeline honors BEFORE any content-level curation, derived from the
  * crawl frame itself (r14 directive #4):
  *
  *  1. **robots.txt** records present in the crawl (a polite crawler
  *     fetches and archives them): evaluated per RFC 9309 for a named
  *     agent ([[graft.functions.ConsentExprs]] — longest-match groups,
  *     `*`/`$` rule wildcards, allow-wins-ties).
  *  2. **`X-Robots-Tag` HTTP headers** on the response envelope
  *     (surfaced by `WarcSource` as `http_headers`): `noai` /
  *     `noimageai` / `noindex` directive tokens.
  *  3. **`<meta name="robots">` page directives** in the HTML body —
  *     the same word-bounded token match as
  *     [[TextAnalysis.optOutFlags]], so prose mentioning "noai" never
  *     flags.
  *
  * Scale design: robots bodies are per-HOST — a 100 TB crawl has at
  * most one robots.txt per (host, fetch), millions of rows against
  * billions of documents — so the join is a BROADCAST of the
  * host→robots table (first-fetch-wins dedup is one narrow
  * keys-plus-body shuffle on host). Everything else is per-row
  * codegen'd projection; no corpus-sized shuffle anywhere. */
object Consent {

  /** The X-Robots-Tag / meta-robots directive flag: a word-bounded
    * token inside the (comma-separated) directive list. */
  private def directiveFlag(c: Column, token: String): Column =
    coalesce(lower(c).rlike(s"(^|[\\s,:])$token($$|[\\s,])"), lit(false))

  /** Per-document consent flags from a crawl frame (the
    * [[graft.sources.WarcSource.read]] shape). Returns one row per
    * content record (responses + conversions, robots.txt rows
    * excluded) with:
    *
    *  - `robots_disallowed` — RFC 9309 verdict for `agent` against the
    *    host's archived robots.txt (false when the crawl has none),
    *    matched against path + `?` + query per §2.2.2 ("the path and
    *    query portion of the URI") so rules targeting query strings
    *    (`Disallow: /page*?session=`) evaluate correctly;
    *  - `xrobots_noai` / `xrobots_noindex` — X-Robots-Tag directives;
    *  - `meta_noai` / `meta_noindex` — page `<meta>` directives (only
    *    evaluated when the record's body decodes; NULL-safe false);
    *  - `consent_ok` — the roll-up: none of the above objected.
    *
    * Keyed by `target_uri` with the original record columns kept, so
    * the result joins back to any downstream frame. */
  def fromCrawl(warc: DataFrame, agent: String): DataFrame = {
    val isRobots = col("target_uri").rlike("(?i)^[a-z][a-z0-9+.-]*://[^/]+/robots\\.txt$")
    // one robots body per host: first fetch wins deterministically
    // (min by record id) — a re-crawled robots.txt must not fan out
    // the broadcast join
    val robots = warc
      .filter(isRobots)
      .select(lower(parse_url(col("target_uri"), lit("HOST"))).as("host"),
        col("record_id"),
        decode(coalesce(col("http_body"), col("content")), "UTF-8")
          .as("robots_txt"))
      .groupBy(col("host"))
      .agg(min_by(col("robots_txt"), col("record_id")).as("robots_txt"))
    val docs = warc
      .filter(col("warc_type").isin("response", "conversion") && !isRobots)
      .withColumn("host", lower(parse_url(col("target_uri"), lit("HOST"))))
    val body = when(col("warc_type") === "response",
      decode(col("http_body"), "UTF-8"))
      .otherwise(decode(col("content"), "UTF-8"))
    val xrobots = element_at(col("http_headers"), "x-robots-tag")
    def metaFlag(token: String): Column = {
      val dq = s"""(?i)<meta\\b[^>]*content\\s*=\\s*"[^"]*\\b$token\\b[^"]*""""
      val sq = s"(?i)<meta\\b[^>]*content\\s*=\\s*'[^']*\\b$token\\b[^']*'"
      coalesce(body.rlike(dq) || body.rlike(sq), lit(false))
    }
    val out = docs
      .join(broadcast(robots), Seq("host"), "left")
      .withColumn("robots_disallowed",
        ConsentExprs.robotsDisallowed(col("robots_txt"),
          // RFC 9309 matches path + query, not path alone — QUERY is
          // NULL when absent, so the coalesce'd concat adds nothing
          concat(parse_url(col("target_uri"), lit("PATH")),
            coalesce(concat(lit("?"),
              parse_url(col("target_uri"), lit("QUERY"))), lit(""))),
          agent))
      .withColumn("xrobots_noai", directiveFlag(xrobots, "noai"))
      .withColumn("xrobots_noindex", directiveFlag(xrobots, "noindex"))
      .withColumn("meta_noai", metaFlag("noai"))
      .withColumn("meta_noindex", metaFlag("noindex"))
    out.withColumn("consent_ok",
      !(col("robots_disallowed") || col("xrobots_noai") ||
        col("xrobots_noindex") || col("meta_noai") || col("meta_noindex")))
  }

  /** The per-row consent FILTER the curation pipeline mounts (the
    * `consent:` YAML key): drops documents whose text carries a
    * meta-robots objection, and — when the frame carries an `x_robots`
    * column (the `#text` crawl read shape) or a `robots_disallowed`
    * column (a prior [[fromCrawl]] pass) — honors those too. Pure
    * per-row projection: batch AND stream mode. `honorNoindex`
    * extends the objection set from the AI-specific tokens to classic
    * `noindex`. */
  def keep(df: DataFrame, textCol: String,
           honorNoindex: Boolean = false): Column = {
    def tokens(c: Column): Column = {
      val base = directiveFlag(c, "noai") || directiveFlag(c, "noimageai")
      if (honorNoindex) base || directiveFlag(c, "noindex") else base
    }
    def metaTokens: Column = {
      def m(token: String): Column = {
        val dq = s"""(?i)<meta\\b[^>]*content\\s*=\\s*"[^"]*\\b$token\\b[^"]*""""
        val sq = s"(?i)<meta\\b[^>]*content\\s*=\\s*'[^']*\\b$token\\b[^']*'"
        coalesce(col(textCol).rlike(dq) || col(textCol).rlike(sq), lit(false))
      }
      val base = m("noai") || m("noimageai")
      if (honorNoindex) base || m("noindex") else base
    }
    val objections = Seq(
      Some(metaTokens),
      if (df.columns.contains("x_robots")) Some(tokens(col("x_robots")))
      else None,
      if (df.columns.contains("robots_disallowed"))
        Some(coalesce(col("robots_disallowed"), lit(false)))
      else None).flatten
    !objections.reduce(_ || _)
  }
}
