package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL/domain hygiene: extract the hostnames a document links to and
  * filter against a domain blocklist — the "drop documents citing
  * known-bad sources" step of web-corpus curation.
  *
  * Scale shape: extraction is a pure regexp projection (codegen'd,
  * shuffle-free). Filtering has two paths sized to the blocklist:
  * a literal-array overlap test for in-memory lists (still a pure
  * filter), and a broadcast anti-join for blocklists that are
  * themselves tables (keys-only: only (id, domain) pairs ever leave
  * the row, never document text).
  */
object Urls {

  /** Hostname pattern, shared verbatim with the DuckDB oracle (both
    * engines' regex dialects accept it identically):
    *  - `(?i)` — schemes and hosts match case-insensitively (a curation
    *    blocklist must catch `HTTPS://SPAM.EXAMPLE.COM`);
    *  - optional `userinfo@` is skipped, never mistaken for the host;
    *  - the host capture takes only hostname-legal characters
    *    (alnum/hyphen labels joined by dots), so ports, paths, and
    *    TRAILING PUNCTUATION (`spam.example.com,` / `.../a.com.`)
    *    never leak into the domain and can't bypass the blocklist. */
  val HostPattern = "(?i)https?://(?:[^/\\s@]*@)?([a-z0-9-]+(?:\\.[a-z0-9-]+)*)"

  /** Lowercased hostnames of every http(s) URL in `text` (duplicates
    * preserved — callers wanting a set apply array_distinct). NULL text
    * yields an EMPTY array, never null: every downstream predicate
    * (overlap, size) then agrees between the literal-blocklist and
    * broadcast-table paths with no three-valued-logic surprises. */
  def domains(text: Column): Column =
    coalesce(
      transform(regexp_extract_all(text, lit(HostPattern), lit(1)),
        d => lower(d)),
      array().cast("array<string>"))

  /** Blocklist entries normalized locale-independently — JVM-default
    * `toLowerCase` under tr-TR would turn "SITE" into "sıte" (dotless ı)
    * and silently disable the entry against Spark's ROOT-locale
    * `lower()`. */
  private def normalized(blocklist: Seq[String]): Array[String] =
    blocklist.map(_.toLowerCase(java.util.Locale.ROOT)).toArray

  /** Registered-domain-suffix match, the semantics real URL blocklists
    * use: an entry `spam.example.com` blocks that host AND every
    * subdomain (`evil.spam.example.com`), but NOT lookalike supersets
    * (`notspam.example.com` — the dot boundary is required). */
  private def matchesEntry(host: Column, entry: String): Column =
    host === lit(entry) || host.endsWith("." + entry)

  /** True iff any host in `hosts` matches any blocklist entry by
    * domain suffix. Still a pure filter expression (no join): the
    * in-memory path is for small lists where |entries| literal
    * comparisons per host are cheaper than any shuffle. */
  private def anyBlocked(hosts: Column, entries: Array[String]): Column =
    exists(hosts, h => entries.map(e => matchesEntry(h, e)).reduce(_ || _))

  /** All dot-suffixes of a hostname (`a.b.c` → [`a.b.c`, `b.c`, `c`]) —
    * the equi-join keys that make suffix blocking a broadcast HASH join
    * in [[filterBlockedLarge]] instead of a nested-loop LIKE join: a
    * host has at most label-count suffixes (~5), so the explode is
    * bounded, and the join stays on equality. */
  private def hostSuffixes(host: Column): Column = {
    val parts = split(host, "\\.")
    transform(sequence(lit(1), size(parts)), i =>
      array_join(slice(parts, i, size(parts)), "."))
  }

  /** Per-document URL report: `n_urls`, distinct `domains`, and
    * `is_blocked` against an in-memory blocklist. The extraction regex
    * runs ONCE per row (shared `__hosts` projection) — the transform
    * lambda is outside codegen subexpression elimination, so two
    * independent `domains(...)` trees would scan every document twice. */
  def analyze(df: DataFrame, textCol: String,
              blocklist: Seq[String] = Nil): DataFrame = {
    Guards.requireFreshColumns(df,
      Seq("__hosts", "n_urls", "domains", "is_blocked"), "Urls.analyze")
    val ds = array_distinct(col("__hosts"))
    val blocked =
      if (blocklist.isEmpty) lit(false)
      else anyBlocked(ds, normalized(blocklist))
    df.withColumn("__hosts", domains(col(textCol)))
      .withColumn("n_urls", size(col("__hosts")).cast("long"))
      .withColumn("domains", ds)
      .withColumn("is_blocked", blocked)
      .drop("__hosts")
  }

  /** Keep documents that cite no blocked domain — entry matches the
    * host or any subdomain of it (in-memory blocklist: pure filter
    * projection, no join, no shuffle). */
  def filterBlocked(df: DataFrame, textCol: String,
                    blocklist: Seq[String]): DataFrame = {
    require(blocklist.nonEmpty, "empty blocklist would keep everything")
    df.filter(!anyBlocked(array_distinct(domains(col(textCol))),
      normalized(blocklist)))
  }

  /** Keep documents that cite no domain present in the `blocked` table
    * (column `domain`) — for blocklists too large to inline. Suffix
    * semantics ride an EQUI-join: each host explodes into its ≤5
    * dot-suffixes, which hash-join the BROADCAST blocklist (keys-only:
    * only (id, suffix) pairs ever leave the row, never document text) —
    * a `LIKE '%.'||domain` condition would force a nested-loop join
    * instead. Only offending ids come back, and the anti-join against
    * them is id-only. Documents without URLs never enter the join. */
  def filterBlockedLarge(df: DataFrame, idCol: String, textCol: String,
                         blocked: DataFrame): DataFrame = {
    val bad = df
      .select(col(idCol), explode(array_distinct(flatten(
          transform(array_distinct(domains(col(textCol))), h => hostSuffixes(h)))))
        .as("domain"))
      .join(broadcast(blocked.select(lower(col("domain")).as("domain"))),
        Seq("domain"))
      .select(col(idCol)).distinct()
    df.join(bad, Seq(idCol), "left_anti")
  }

  /** Default tracking-parameter patterns (regex alternatives): the
    * ubiquitous analytics / click / email-campaign identifiers — each
    * is pure routing noise AND a cross-site user identifier, so
    * stripping them is both a dedup win (the same article shared via
    * two campaigns canonicalizes to one URL) and a PII-hygiene step
    * (the text-side sibling of the EXIF GPS strip). */
  val DefaultTrackingParams: Seq[String] = Seq(
    "utm_[a-z0-9_]+", "fbclid", "gclid", "dclid", "gbraid", "wbraid",
    "msclkid", "yclid", "twclid", "igshid", "mc_eid", "mkt_tok",
    "_hsenc", "_hsmi", "vero_id", "oly_enc_id", "oly_anon_id")

  /** The alternation the strip regexes embed — public so the oracle
    * SQL interpolates the IDENTICAL pattern. */
  def trackingAlt(params: Seq[String] = DefaultTrackingParams): String =
    params.mkString("(?:", "|", ")")

  /** Remove tracking query parameters from every URL occurrence in
    * `text`, keeping all non-tracking parameters and fragments intact.
    * Three RE2-compatible regexp passes (NO lookahead — the same
    * pattern strings replay verbatim in the DuckDB oracle, which is
    * RE2-based), each a codegen'd projection:
    *
    *   1. `&param=value` (any non-leading position) → removed;
    *   2. `?param=value&` (leading, more params follow) → `?`;
    *   3. `?param=value` (after 1–2, only a whole trailing query) →
    *      removed.
    *
    * The match is query-parameter SYNTAX (`[?&]name=value` up to the
    * next `&`, `#`, or whitespace) anywhere in the text — prose
    * containing literal `?utm_…=` sequences outside a URL is
    * vanishingly rare, and a curation rewrite prefers the false strip
    * of such a sequence over parsing ambiguity. */
  def stripTrackingParams(text: Column,
                          params: Seq[String] = DefaultTrackingParams)
      : Column = {
    require(params.nonEmpty, "empty tracking-parameter list strips nothing")
    val a = trackingAlt(params)
    val p1 = regexp_replace(text, s"(?i)&$a=[^&#\\s]*", "")
    val p2 = regexp_replace(p1, s"(?i)\\?$a=[^&#\\s]*&", "?")
    regexp_replace(p2, s"(?i)\\?$a=[^&#\\s]*", "")
  }

  /** In-place canonicalization of a document frame's text column —
    * a pure shuffle-free projection, never drops rows. */
  def canonicalizeUrls(df: DataFrame, textCol: String,
                       params: Seq[String] = DefaultTrackingParams)
      : DataFrame =
    df.withColumn(textCol, stripTrackingParams(col(textCol), params))
}
