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
    * preserved — callers wanting a set apply array_distinct). */
  def domains(text: Column): Column =
    transform(regexp_extract_all(text, lit(HostPattern), lit(1)),
      d => lower(d))

  /** Per-document URL report: `n_urls`, distinct `domains`, and
    * `is_blocked` against an in-memory blocklist. */
  def analyze(df: DataFrame, textCol: String,
              blocklist: Seq[String] = Nil): DataFrame = {
    val ds = array_distinct(domains(col(textCol)))
    val blocked =
      if (blocklist.isEmpty) lit(false)
      else arrays_overlap(ds, lit(blocklist.map(_.toLowerCase).toArray))
    df.withColumn("n_urls", size(domains(col(textCol))).cast("long"))
      .withColumn("domains", ds)
      .withColumn("is_blocked", blocked)
  }

  /** Keep documents that cite no blocked domain (in-memory blocklist:
    * pure filter projection, no join, no shuffle). */
  def filterBlocked(df: DataFrame, textCol: String,
                    blocklist: Seq[String]): DataFrame = {
    require(blocklist.nonEmpty, "empty blocklist would keep everything")
    df.filter(!arrays_overlap(array_distinct(domains(col(textCol))),
      lit(blocklist.map(_.toLowerCase).toArray)))
  }

  /** Keep documents that cite no domain present in the `blocked` table
    * (column `domain`) — for blocklists too large to inline. The
    * exploded (id, domain) stream joins the BROADCAST blocklist; only
    * offending ids come back, and the anti-join against them is
    * id-only. Documents without URLs never enter the join. */
  def filterBlockedLarge(df: DataFrame, idCol: String, textCol: String,
                         blocked: DataFrame): DataFrame = {
    val bad = df
      .select(col(idCol), explode(array_distinct(domains(col(textCol))))
        .as("domain"))
      .join(broadcast(blocked.select(lower(col("domain")).as("domain"))),
        Seq("domain"))
      .select(col(idCol)).distinct()
    df.join(bad, Seq(idCol), "left_anti")
  }
}
