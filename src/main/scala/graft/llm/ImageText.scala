package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Image-text pair mining from raw HTML — the LAION construction
  * (Schuhmann et al. 2021 §2: crawl pages → `<img>` tags → (src URL,
  * alt text) pairs → quality-filter the alt). This is how web-scale
  * image-caption corpora are built from the same crawl the text
  * pipeline curates; the output rows feed the multimodal fetch/decode
  * stages ([[Multimodal]]) keyed by `img_url`.
  *
  * Every pattern is RE2-safe (no lookahead/backreferences), so the
  * DuckDB oracle runs the IDENTICAL regexes: tags via
  * `regexp_extract_all` group 0, attributes via two quote-style
  * extracts coalesced (an absent or empty attribute is NULL either
  * way). Attribute matching is order-independent (src/alt extract
  * separately from the tag body) and case-insensitive.
  *
  * Scale shape: one generator (posexplode) over per-row extracted tag
  * arrays — no shuffle, no state; output cardinality is the corpus's
  * image-tag count. Documents without images vanish at the explode.
  * Caveat (documented, fixture-pinned): attr values containing a
  * literal `>` end the tag match early — rare in crawl HTML and a
  * miss, never a wrong pair. */
object ImageText {

  /** Whole `<img …>` tags. `\b` keeps `<imgx` out. */
  val ImgTag = "(?i)<img\\b[^>]*>"

  private def attr(tag: Column, name: String): Column = {
    val dq = s"""(?i)$name\\s*=\\s*"([^"]*)""""
    val sq = s"(?i)$name\\s*=\\s*'([^']*)'"
    coalesce(nullif(regexp_extract(tag, dq, 1), lit("")),
      nullif(regexp_extract(tag, sq, 1), lit("")))
  }

  /** Every `<img>` occurrence as (idCol, img_pos, img_url, alt_text) —
    * the raw extraction surface; url/alt are NULL when the attribute
    * is absent or empty. `img_pos` is the tag's 0-based position in
    * the document (stable tie-break for multi-image pages). */
  def extract(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
        posexplode(regexp_extract_all(col(textCol), lit(ImgTag), lit(0)))
          .as(Seq("img_pos", "__tag")))
      .select(col(idCol), col("img_pos"),
        attr(col("__tag"), "src").as("img_url"),
        attr(col("__tag"), "alt").as("alt_text"))

  /** The pair-quality surface: a usable pair needs a source URL and a
    * caption of at least `minAltChars` codepoints (LAION's alt-length
    * floor — single-word alts are file names and "logo"s). */
  def pairs(df: DataFrame, idCol: String, textCol: String,
            minAltChars: Int = 5): DataFrame = {
    require(minAltChars >= 0, s"minAltChars must be >= 0, got $minAltChars")
    extract(df, idCol, textCol)
      .filter(col("img_url").isNotNull &&
        length(col("alt_text")) >= minAltChars)
  }
}
