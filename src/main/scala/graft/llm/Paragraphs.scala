package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Line/paragraph-level dedup: drop text units that recur across many
  * documents — the classic crawl-cleaning step (navigation chrome,
  * cookie banners, "subscribe" footers repeat across a site's pages
  * while real prose does not). Complements [[Boilerplate]] (which
  * SCORES documents by common-gram load) and [[Spans]] (which detects
  * repeated windows): this one actually REWRITES the text, removing
  * the offending units and keeping the rest of the document.
  *
  * Scale shape (same discipline as Spans): every ANALYSIS shuffle is
  * narrow. The unit projection explodes to (id, pos, 8-byte hash)
  * rows only; doc-frequency counting groups those narrow rows
  * (map-side partial distinct); unit STRINGS never cross an exchange.
  * Document rows move exactly once — the final rewrite join by id
  * against each affected document's small drop-position set, the same
  * one-shuffle cost any keep-set join pays (AQE broadcasts it when
  * the affected set is small). The rewrite itself filters the split
  * array POSITIONALLY with a codegen'd higher-order function, so the
  * unit strings are re-derived from the local row, never shipped.
  * Within-doc repeats count ONCE toward doc frequency (count distinct
  * id), so a page that repeats its own header does not self-promote
  * into "corpus-common".
  *
  * Hashing note: units are compared by `xxhash64` — a collision could
  * drop a non-common unit; at 64 bits that is negligible against any
  * real corpus, and the same trade is already accepted by the whole
  * sketch family. Blank units (trim = '') are never counted and never
  * dropped: empty lines are structure, not boilerplate.
  */
object Paragraphs {

  /** Per-unit corpus doc-frequency: one row per distinct unit hash
    * with `n_docs`, the number of DISTINCT documents containing it.
    * `sep` is a Java/Spark regex (default: single newline = line-level
    * dedup; use "\\n{2,}" for blank-line paragraphs). */
  def unitDocFrequency(df: DataFrame, idCol: String, textCol: String,
                       sep: String = "\n"): DataFrame =
    df.select(col(idCol),
        explode(split(col(textCol), sep)).as("__unit"))
      .filter(trim(col("__unit")) =!= "")
      .select(col(idCol), xxhash64(col("__unit")).as("unit_hash"))
      .groupBy(col("unit_hash"))
      .agg(countDistinct(col(idCol)).as("n_docs"))

  /** Rewrite `textCol`, removing every unit that occurs in at least
    * `minDocs` distinct documents; all other columns pass through.
    * Documents with nothing to drop keep their text byte-identical
    * (they never enter the drop join). `sep` is the split REGEX;
    * `joinWith` is the literal separator surviving units are rejoined
    * with (they differ exactly when `sep` matches variable-width
    * separators, e.g. sep = "\\n{2,}" with joinWith = "\n\n"). */
  def dropCommon(df: DataFrame, idCol: String, textCol: String,
                 minDocs: Int = 5, sep: String = "\n",
                 joinWith: String = "\n"): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2: $minDocs")
    Guards.requireFreshColumns(df, Seq("__drop", "__pos", "__uh"),
      "Paragraphs.dropCommon")
    val common = unitDocFrequency(df, idCol, textCol, sep)
      .filter(col("n_docs") >= minDocs)
      .select(col("unit_hash"))
    // (id, pos, hash) — narrow; join the common set; fold to one small
    // drop-position array per affected document
    val dropPos = df
      .select(col(idCol),
        posexplode(split(col(textCol), sep)).as(Seq("__pos", "__unit")))
      .select(col(idCol), col("__pos"),
        xxhash64(col("__unit")).as("unit_hash"))
      .join(common, Seq("unit_hash"))
      .groupBy(col(idCol))
      .agg(collect_set(col("__pos")).as("__drop"))
    // positional filter: re-split locally, keep units whose index is
    // not in the doc's drop set — codegen'd, no unit strings shuffle
    df.join(dropPos, Seq(idCol), "left")
      .withColumn(textCol,
        when(col("__drop").isNull, col(textCol))
          .otherwise(array_join(
            filter(split(col(textCol), sep),
              (_, i) => !array_contains(col("__drop"), i)),
            joinWith)))
      .drop("__drop")
  }
}
