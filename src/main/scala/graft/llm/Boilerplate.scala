package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level boilerplate detection: word n-grams that appear in an
  * abnormally large FRACTION OF DOCUMENTS (cookie banners, footers,
  * "all rights reserved…") — per-document repetition metrics can't see
  * these, because each document contains the phrase once. The C4-style
  * cure is: find high-document-frequency grams corpus-wide, then score
  * each document by how much of it is made of them.
  *
  * Scale shape: document frequencies are counted over HASHED grams
  * (per-doc distinct, so explode emits keys only — the one shuffle
  * carries (hash) pairs, never text). The surviving boilerplate set is
  * tiny by construction (it cleared a corpus-wide frequency bar), so
  * recovering readable gram strings and scoring documents are both
  * BROADCAST joins against it — the corpus is never shuffled by gram
  * string at any stage.
  */
object Boilerplate {

  /** Grams (readable) present in at least `minDocFrac` of documents,
    * with their document counts. THREE corpus passes, all narrow:
    * doc count (skipped when the caller passes `totalDocs`), hashed
    * doc-frequency count → threshold, then a broadcast semi-join
    * recovering the string form of just the survivors. On an expensive
    * upstream lineage, persist the input or pass `totalDocs`. */
  def commonGrams(df: DataFrame, textCol: String, n: Int = 2,
                  minDocFrac: Double = 0.15,
                  totalDocs: Option[Long] = None): DataFrame = {
    require(minDocFrac > 0.0 && minDocFrac <= 1.0,
      s"minDocFrac must be in (0, 1]: $minDocFrac")
    val total = totalDocs.getOrElse(df.count())
    val threshold = math.max(1L, math.ceil(minDocFrac * total).toLong)
    val surviving = df
      .select(explode(Contamination.hashedNgrams(col(textCol), n)).as("gh"))
      .groupBy("gh").agg(count(lit(1)).as("doc_freq"))
      .filter(col("doc_freq") >= threshold)
    // per-doc grams are distinct, so after the join each (doc, gram)
    // contributes once; any doc containing the gram can name it. The
    // native one-pass ShingleStrings replaces the interpreted
    // transform/concat_ws chain — on this recovery pass that chain was
    // the dominant query cost
    df.select(explode(
        graft.functions.SketchExprs.shingleStrings(col(textCol), n)).as("gram"))
      .withColumn("gh", xxhash64(col("gram")))
      .join(broadcast(surviving), Seq("gh"))
      .groupBy("gram").agg(max(col("doc_freq")).as("doc_freq"))
  }

  /** Per-document boilerplate load: `boiler_grams` / `total_grams` /
    * `boiler_frac` against a gram set from [[commonGrams]] (or any
    * curated list). Same broadcast-join shape as Contamination.check:
    * one corpus pass, keys-only explode. */
  def score(df: DataFrame, idCol: String, textCol: String,
            boilerplate: DataFrame, n: Int = 2,
            roundTo: Int = 6): DataFrame = {
    Guards.requireFreshColumns(df,
      Seq("boiler_grams", "total_grams", "boiler_frac"), "Boilerplate.score")
    val probe = boilerplate
      .select(xxhash64(col("gram")).as("gh")).distinct()
      .withColumn("__hit", lit(1))
    // explode_OUTER + count(gh): a doc with no grams (null/empty/short
    // text) stays in the report as 0/0/0.0 instead of silently
    // vanishing — same no-null-guards contract as Repetition.stats
    df.select(col(idCol),
        explode_outer(Contamination.hashedNgrams(col(textCol), n)).as("gh"))
      .join(broadcast(probe), Seq("gh"), "left")
      .groupBy(col(idCol))
      .agg(count(col("__hit")).as("boiler_grams"),
        count(col("gh")).as("total_grams"))
      .select(col(idCol), col("boiler_grams"), col("total_grams"),
        // explicit guard, not try_divide: ANSI mode makes 0/0 throw
        when(col("total_grams") > 0,
          round(col("boiler_grams") / col("total_grams"), roundTo))
          .otherwise(lit(0.0)).as("boiler_frac"))
  }
}
