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
    * with their document counts. Two corpus passes, both narrow: hash
    * count → threshold; then a broadcast semi-join recovers the string
    * form of just the survivors. */
  def commonGrams(df: DataFrame, textCol: String, n: Int = 2,
                  minDocFrac: Double = 0.15): DataFrame = {
    require(minDocFrac > 0.0 && minDocFrac <= 1.0,
      s"minDocFrac must be in (0, 1]: $minDocFrac")
    val total = df.count()
    val threshold = math.max(1L, math.ceil(minDocFrac * total).toLong)
    val surviving = df
      .select(explode(Contamination.hashedNgrams(col(textCol), n)).as("gh"))
      .groupBy("gh").agg(count(lit(1)).as("doc_freq"))
      .filter(col("doc_freq") >= threshold)
    // per-doc grams are distinct, so after the join each (doc, gram)
    // contributes once; any doc containing the gram can name it
    df.select(explode(Contamination.ngrams(col(textCol), n)).as("gram"))
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
    val probe = boilerplate
      .select(xxhash64(col("gram")).as("gh")).distinct()
      .withColumn("__hit", lit(1))
    df.select(col(idCol),
        explode(Contamination.hashedNgrams(col(textCol), n)).as("gh"))
      .join(broadcast(probe), Seq("gh"), "left")
      .groupBy(col(idCol))
      .agg(count(col("__hit")).as("boiler_grams"),
        count(lit(1)).as("total_grams"))
      .select(col(idCol), col("boiler_grams"), col("total_grams"),
        round(col("boiler_grams") / col("total_grams"), roundTo)
          .as("boiler_frac"))
  }
}
