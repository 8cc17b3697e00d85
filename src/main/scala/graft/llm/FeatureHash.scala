package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Feature hashing (the "hashing trick", Weinberger et al. ICML'09) —
  * the vectorizer that needs NO vocabulary: each token hashes straight
  * to one of `nBuckets` feature slots, with a second hash bit deciding
  * the sign so colliding tokens cancel in expectation instead of
  * piling up bias. This is how linear classifiers/regressors train
  * over unbounded vocabularies (spam filters, CTR models, the
  * quality-classifier features of a curation stack) without the
  * build-a-dictionary pass the NB/chi-square path does — and with NO
  * driver-side state at all, where even [[NbClassifier]] collects its
  * bounded model table.
  *
  * Portability: the token hash is a polynomial-31 fold over the
  * token's ASCII codepoints mod P (the same engine-portable prime
  * family as [[Sampling.portableBucket]]) — exact integer arithmetic
  * any SQL engine replays, unlike xxhash64/murmur. Weaker mixing than
  * murmur is irrelevant here: bucket balance at nBuckets ≪ P is
  * governed by the mod, and the sign bit decorrelates residue pairs.
  *
  * Scale shape: tokenize → hash is a narrow projection (the token
  * string never leaves its row); the only shuffle is the final
  * (doc, bucket) aggregation of ±1 counts — keys-only, map-side
  * combined. Output is the sparse (doc, bucket, weight) triple shape
  * that feeds a broadcast-able weight vector at serving time. */
object FeatureHash {

  /** Large prime below 2^31 — same portable-prime TECHNIQUE as
    * [[Sampling]]'s P but a deliberately DIFFERENT modulus
    * (2^31-1 here vs Sampling's 1000000007): the q_feature_hash
    * DuckDB oracle hard-codes this constant, so do NOT "unify" them.
    * Fold state stays < P so `state·31 + cp` < 2^36 — exact in any
    * BIGINT. */
  private val P = 2147483647L

  /** Polynomial-31 string hash mod P over codepoints, as a portable
    * Column expression (both engines fold left-to-right over the same
    * codepoint sequence). */
  def portableStringHash(s: Column): Column =
    aggregate(
      transform(sequence(lit(1), length(s)),
        i => ascii(s.substr(i, lit(1))).cast("long")),
      lit(0L),
      (acc, cp) => pmod(acc * 31L + cp, lit(P)))

  /** Sparse hashed features: (idCol, bucket, weight) where bucket =
    * h(token) mod nBuckets and weight = Σ ±1 over the doc's tokens
    * (sign = parity of h(token) div nBuckets — independent of the
    * bucket residue). Tokens are the text family's lowercase `\W+`
    * split. Zero-weight buckets (full sign cancellation) are kept —
    * dropping them would make the output depend on collision
    * accidents; callers filter if they want. */
  def vectorize(df: DataFrame, idCol: String, textCol: String,
                nBuckets: Int = 1 << 18,
                signed: Boolean = true): DataFrame = {
    require(nBuckets >= 2 && nBuckets <= (1 << 26),
      s"nBuckets must be in [2, 2^26]: $nBuckets")
    val id = col("`" + idCol.replace("`", "``") + "`")
    val tok = df.select(id.as("__id"),
        explode(Contamination.tokens(col(textCol))).as("__t"))
      .withColumn("__h", portableStringHash(col("__t")))
    // integer div, not Column `/` (double division): h < 2^31 and
    // non-negative, so floor-of-double-div == integer div exactly
    val sign =
      if (signed)
        when(pmod(floor(col("__h") / lit(nBuckets.toDouble)).cast("long"),
          lit(2L)) === 0L, lit(1L)).otherwise(lit(-1L))
      else lit(1L)
    tok
      .select(col("__id").as(idCol),
        pmod(col("__h"), lit(nBuckets.toLong)).as("bucket"),
        sign.as("__s"))
      .groupBy(col(idCol), col("bucket"))
      .agg(sum(col("__s")).as("weight"))
  }
}
