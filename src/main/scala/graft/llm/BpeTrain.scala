package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.BpeExprs

/** BPE merge TRAINING (Sennrich, Haddow & Birch 2016) — closes the
  * tokenizer loop: [[graft.functions.BpeExprs]] applies a merges list;
  * this learns one from the corpus itself, so token budgets, chunking
  * and packing can run under a corpus-fitted tokenizer with no external
  * artifact.
  *
  * Architecture (the SentencePiece/subword-nmt shape): the CORPUS-SCALE
  * work — word counting — is one distributed aggregation; the merge
  * loop then runs driver-side over the top-`vocabSize` (word, count)
  * table, a BOUNDED collect in the engine's documented family
  * (inference's 1000 rows, NbClassifier's |classes| stats). That split
  * is how production tokenizers are actually trained: pair statistics
  * over a pruned word-frequency table, not over raw text — a 100 TB
  * corpus prunes to the same ~10^5-row table as a 1 GB one.
  *
  * Determinism: the vocabulary cut orders (count desc, word asc); each
  * round picks the most frequent pair with ties broken (left asc,
  * right asc); merging fuses occurrences left-to-right exactly like
  * [[BpeExprs.encodeWord]] — so `learnMerges` + `bpe_tokenize` replays
  * training faithfully, and the same corpus always yields the same
  * merges on any cluster. Pre-tokenization is the SAME whitespace
  * split (case-preserving) the apply expressions use. */
object BpeTrain {

  /** Learn `numMerges` merges from the corpus. Stops early when the
    * best pair's frequency falls below `minFrequency` (the paper's
    * stopping rule — merges learned from one stray word generalize
    * nothing).
    *
    * @return merge pairs in priority order, directly usable by
    *         [[BpeExprs.bpeTokenCount]] / [[BpeExprs.bpeTokenize]]. */
  def learnMerges(df: DataFrame, textCol: String, numMerges: Int,
                  vocabSize: Int = 50000,
                  minFrequency: Long = 2): Seq[(String, String)] = {
    require(numMerges >= 1, s"numMerges must be >= 1: $numMerges")
    require(vocabSize >= 1 && vocabSize <= 1000000,
      s"vocabSize must be in [1, 1000000]: $vocabSize")
    require(minFrequency >= 1, s"minFrequency must be >= 1: $minFrequency")
    // distributed corpus pass: case-preserving whitespace words (the
    // apply-side pre-tokenization), one (word, count) aggregation,
    // deterministic top-V cut
    val wordCounts = df
      .select(explode(split(col(textCol), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w").asc)
      .limit(vocabSize)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))

    // driver loop over the bounded table: word -> symbol array + count
    val counts = wordCounts.map(_._2)
    val words: Array[Array[String]] = wordCounts.map { case (w, _) =>
      val cps = w.codePoints().toArray
      val syms = new Array[String](cps.length + 1)
      var i = 0
      while (i < cps.length) {
        syms(i) = new String(Character.toChars(cps(i))); i += 1
      }
      syms(cps.length) = BpeExprs.EndOfWord
      syms
    }
    val merges = Vector.newBuilder[(String, String)]
    var iter = 0
    var exhausted = false
    while (iter < numMerges && !exhausted) {
      // pair statistics: every adjacent position counts (the paper's
      // get_stats), weighted by word frequency
      val stats = new java.util.HashMap[(String, String), Long]()
      var wi = 0
      while (wi < words.length) {
        val syms = words(wi)
        val c = counts(wi)
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          val old = stats.get(p)
          stats.put(p, (if (old == null) 0L else old.longValue()) + c)
          i += 1
        }
        wi += 1
      }
      // deterministic argmax: count desc, then (left, right) asc
      var best: (String, String) = null
      var bestCount = 0L
      val it = stats.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val p = e.getKey
        val c = e.getValue
        if (c > bestCount || (c == bestCount && best != null &&
            (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))) {
          best = p; bestCount = c
        }
      }
      if (best == null || bestCount < minFrequency) exhausted = true
      else {
        merges += best
        // fuse every occurrence left-to-right — identical to the
        // apply-side encodeWord step
        wi = 0
        while (wi < words.length) {
          val syms = words(wi)
          var has = false
          var i = 0
          while (!has && i < syms.length - 1) {
            has = syms(i) == best._1 && syms(i + 1) == best._2
            i += 1
          }
          if (has) {
            val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == best._1 &&
                  syms(j + 1) == best._2) {
                out += best._1 + best._2; j += 2
              } else { out += syms(j); j += 1 }
            }
            words(wi) = out.toArray
          }
          wi += 1
        }
        iter += 1
      }
    }
    merges.result()
  }

  /** Serialize merges in the published file format ([[BpeExprs
    * .parseMerges]] round-trips it). */
  def mergesLines(merges: Seq[(String, String)]): Seq[String] =
    "#version: 0.2" +: merges.map { case (a, b) => s"$a $b" }
}
