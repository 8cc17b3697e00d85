package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WordPiece vocabulary TRAINING (Schuster & Nakajima 2012; the
  * BERT tokenizer) — the third tokenizer next to [[BpeTrain]] and
  * [[UnigramLm]]: BPE's merge loop with a LIKELIHOOD score instead of
  * a raw count — each round merges the adjacent pair maximizing
  * `count(ab) / (count(a) · count(b))` (the LM-likelihood gain of
  * fusing the pair, as documented for the HuggingFace trainer), and
  * the artifact is a VOCABULARY (word-initial pieces plus
  * `##`-prefixed continuations), not a merge list — apply-side
  * matching is greedy longest-match-first against that vocabulary
  * ([[graft.functions.WordPieceExprs]]).
  *
  * Architecture: identical split to [[BpeTrain]] — word counting is
  * one distributed aggregation; the merge loop runs driver-side over
  * the bounded top-`wordVocabSize` (word, count) table.
  *
  * Determinism: vocabulary cut orders (count desc, word asc); each
  * round picks the best pair by (score desc, left asc, right asc);
  * merging fuses occurrences left-to-right. Symbols after the first
  * carry the `##` prefix from the start (the standard formulation —
  * scores and outputs include it). */
object WordPieceTrain {

  /** Learn a vocabulary of `numMerges` fused pieces (returned AFTER
    * the single-character alphabet, in merge order — the full apply
    * vocabulary is alphabet ++ merged). Stops early when the best
    * pair's count falls below `minFrequency`. */
  def learnVocab(df: DataFrame, textCol: String, numMerges: Int,
                 wordVocabSize: Int = 50000,
                 minFrequency: Long = 2): Seq[String] = {
    require(numMerges >= 1, s"numMerges must be >= 1: $numMerges")
    val wordCounts = df
      .select(explode(split(col(textCol), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w").asc)
      .limit(wordVocabSize)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))

    val counts = wordCounts.map(_._2)
    val words: Array[Array[String]] = wordCounts.map { case (w, _) =>
      val cps = w.codePoints().toArray
      Array.tabulate(cps.length) { i =>
        val c = new String(Character.toChars(cps(i)))
        if (i == 0) c else "##" + c
      }
    }
    // the alphabet: every distinct symbol, sorted — these are always
    // in the vocabulary (coverage)
    val alphabet = words.flatten.distinct.sorted.toSeq

    val merged = Vector.newBuilder[String]
    var iter = 0
    var exhausted = false
    while (iter < numMerges && !exhausted) {
      // pair and unigram counts in one sweep
      val pairCnt = new java.util.HashMap[(String, String), Long]()
      val symCnt = new java.util.HashMap[String, Long]()
      var wi = 0
      while (wi < words.length) {
        val syms = words(wi)
        val c = counts(wi)
        var i = 0
        while (i < syms.length) {
          val o = symCnt.get(syms(i))
          symCnt.put(syms(i), (if (o == null) 0L else o.longValue()) + c)
          if (i < syms.length - 1) {
            val p = (syms(i), syms(i + 1))
            val op = pairCnt.get(p)
            pairCnt.put(p, (if (op == null) 0L else op.longValue()) + c)
          }
          i += 1
        }
        wi += 1
      }
      // argmax by likelihood score count(ab)/(count(a)*count(b)),
      // ties (score) → (left asc, right asc); compare as exact cross
      // products to avoid double rounding: s1 > s2 iff
      // c1·a2·b2 > c2·a1·b1 (all positive longs; BigInt keeps it exact)
      var best: (String, String) = null
      var bestC = 0L
      var bestDen = BigInt(0)
      val it = pairCnt.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val p = e.getKey
        val c = e.getValue.longValue()
        if (c >= minFrequency) {
          val den = BigInt(symCnt.get(p._1).longValue()) *
            BigInt(symCnt.get(p._2).longValue())
          val better =
            if (best == null) true
            else {
              val cmp = (BigInt(c) * bestDen).compare(BigInt(bestC) * den)
              cmp > 0 || (cmp == 0 &&
                (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))
            }
          if (better) { best = p; bestC = c; bestDen = den }
        }
      }
      if (best == null) exhausted = true
      else {
        // fused piece: strip the right side's ## continuation marker
        val fused = best._1 + best._2.stripPrefix("##")
        merged += fused
        var wi2 = 0
        while (wi2 < words.length) {
          val syms = words(wi2)
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
                out += fused; j += 2
              } else { out += syms(j); j += 1 }
            }
            words(wi2) = out.toArray
          }
          wi2 += 1
        }
        iter += 1
      }
    }
    alphabet ++ merged.result()
  }
}
