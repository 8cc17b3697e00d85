package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram language-model tokenizer TRAINING (Kudo 2018, "Subword
  * Regularization") — SentencePiece's other half next to
  * [[BpeTrain]]: instead of greedy merges, fit a piece-probability
  * model by EM over each word's segmentation lattice and PRUNE the
  * candidate vocabulary down to size, so the final tokenizer is the
  * maximum-likelihood unigram model of the corpus.
  *
  * Architecture (same split as [[BpeTrain]], the production shape):
  * the CORPUS-SCALE work — word counting — is one distributed
  * aggregation; seeding, EM and pruning then run driver-side over the
  * top-`wordVocabSize` (word, count) table, a BOUNDED collect in the
  * engine's documented family. A 100 TB corpus prunes to the same
  * ~10^5-row word table as a 1 GB one.
  *
  * Algorithm, concretely:
  *   1. SEED: every substring of every word up to `maxPieceLen`
  *      codepoints, weighted by occurrence × word frequency; all
  *      single codepoints are kept unconditionally (they guarantee
  *      every word stays segmentable), multi-codepoint candidates cut
  *      to the top `seedSize` by (weight desc, piece asc) after a
  *      `minFrequency` floor.
  *   2. EM: per word, forward-backward over the segmentation lattice
  *      (alpha(i) = Σ_j alpha(j)·p(w[j,i)); expected piece counts
  *      accumulate f·alpha(j)·p·beta(i)/alpha(n)); M-step renormalizes.
  *      The recursions run with PER-POSITION RESCALING (alpha/beta kept
  *      as log-scales, each position fully renormalized) so no word
  *      length or rare-piece probability can underflow alpha(n) to 0 —
  *      a plain-probability lattice underflows around 150 positions at
  *      p≈1e-2/piece, poisoning every expected count with Inf/NaN.
  *      Words longer than `maxWordLen` codepoints (base64 blobs, URLs,
  *      DNA — no tokenizer value, O(len·maxPieceLen) lattice cost) are
  *      additionally dropped from the word table up front, loudly.
  *   3. PRUNE: drop the lowest-expected-count multi-codepoint pieces
  *      (count asc, piece desc) down to `shrink` × current, never
  *      below the target; repeat EM+prune until `vocabSize` pieces
  *      remain, then one final EM. (SentencePiece prunes by exact
  *      likelihood-loss-if-removed; expected-count pruning is the
  *      standard reimplementation simplification — the two agree
  *      except near ties, and the tie-breaks here are total orders,
  *      so output is deterministic either way.)
  *
  * Determinism & replay: the word cut orders (count desc, word asc);
  * candidate/prune/output orders are total; EM iterates pieces in
  * sorted order — so the same corpus yields the same model on any
  * cluster, and scaling every word count by a constant S leaves the
  * model EXACTLY invariant in exact arithmetic (EM is scale-free:
  * expected counts scale by S and the M-step divides it out), which is
  * what lets a planted per-doc-multiset corpus pin the output as a
  * VALUES oracle at any SF (the q_bpe_train trick).
  *
  * Pre-tokenization is the same case-preserving whitespace split as
  * the BPE side. */
object UnigramLm {

  /** Learned model: (piece, logProb), logProb desc then piece asc. */
  def train(df: DataFrame, textCol: String, vocabSize: Int,
            maxPieceLen: Int = 8, seedSize: Int = 100000,
            wordVocabSize: Int = 50000, emIters: Int = 2,
            shrink: Double = 0.75,
            minFrequency: Long = 2,
            maxWordLen: Int = 200): Seq[(String, Double)] = {
    require(vocabSize >= 1, s"vocabSize must be >= 1: $vocabSize")
    require(maxPieceLen >= 2 && maxPieceLen <= 32,
      s"maxPieceLen must be in [2, 32]: $maxPieceLen")
    require(emIters >= 1 && emIters <= 20,
      s"emIters must be in [1, 20]: $emIters")
    require(shrink > 0.0 && shrink < 1.0, s"shrink must be in (0,1): $shrink")
    require(maxWordLen >= maxPieceLen,
      s"maxWordLen ($maxWordLen) must be >= maxPieceLen ($maxPieceLen)")
    // megaword guard: filtered BEFORE the top cut (a blob in the top
    // slots must be evicted, not trimmed after collect), counted via
    // observe in the SAME job — the loudness costs zero extra passes
    val megawords = org.apache.spark.sql.Observation()
    val wordCounts = df
      .select(explode(split(col(textCol), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .observe(megawords, sum(when(length(col("w")) > maxWordLen, 1L)
        .otherwise(0L)).as("dropped"))
      .filter(length(col("w")) <= maxWordLen)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w").asc)
      .limit(wordVocabSize)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val dropped = megawords.get.get("dropped")
      .collect { case l: Long => l }.getOrElse(0L)
    if (dropped > 0)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"UnigramLm.train: dropped $dropped word occurrences longer " +
          s"than maxWordLen=$maxWordLen codepoints (base64/URL-style " +
          "megawords carry no tokenizer value)")
    require(wordCounts.nonEmpty, "corpus has no words")

    // words as codepoint arrays (so pieces never split surrogate pairs)
    val words: Array[Array[String]] = wordCounts.map { case (w, _) =>
      w.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
    }
    val freqs: Array[Long] = wordCounts.map(_._2)

    // 1. SEED — substring weights
    val weight = new java.util.HashMap[String, Long]()
    var wi = 0
    while (wi < words.length) {
      val cs = words(wi)
      val f = freqs(wi)
      var i = 0
      while (i < cs.length) {
        val sb = new StringBuilder
        var j = i
        while (j < cs.length && j - i < maxPieceLen) {
          sb.append(cs(j))
          val piece = sb.toString
          val old = weight.get(piece)
          weight.put(piece, (if (old == null) 0L else old.longValue()) + f)
          j += 1
        }
        i += 1
      }
      wi += 1
    }
    import scala.jdk.CollectionConverters._
    val (chars, multi) = weight.asScala.toSeq
      .partition { case (p, _) => p.codePointCount(0, p.length) == 1 }
    require(vocabSize >= chars.size,
      s"vocabSize=$vocabSize below the ${chars.size} single-codepoint " +
        "pieces the corpus needs for coverage")
    val seededMulti = multi
      .filter(_._2 >= minFrequency)
      .sortBy { case (p, c) => (-c, p) }
      .take(seedSize)
    var pieces: Array[String] =
      (chars ++ seededMulti).map(_._1).sorted.toArray
    var probs: Map[String, Double] = {
      val total = (chars ++ seededMulti).map(_._2).sum.toDouble
      (chars ++ seededMulti).map { case (p, c) => p -> c / total }.toMap
    }

    // one EM pass → (expected counts, renormalized probs)
    def emStep(ps: Array[String], prob: Map[String, Double])
        : (Map[String, Double], Map[String, Double]) = {
      val inVocab = ps.toSet
      val counts = new java.util.HashMap[String, Double]()
      var wi = 0
      while (wi < words.length) {
        val cs = words(wi)
        val f = freqs(wi).toDouble
        val n = cs.length
        // piece spans present in the vocab, materialized once
        val spanPiece = Array.ofDim[String](n, math.min(maxPieceLen, n) + 1)
        // forward-backward with PER-POSITION RESCALING: logA(i) =
        // ln alpha(i), logB(i) = ln beta(i). Each position's sum runs
        // relative to the window's max log-scale, so no word length or
        // rare-piece probability chain can underflow to 0 (plain
        // probability space dies around 150 positions at p≈1e-2).
        // Position reachability (logA finite) is guaranteed: every
        // single codepoint is in the vocab.
        val logA = new Array[Double](n + 1)
        val logB = new Array[Double](n + 1)
        logA(0) = 0.0
        var i = 1
        while (i <= n) {
          // ref over CONTRIBUTING spans only (in vocab AND prob > 0 AND
          // predecessor reachable — pieces CAN converge to prob 0);
          // ref = -inf then means alpha(i) is exactly 0, and skipping
          // the sum avoids exp(-inf - -inf) = NaN poisoning
          var ref = Double.NegativeInfinity
          var j = math.max(0, i - maxPieceLen)
          while (j < i) {
            val piece = cs.slice(j, i).mkString
            if (inVocab(piece)) {
              spanPiece(j)(i - j) = piece
              if (prob(piece) > 0.0 && logA(j) > ref) ref = logA(j)
            }
            j += 1
          }
          if (ref == Double.NegativeInfinity) logA(i) = ref
          else {
            var a = 0.0
            j = math.max(0, i - maxPieceLen)
            while (j < i) {
              val piece = spanPiece(j)(i - j)
              if (piece != null) a += math.exp(logA(j) - ref) * prob(piece)
              j += 1
            }
            logA(i) = ref + math.log(a)
          }
          i += 1
        }
        val logZ = logA(n)
        logB(n) = 0.0
        i = n - 1
        while (i >= 0) {
          var ref = Double.NegativeInfinity
          var k = i + 1
          while (k <= n && k - i <= maxPieceLen) {
            val piece = spanPiece(i)(k - i)
            if (piece != null && prob(piece) > 0.0 && logB(k) > ref)
              ref = logB(k)
            k += 1
          }
          if (ref == Double.NegativeInfinity) logB(i) = ref
          else {
            var b = 0.0
            k = i + 1
            while (k <= n && k - i <= maxPieceLen) {
              val piece = spanPiece(i)(k - i)
              if (piece != null) b += prob(piece) * math.exp(logB(k) - ref)
              k += 1
            }
            logB(i) = ref + math.log(b)
          }
          i -= 1
        }
        var j = 0
        while (j < n) {
          var k = j + 1
          while (k <= n && k - j <= maxPieceLen) {
            val piece = spanPiece(j)(k - j)
            if (piece != null) {
              val p = prob(piece)
              if (p > 0.0) {
                val e = f * math.exp(logA(j) + math.log(p) + logB(k) - logZ)
                if (e > 0.0) {
                  val old = counts.get(piece)
                  counts.put(piece,
                    (if (old == null) 0.0 else old.doubleValue()) + e)
                }
              }
            }
            k += 1
          }
          j += 1
        }
        wi += 1
      }
      // deterministic M-step: iterate pieces in sorted order
      var total = 0.0
      var pi = 0
      while (pi < ps.length) {
        val c = counts.get(ps(pi))
        if (c != null) total += c.doubleValue()
        pi += 1
      }
      val cnt = ps.iterator.map { p =>
        val c = counts.get(p)
        p -> (if (c == null) 0.0 else c.doubleValue())
      }.toMap
      (cnt, cnt.map { case (p, c) => p -> c / total })
    }

    val isChar = (p: String) => p.codePointCount(0, p.length) == 1
    val nChars = pieces.count(isChar)
    var done = false
    while (!done) {
      var cnt: Map[String, Double] = null
      var it = 0
      while (it < emIters) {
        val (c2, p2) = emStep(pieces, probs)
        cnt = c2; probs = p2; it += 1
      }
      val multiNow = pieces.filter(p => !isChar(p))
      val target = vocabSize - nChars
      if (multiNow.length <= target) done = true
      else {
        // prune: keep the highest-expected-count multi pieces; at
        // least shrink× go each round so convergence is geometric
        val keep = math.max(target,
          math.min(multiNow.length - 1, (multiNow.length * shrink).toInt))
        val kept = multiNow
          .sortBy(p => (-cnt(p), p))
          .take(keep)
        pieces = (pieces.filter(isChar) ++ kept).sorted
        val mass = pieces.iterator.map(probs).sum
        probs = pieces.iterator.map(p => p -> probs(p) / mass).toMap
      }
    }
    // final model in output order
    pieces.toSeq
      .map(p => (p, math.log(probs(p))))
      .sortBy { case (p, lp) => (-lp, p) }
  }

  /** Model as a DataFrame (piece, log_prob) for gates/sinks. */
  def trainDF(spark: org.apache.spark.sql.SparkSession, df: DataFrame,
              textCol: String, vocabSize: Int,
              maxPieceLen: Int = 8, roundTo: Int = 4): DataFrame = {
    import spark.implicits._
    val rf = math.pow(10.0, roundTo)
    train(df, textCol, vocabSize, maxPieceLen)
      .map { case (p, lp) => (p, math.floor(lp * rf + 0.5) / rf) }
      .toDF("piece", "log_prob")
  }
}
