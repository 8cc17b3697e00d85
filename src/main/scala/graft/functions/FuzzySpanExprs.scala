package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Edit-tolerant (near-verbatim) span matching against a bounded probe
  * corpus — the winnowing-fingerprint complement to the VERBATIM
  * window machinery ([[SketchExprs.TokenWindowHashes]] +
  * [[graft.llm.Contamination.decontaminateExcise]]): a leaked eval
  * passage with one token changed or punctuation drift produces ZERO
  * verbatim window matches, but its clean stretches still share
  * winnowing fingerprints ([[SketchExprs.WinnowFingerprints]] — any
  * shared codepoint run of length >= w + k - 1 shares at least one
  * fingerprint VALUE, the Schleimer 2003 guarantee).
  *
  * Per-row algorithm of [[FuzzyMatchSpans]] (corpus side; the probe
  * side collects ONCE into two sorted 8-byte-hash indexes that ride
  * the plan — same bounded-eval-suite design as the verbatim pass):
  *
  *   1. SEED (the cheap gate): winnow-select the document's char-gram
  *      hashes and binary-search only the ~2/(w+1)-density selections
  *      against the probe FINGERPRINT index. No hit → clean document,
  *      done — the 99.9% path costs the gram hashing plus ~nGrams/w
  *      searches, no per-gram probing.
  *   2. LOCALIZE: on a seeded document, probe every gram hash against
  *      the probe GRAM index and cluster matched gram positions,
  *      bridging gaps <= maxGapGrams (a single embedded edit of
  *      <= `e` codepoints corrupts at most k + e - 1 consecutive
  *      grams, so the default gap 4k bridges a few adjacent edits).
  *   3. VERIFY + BOUND: a cluster survives if it spans >=
  *      minSpanGrams matched grams AND its matched/total gram ratio
  *      inside [first, last] is >= minOverlap — the local-alignment
  *      stand-in, computed from the same index with zero extra scans.
  *      The span is [first matched gram start, last matched gram end)
  *      in CODEPOINTS: gram-run bounds, NOT winnow-selection bounds,
  *      so reported spans are deterministic and id-arithmetic
  *      predictable (winnow selections shift with context; gram runs
  *      do not).
  *
  * GUARANTEE (what edit density breaks it): a leaked region is
  * DETECTED iff it contains at least one clean (edit-free) stretch of
  * >= w + k - 1 codepoints; edits spaced closer than that everywhere
  * defeat the seed — by construction, the same bound as MOSS. Within
  * a detected region, bounds cover every matched gram within
  * maxGapGrams bridging; edits closer to an edge than k corrupt the
  * edge grams, shrinking the reported span by up to the edit's
  * neighborhood (k + e - 1 codepoints). The hash family is the
  * portable 31-polynomial of [[SketchExprs.WinnowFingerprints]]
  * (equality pinned by test), so the probe side reuses that very
  * expression.
  *
  * No shuffle, no join anywhere: both indexes are plan-side arrays,
  * the corpus pays one per-row projection — the stage streams
  * unchanged, exactly like the verbatim pass.
  */
object FuzzySpanExprs {

  private val P = 2147483647L

  /** The house portable polynomial over codepoints — MUST stay equal
    * to [[SketchExprs.WinnowFingerprints]]'s gram hash (pinned by
    * CorpusOpsSpec's fingerprint-equality property). */
  private[functions] def polyGramHashes(cps: Array[Int], k: Int): Array[Long] = {
    val nGrams = cps.length - k + 1
    if (nGrams <= 0) return Array.emptyLongArray
    val hashes = new Array[Long](nGrams)
    var g = 0
    while (g < nGrams) {
      var h = 0L
      var i = 0
      while (i < k) { h = (h * 31 + cps(g + i)) % P; i += 1 }
      hashes(g) = h
      g += 1
    }
    hashes
  }

  /** Char-gram hashes as a plain array<long> — the probe-side GRAM
    * index source ([[FuzzyMatchSpans]] step 2 probes against the
    * distinct image of exactly these values). */
  case class PolyGramHashes(child: Expression, k: Int)
    extends UnaryExpression {

    require(k >= 2, s"gram size must be >= 2 chars: $k")

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = child.nullable

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      val ref = ctx.addReferenceObj("polyGrams", this,
        classOf[PolyGramHashes].getName)
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.grams($c);")
    }

    protected override def nullSafeEval(input: Any): Any =
      grams(input.asInstanceOf[UTF8String])

    def grams(u: UTF8String): ArrayData =
      new GenericArrayData(polyGramHashes(u.toString.codePoints().toArray, k))

    override protected def withNewChildInternal(c: Expression): PolyGramHashes =
      copy(child = c)
  }

  /** Matched near-verbatim spans of `child` against the probe indexes,
    * as array<struct<s, e, matched, total>> (codepoint [s, e); counts
    * for the report surface). `fps` and `grams` MUST be sorted. */
  case class FuzzyMatchSpans(
      child: Expression,
      fps: Array[Long],
      grams: Array[Long],
      k: Int,
      w: Int,
      maxGapGrams: Int,
      minOverlap: Double,
      minSpanGrams: Int)
    extends UnaryExpression {

    require(k >= 2, s"gram size must be >= 2 chars: $k")
    require(w >= 1, s"winnow window must be >= 1 grams: $w")
    require(maxGapGrams >= 0, s"maxGapGrams must be >= 0: $maxGapGrams")
    require(minOverlap > 0.0 && minOverlap <= 1.0,
      s"minOverlap must be in (0, 1]: $minOverlap")
    require(minSpanGrams >= 1, s"minSpanGrams must be >= 1: $minSpanGrams")

    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("s", IntegerType, nullable = false),
      StructField("e", IntegerType, nullable = false),
      StructField("matched", IntegerType, nullable = false),
      StructField("total", IntegerType, nullable = false))),
      containsNull = false)
    override def nullable: Boolean = child.nullable

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      val ref = ctx.addReferenceObj("fuzzySpans", this,
        classOf[FuzzyMatchSpans].getName)
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.spans($c);")
    }

    protected override def nullSafeEval(input: Any): Any =
      spans(input.asInstanceOf[UTF8String])

    private def inSorted(arr: Array[Long], h: Long): Boolean =
      java.util.Arrays.binarySearch(arr, h) >= 0

    def spans(u: UTF8String): ArrayData = {
      val empty = new GenericArrayData(Array.empty[Any])
      val cps = u.toString.codePoints().toArray
      val hashes = polyGramHashes(cps, k)
      val nGrams = hashes.length
      if (nGrams == 0) return empty

      // 1. SEED: winnow-select (sliding min, rightmost ties — the
      // SketchExprs.WinnowFingerprints selection) and probe only the
      // selections against the fingerprint index
      val dq = new java.util.ArrayDeque[Int]()
      var seeded = false
      var lastSel = -1
      var p = 0
      while (!seeded && p < nGrams) {
        while (!dq.isEmpty && hashes(dq.peekLast()) >= hashes(p))
          dq.pollLast()
        dq.addLast(p)
        val windowStart = p - w + 1
        while (dq.peekFirst() < windowStart) dq.pollFirst()
        if (p >= w - 1 || p == nGrams - 1) {
          val sel = dq.peekFirst()
          if (sel != lastSel) {
            lastSel = sel
            if (inSorted(fps, hashes(sel))) seeded = true
          }
        }
        p += 1
      }
      if (!seeded) return empty

      // 2+3. LOCALIZE and VERIFY: probe every gram, cluster matches
      // with gaps <= maxGapGrams, keep clusters passing the matched
      // floor and the overlap ratio; bounds are gram-run bounds
      val out = new scala.collection.mutable.ArrayBuffer[Any]()
      var clusterStart = -1; var clusterLast = -1; var clusterMatched = 0
      def flush(): Unit = {
        if (clusterStart >= 0) {
          val total = clusterLast - clusterStart + 1
          if (clusterMatched >= minSpanGrams &&
            clusterMatched.toDouble / total >= minOverlap)
            out += new org.apache.spark.sql.catalyst.expressions
              .GenericInternalRow(Array[Any](
                clusterStart, clusterLast + k, clusterMatched, total))
        }
        clusterStart = -1; clusterLast = -1; clusterMatched = 0
      }
      var g = 0
      while (g < nGrams) {
        if (inSorted(grams, hashes(g))) {
          if (clusterStart < 0) { clusterStart = g }
          else if (g - clusterLast > maxGapGrams) { flush(); clusterStart = g }
          clusterLast = g
          clusterMatched += 1
        }
        g += 1
      }
      flush()
      new GenericArrayData(out.toArray)
    }

    override protected def withNewChildInternal(c: Expression): FuzzyMatchSpans =
      copy(child = c)
  }

  /** Column wrappers. */
  def polyGramHashes(text: Column, k: Int): Column =
    GraftBridge.column(PolyGramHashes(GraftBridge.expression(text), k))

  def fuzzyMatchSpans(text: Column, fps: Array[Long], grams: Array[Long],
                      k: Int, w: Int, maxGapGrams: Int, minOverlap: Double,
                      minSpanGrams: Int): Column =
    GraftBridge.column(FuzzyMatchSpans(GraftBridge.expression(text),
      fps, grams, k, w, maxGapGrams, minOverlap, minSpanGrams))
}
