package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Apply side of the unigram-LM tokenizer ([[graft.llm.UnigramLm]]
  * trains the model) — Viterbi segmentation of each whitespace word
  * under the (piece, logProb) table, the standard SentencePiece decode
  * (Kudo 2018 §2: the single best segmentation is the argmax over the
  * lattice the trainer ran EM on).
  *
  * Same house shape as [[BpeExprs]]: the model compiles once per
  * deserialized expression into a java HashMap (reference-object
  * pattern — the whole scorer stays inside whole-stage codegen), a
  * per-thread word memo short-circuits Zipf-repeated words, and the
  * COUNT variant never materializes token strings.
  *
  * Determinism: ties on total log-prob break to the LONGEST last piece
  * (the smaller split point j), a total order. Codepoints absent from
  * the model segment as single-character fallbacks at `oovLogProb` —
  * decode never fails on unseen bytes, it just scores them poorly
  * (SentencePiece's byte-fallback idea at codepoint granularity). */
object UnigramExprs {

  private val Whitespace = java.util.regex.Pattern.compile("\\s+")

  sealed trait UnigramBase { self: Expression =>
    def model: Seq[(String, Double)]
    def oovLogProb: Double

    @transient protected lazy val probs: java.util.HashMap[String, java.lang.Double] = {
      val m = new java.util.HashMap[String, java.lang.Double](model.size * 2)
      model.foreach { case (p, lp) => m.putIfAbsent(p, lp) }
      m
    }
    @transient protected lazy val maxLen: Int =
      if (model.isEmpty) 1
      else model.iterator.map(p => p._1.codePointCount(0, p._1.length)).max

    protected def splitWords(u: UTF8String): Array[String] =
      Whitespace.split(u.toString).filter(_.nonEmpty)

    /** Viterbi over one word's codepoints: best(i) = max_j best(j) +
      * logp(w[j,i)); returns the split points of the best path. */
    protected def segment(w: String): Array[String] = {
      // UTF-16 offset of each codepoint boundary, so pieces slice the
      // word string directly and never split surrogate pairs
      val n = w.codePointCount(0, w.length)
      val off = new Array[Int](n + 1)
      var ci = 0
      var cp = 0
      while (ci < w.length) {
        off(cp) = ci
        ci += Character.charCount(w.codePointAt(ci))
        cp += 1
      }
      off(n) = w.length
      val best = new Array[Double](n + 1)
      val from = new Array[Int](n + 1)
      java.util.Arrays.fill(best, Double.NegativeInfinity)
      best(0) = 0.0
      var i = 1
      while (i <= n) {
        var j = math.max(0, i - maxLen)
        // ascending j with strictly-greater replacement: on equal
        // scores the SMALLEST j (longest last piece) wins
        while (j < i) {
          val piece = w.substring(off(j), off(i))
          val lpBoxed = probs.get(piece)
          // a model hit at -Infinity (UnigramLm genuinely emits pruned-
          // to-zero single codepoints as coverage anchors) must behave
          // like a MISS so the single-char OOV fallback keeps every
          // word segmentable — otherwise an unreachable word would
          // silently emit as one bogus whole-word token
          val lp =
            if (lpBoxed != null &&
                lpBoxed.doubleValue() != Double.NegativeInfinity)
              lpBoxed.doubleValue()
            else if (i - j == 1) oovLogProb
            else Double.NegativeInfinity
          if (lp != Double.NegativeInfinity && best(j) + lp > best(i)) {
            best(i) = best(j) + lp
            from(i) = j
          }
          j += 1
        }
        i += 1
      }
      // walk back
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var k = n
      while (k > 0) {
        val j = from(k)
        out += w.substring(off(j), off(k))
        k = j
      }
      out.reverseIterator.toArray
    }
  }

  /** Token COUNT under the model — the budget-side hot path. */
  case class UnigramTokenCount(child: Expression,
                               model: Seq[(String, Double)],
                               oovLogProb: Double)
    extends UnaryExpression with UnigramBase {

    override def dataType: DataType = LongType
    override def nullable: Boolean = child.nullable

    @transient private lazy val memo =
      ThreadLocal.withInitial[java.util.HashMap[String, java.lang.Long]](() =>
        new java.util.HashMap[String, java.lang.Long]())

    def count(u: UTF8String): Long = {
      val cache = memo.get()
      var total = 0L
      val words = splitWords(u)
      var i = 0
      while (i < words.length) {
        val w = words(i)
        val hit = cache.get(w)
        val c: Long =
          if (hit != null) hit.longValue()
          else {
            val n = segment(w).length.toLong
            if (cache.size >= 65536) cache.clear()
            cache.put(w, java.lang.Long.valueOf(n))
            n
          }
        total += c
        i += 1
      }
      total
    }

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      val ref = ctx.addReferenceObj("uniCount", this,
        classOf[UnigramTokenCount].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.count($c);")
    }

    protected override def nullSafeEval(input: Any): Any =
      count(input.asInstanceOf[UTF8String])

    override protected def withNewChildInternal(c: Expression): UnigramTokenCount =
      copy(child = c)
  }

  /** Full tokenization (array of piece strings). */
  case class UnigramTokenize(child: Expression,
                             model: Seq[(String, Double)],
                             oovLogProb: Double)
    extends UnaryExpression with UnigramBase {

    override def dataType: DataType =
      ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = child.nullable

    def tokens(u: UTF8String): ArrayData = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Any]
      splitWords(u).foreach { w =>
        segment(w).foreach(t => out += UTF8String.fromString(t))
      }
      new GenericArrayData(out.toArray)
    }

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      val ref = ctx.addReferenceObj("uniTok", this,
        classOf[UnigramTokenize].getName)
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.tokens($c);")
    }

    protected override def nullSafeEval(input: Any): Any =
      tokens(input.asInstanceOf[UTF8String])

    override protected def withNewChildInternal(c: Expression): UnigramTokenize =
      copy(child = c)
  }

  def unigram_token_count(text: Column, model: Seq[(String, Double)],
                          oovLogProb: Double = -20.0): Column =
    GraftBridge.column(UnigramTokenCount(GraftBridge.expression(text),
      model, oovLogProb))

  def unigram_tokenize(text: Column, model: Seq[(String, Double)],
                       oovLogProb: Double = -20.0): Column =
    GraftBridge.column(UnigramTokenize(GraftBridge.expression(text),
      model, oovLogProb))
}
