package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Apply side of the WordPiece tokenizer (BERT's): greedy
  * LONGEST-MATCH-FIRST against the vocabulary, continuations carrying
  * the `##` prefix, whole word → `[UNK]` when any position fails to
  * match (the published WordPiece contract — one dead position voids
  * the word, unlike BPE/unigram which always segment). Words longer
  * than `maxInputChars` codepoints are `[UNK]` outright (BERT's 200
  * guard — a pathological megaword would otherwise cost O(len²)).
  *
  * Same house shape as [[BpeExprs]]/[[UnigramExprs]]: vocabulary
  * compiles once per deserialized expression into a java HashSet
  * (reference-object pattern, codegen-friendly), per-thread Zipf word
  * memo, COUNT variant materializes no token strings. */
object WordPieceExprs {

  val Unk = "[UNK]"
  private val Whitespace = java.util.regex.Pattern.compile("\\s+")

  sealed trait WordPieceBase { self: Expression =>
    def vocab: Seq[String]
    def maxInputChars: Int

    @transient protected lazy val pieces: java.util.HashSet[String] = {
      val s = new java.util.HashSet[String](vocab.size * 2)
      vocab.foreach(s.add)
      s
    }

    protected def splitWords(u: UTF8String): Array[String] =
      Whitespace.split(u.toString).filter(_.nonEmpty)

    /** Greedy longest-match-first; null = unmatchable → [UNK]. */
    protected def segment(w: String): Array[String] = {
      val n = w.codePointCount(0, w.length)
      if (n > maxInputChars) return null
      val off = new Array[Int](n + 1)
      var ci = 0
      var cp = 0
      while (ci < w.length) {
        off(cp) = ci
        ci += Character.charCount(w.codePointAt(ci))
        cp += 1
      }
      off(n) = w.length
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var start = 0
      while (start < n) {
        var end = n
        var found: String = null
        while (found == null && end > start) {
          val sub0 = w.substring(off(start), off(end))
          val sub = if (start > 0) "##" + sub0 else sub0
          if (pieces.contains(sub)) found = sub
          else end -= 1
        }
        if (found == null) return null
        out += found
        start = end
      }
      out.toArray
    }
  }

  /** Token COUNT (every [UNK] word counts 1). */
  case class WordPieceTokenCount(child: Expression, vocab: Seq[String],
                                 maxInputChars: Int)
    extends UnaryExpression with WordPieceBase {

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
            val seg = segment(w)
            val m = if (seg == null) 1L else seg.length.toLong
            if (cache.size >= 65536) cache.clear()
            cache.put(w, java.lang.Long.valueOf(m))
            m
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
      val ref = ctx.addReferenceObj("wpCount", this,
        classOf[WordPieceTokenCount].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.count($c);")
    }

    protected override def nullSafeEval(input: Any): Any =
      count(input.asInstanceOf[UTF8String])

    override protected def withNewChildInternal(c: Expression): WordPieceTokenCount =
      copy(child = c)
  }

  /** Full tokenization (array of piece strings, [UNK] for dead words). */
  case class WordPieceTokenize(child: Expression, vocab: Seq[String],
                               maxInputChars: Int)
    extends UnaryExpression with WordPieceBase {

    override def dataType: DataType =
      ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = child.nullable

    def tokens(u: UTF8String): ArrayData = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Any]
      splitWords(u).foreach { w =>
        val seg = segment(w)
        if (seg == null) out += UTF8String.fromString(Unk)
        else seg.foreach(t => out += UTF8String.fromString(t))
      }
      new GenericArrayData(out.toArray)
    }

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      val ref = ctx.addReferenceObj("wpTok", this,
        classOf[WordPieceTokenize].getName)
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.tokens($c);")
    }

    protected override def nullSafeEval(input: Any): Any =
      tokens(input.asInstanceOf[UTF8String])

    override protected def withNewChildInternal(c: Expression): WordPieceTokenize =
      copy(child = c)
  }

  def wordpiece_token_count(text: Column, vocab: Seq[String],
                            maxInputChars: Int = 200): Column =
    GraftBridge.column(WordPieceTokenCount(GraftBridge.expression(text),
      vocab, maxInputChars))

  def wordpiece_tokenize(text: Column, vocab: Seq[String],
                         maxInputChars: Int = 200): Column =
    GraftBridge.column(WordPieceTokenize(GraftBridge.expression(text),
      vocab, maxInputChars))
}
