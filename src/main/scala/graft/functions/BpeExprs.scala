package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.GraftBridge
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenization as native Catalyst expressions, so
  * token BUDGETS (`Sampling.tokenBudget`, `Packing`, `Chunking`) can be
  * measured in real tokenizer tokens instead of caller-supplied counts.
  *
  * The algorithm is the published subword BPE of Sennrich, Haddow &
  * Birch 2016 ("Neural Machine Translation of Rare Words with Subword
  * Units", ACL): a word is its codepoint symbols plus a terminal
  * `</w>` marker, and the user-supplied MERGES — an ordered list of
  * symbol pairs, the artifact BPE training produces — apply by
  * priority: at each step the present pair with the lowest merge rank
  * fuses at every occurrence, until no mergeable pair remains. The
  * merges file uses the standard published format (one `left right`
  * pair per line, optional `#version` header, `#` comments / blank
  * lines skipped) so any publicly trained merges list drops in.
  *
  * Pre-tokenization is whitespace splitting (the paper's formulation;
  * byte-level GPT-2 pre-tokenization differs — documented contract).
  * Unknown symbols simply never merge: an out-of-vocabulary word costs
  * one token per codepoint + 1, which is exactly the budget-inflation
  * signal a token-budget cut wants to see.
  *
  * Scale shape: pure per-row projection inside whole-stage codegen —
  * no shuffle, no UDF. The merge ranks ride the expression as one
  * broadcast-sized reference object; a per-thread memo caches word →
  * token-count (real corpora repeat words heavily, the same reason
  * production BPE tokenizers cache).
  */
object BpeExprs {

  val EndOfWord = "</w>"

  /** Parse a merges file body (already-read lines): `left right` pairs
    * in priority order; `#…` comments, a `#version` header, and blank
    * lines are skipped. Loud on malformed lines — a silently dropped
    * merge would change every count downstream. */
  def parseMerges(lines: Iterator[String]): Seq[(String, String)] = {
    val out = Vector.newBuilder[(String, String)]
    var n = 0
    lines.foreach { raw =>
      n += 1
      val line = raw.trim
      if (line.nonEmpty && !line.startsWith("#")) {
        val parts = line.split(" ")
        require(parts.length == 2,
          s"malformed merges line $n: '$raw' (expected 'left right')")
        out += ((parts(0), parts(1)))
      }
    }
    out.result()
  }

  /** Load merges from a local file path (driver-side; the parsed list
    * ships to executors inside the expression). */
  def loadMerges(path: String): Seq[(String, String)] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try parseMerges(src.getLines()) finally src.close()
  }

  /** Greedy lowest-rank-first merge loop over one word's symbols —
    * merging in rank order is exactly how the merges were learned, so
    * encoding replays training. Shared by both expressions. */
  private[functions] def encodeWord(word: String,
                                    ranks: java.util.HashMap[String, Integer])
      : Array[String] = {
    if (word.isEmpty) return Array.empty
    // codepoint symbols (never splitting surrogate pairs) + </w>
    val cps = word.codePoints().toArray
    var syms = new Array[String](cps.length + 1)
    var i = 0
    while (i < cps.length) {
      syms(i) = new String(Character.toChars(cps(i))); i += 1
    }
    syms(cps.length) = EndOfWord
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestA: String = null
      var bestB: String = null
      i = 0
      while (i < syms.length - 1) {
        val r = ranks.get(syms(i) + " " + syms(i + 1))
        if (r != null && r < bestRank) {
          bestRank = r; bestA = syms(i); bestB = syms(i + 1)
        }
        i += 1
      }
      if (bestA == null) done = true
      else {
        // fuse EVERY occurrence of the winning pair, left to right
        val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == bestA && syms(j + 1) == bestB) {
            out += bestA + bestB; j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.toArray
      }
    }
    syms
  }

  private val Whitespace = java.util.regex.Pattern.compile("\\s+")

  /** Common machinery: the rank lookup (built once per deserialized
    * expression) and a per-thread word → count memo. */
  sealed trait BpeBase { self: Expression =>
    def merges: Seq[(String, String)]

    @transient protected lazy val ranks: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](merges.size * 2)
      merges.zipWithIndex.foreach { case ((a, b), i) =>
        // first occurrence wins, matching published tokenizers'
        // handling of duplicate lines
        m.putIfAbsent(a + " " + b, Integer.valueOf(i))
      }
      m
    }

    protected def splitWords(u: UTF8String): Array[String] =
      Whitespace.split(u.toString).filter(_.nonEmpty)
  }

  /** Token COUNT under the merges — the budget-side hot path: counts
    * symbols without materializing token strings per row, with a
    * per-thread bounded memo (word → count). */
  case class BpeTokenCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with BpeBase {

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
            val n = encodeWord(w, ranks).length.toLong
            // bounded memo: real corpora follow Zipf — 64k distinct
            // words cover the mass; reset rather than LRU-churn
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
      val ref = ctx.addReferenceObj("bpeCount", this,
        classOf[BpeTokenCount].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.count($c);")
    }

    protected override def nullSafeEval(input: Any): Any =
      count(input.asInstanceOf[UTF8String])

    override protected def withNewChildInternal(c: Expression): BpeTokenCount =
      copy(child = c)
  }

  /** Full tokenization (array of token strings) — the inspection /
    * vocabulary-mapping face; tests pin the published worked example
    * through it. */
  case class BpeTokenize(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with BpeBase {

    override def dataType: DataType =
      ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = child.nullable

    def tokens(u: UTF8String): ArrayData = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Any]
      splitWords(u).foreach { w =>
        encodeWord(w, ranks).foreach(t => out += UTF8String.fromString(t))
      }
      new GenericArrayData(out.toArray)
    }

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      val ref = ctx.addReferenceObj("bpeTok", this,
        classOf[BpeTokenize].getName)
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.tokens($c);")
    }

    protected override def nullSafeEval(input: Any): Any =
      tokens(input.asInstanceOf[UTF8String])

    override protected def withNewChildInternal(c: Expression): BpeTokenize =
      copy(child = c)
  }

  def bpe_token_count(text: Column, merges: Seq[(String, String)]): Column =
    GraftBridge.column(BpeTokenCount(GraftBridge.expression(text), merges))

  def bpe_tokenize(text: Column, merges: Seq[(String, String)]): Column =
    GraftBridge.column(BpeTokenize(GraftBridge.expression(text), merges))
}
