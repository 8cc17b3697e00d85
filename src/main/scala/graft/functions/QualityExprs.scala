package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ONE fused text walk for the stacked quality-signal stages.
  *
  * A curation pipeline with `c4_rules` + `gopher_rules` + line stats
  * live re-tokenized every surviving document ~5× — each stage's
  * built-in `split`/`filter`/`aggregate` chain allocated its own token
  * and line arrays, and Catalyst does not CSE across `withColumn`
  * chains of that shape. At the 100 TB design point that redundant
  * re-tokenization was the single largest avoidable CPU cost in the
  * curation path (round-12 review), so [[walkStats]] computes EVERY
  * line/word/symbol statistic those stages consume in a handful of
  * allocation-free linear scans, and the stage operators become thin
  * wrappers over it — semantics pinned by their existing oracle gates
  * staying green over the fused implementation.
  *
  * The walk is exposed through FOUR deliberately-shaped expressions:
  *
  *   - [[TextQualitySignals]] — the full stats struct, for the REPORT
  *     surfaces ([[graft.llm.TextAnalysis.gopherSignals]],
  *     [[graft.llm.Repetition.lineStats]]): one projection, read by
  *     cheap `GetStructField`s.
  *   - [[QualityKeep]] — a BOOLEAN keep decision with the thresholds
  *     baked in, for the FILTER surfaces
  *     ([[graft.llm.TextAnalysis.gopherFilter]],
  *     [[graft.llm.Repetition.filterDuplicateUnits]], the fused
  *     `gopher_rules` curation stage). Filtering on the struct's
  *     derived columns instead would let predicate pushdown substitute
  *     each signal alias with its own copy of the walk — the measured
  *     plan inlined it 20× — whereas a single boolean evaluates the
  *     walk ONCE and the filter sits scan-adjacent, exactly where a
  *     100 TB filter belongs.
  *   - [[C4Keep]] / [[C4KeptText]] — the C4 page decision (boolean;
  *     counts kept-sentence marks without building the kept string)
  *     and the kept-text rebuild (string; survivors only), so the C4
  *     stage costs one deciding walk per row plus one rebuild walk per
  *     SURVIVOR.
  *
  * Field semantics replicate the EXACT built-in-expression formulas the
  * views previously spelled out (the DuckDB oracles re-derive those
  * formulas independently, so drift fails the gate):
  *
  *   - words / word_chars / alpha_words — maximal runs of
  *     non-whitespace (Java `\s` = ASCII space, tab, LF, VT, FF, CR;
  *     the `split(t, "\\s+")` tokenization), char counts in CODEPOINTS
  *     (Spark `length` semantics), alpha = contains `[A-Za-z]`;
  *   - hashes / ell3 / ellc — `#` count, non-overlapping left-to-right
  *     `...` count, `…` count (the Gopher symbol numerators; the
  *     filter caps hash/word and ellipsis/word SEPARATELY at the
  *     paper's 0.1);
  *   - stop_hits — DISTINCT hits among the 8 Gopher stop words as
  *     `\b<w>\b` whole-word matches on the lowercased text. Matching is
  *     ASCII case-insensitive over maximal `[A-Za-z0-9_]` runs — the
  *     documented contract; it agrees with `lower(t) rlike \b..\b` for
  *     every text whose lowercasing preserves `\W` structure (all-ASCII
  *     and all common scripts);
  *   - n_lines / bullet_lines / ellipsis_lines — non-blank lines of
  *     `split(t, "\n")` where blank = empty after `trim` (which strips
  *     0x20 SPACES only — a tab-only line is NON-blank, exactly the
  *     built-in's behavior), bullet = first char after leading spaces
  *     in `[•‣▪*-]`, ellipsis = line matches `(\.\.\.|…)\s*$`;
  *   - dl_* — duplicate-line stats over the same non-blank lines:
  *     distinct count and codepoint masses (total and over first
  *     occurrences), the `array_distinct` formulation;
  *   - n_paras / dp_* — the same over paragraphs split on the regex
  *     `\n\s*\n` (greedy: a separator runs from the first to the LAST
  *     newline of a whitespace run, Java `split` semantics);
  *   - C4 kept text / marks — the C4 line keep-rule (>= minWordsPerLine
  *     words, terminal `[.!?"”]` after trailing whitespace, no
  *     case-insensitive "javascript") applied to every line, kept
  *     lines re-joined with `\n`, marks = count of `.`/`!`/`?` in the
  *     kept text.
  *
  * Null text yields null (null-intolerant expressions), which
  * reproduces each view's previous null behavior;
  * [[graft.llm.Repetition.lineStats]] coalesces to "" on its side, as
  * before. All four are pure per-row projections/predicates — no
  * shuffle, they stream unchanged, same scale shape as the chains they
  * replace, minus the ~5 redundant tokenizations per document.
  */
object QualityExprs {

  /** The Gopher stop words (Rae 2021 A1.1), lowercase. */
  private[functions] val StopWords: Array[String] =
    Array("the", "be", "to", "of", "and", "that", "have", "with")

  // Java \s — the ASCII whitespace set of the split("\\s+") tokenizer
  @inline private def isJavaWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'

  @inline private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'

  @inline private def asciiLower(c: Char): Char =
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else c

  /** Codepoints in s[a, b) — Spark `length` counts codepoints where
    * Java String length counts UTF-16 units. */
  @inline private def cp(s: String, a: Int, b: Int): Long =
    s.codePointCount(a, b).toLong

  /** One document's fused statistics (mutable scratch, one per row). */
  private[functions] final class Stats {
    var words = 0L; var wordChars = 0L; var alphaWords = 0L
    var hashes = 0L; var ell3 = 0L; var ellc = 0L; var stopHits = 0L
    var nLines = 0L; var bulletLines = 0L; var ellipsisLines = 0L
    var dlDistinct = 0L; var dlChars = 0L; var dlDistinctChars = 0L
    var nParas = 0L; var dpDistinct = 0L; var dpChars = 0L
    var dpDistinctChars = 0L
    var c4Marks = 0L
    var c4Kept: String = null
  }

  /** C4 handling inside the walk: 0 = skip entirely, 1 = count the
    * kept-sentence marks only (the keep DECISION), 2 = also build the
    * kept text (the survivor REWRITE). */
  private[functions] val C4Off = 0
  private[functions] val C4Count = 1
  private[functions] val C4Build = 2

  /** The fused walk. `withDup` gates the duplicate line/paragraph unit
    * sets (a HashSet per family) so decision-only callers skip the
    * allocations; everything else is counter arithmetic over linear
    * char scans. */
  private[functions] def walkStats(u: UTF8String, minWordsPerLine: Int,
                                   c4Mode: Int, withDup: Boolean): Stats = {
    val s = u.toString
    val n = s.length
    val st = new Stats

    // ---- scan 1: whitespace-token words + symbol counters + word-
    // char-run stop-word hits, one pass over the chars ----------------
    var inWord = false; var wordHasAlpha = false
    var dotRun = 0
    var stopMask = 0
    var runStart = -1 // current [A-Za-z0-9_] run for stop words
    var i = 0
    while (i <= n) {
      val c = if (i < n) s.charAt(i) else ' '
      val ws = i == n || isJavaWs(c)
      // \s+ tokenization
      if (ws) {
        if (inWord) {
          st.words += 1
          if (wordHasAlpha) st.alphaWords += 1
          inWord = false; wordHasAlpha = false
        }
      } else {
        inWord = true
        if (!Character.isLowSurrogate(c)) st.wordChars += 1
        if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z'))
          wordHasAlpha = true
      }
      // symbol numerators ("..." counted per maximal dot run / 3 —
      // identical to left-to-right non-overlapping regex replacement)
      if (i < n) {
        if (c == '#') st.hashes += 1
        else if (c == '…') st.ellc += 1
        if (c == '.') dotRun += 1
        else { st.ell3 += dotRun / 3; dotRun = 0 }
      } else st.ell3 += dotRun / 3
      // stop words: maximal word-char runs, compared ASCII-folded
      val w = i < n && isWordChar(c)
      if (w) { if (runStart < 0) runStart = i }
      else if (runStart >= 0) {
        val len = i - runStart
        if (len >= 2 && len <= 4 && stopMask != 0xFF) {
          var k = 0
          while (k < StopWords.length) {
            val sw = StopWords(k)
            if ((stopMask & (1 << k)) == 0 && sw.length == len) {
              var j = 0
              while (j < len &&
                asciiLower(s.charAt(runStart + j)) == sw.charAt(j)) j += 1
              if (j == len) stopMask |= 1 << k
            }
            k += 1
          }
        }
        runStart = -1
      }
      i += 1
    }
    st.stopHits = java.lang.Integer.bitCount(stopMask).toLong

    // ---- scan 2: lines — blank test, bullet/ellipsis rules, dup
    // stats, and the C4 keep-rule per line -----------------------------
    val lineSet = if (withDup) new java.util.HashSet[String]() else null
    val kept =
      if (c4Mode == C4Build) new java.lang.StringBuilder(n) else null

    def processLine(a: Int, b: Int): Unit = {
      // blank = empty after trim, and trim strips SPACES only
      var t = a
      while (t < b && s.charAt(t) == ' ') t += 1
      if (t < b) {
        st.nLines += 1
        // bullet: first char after leading spaces
        val f = s.charAt(t)
        if (f == '•' || f == '‣' || f == '▪' || f == '*' || f == '-')
          st.bulletLines += 1
        // ellipsis end: strip trailing \s, check "..." or '…'
        var e = b
        while (e > a && isJavaWs(s.charAt(e - 1))) e -= 1
        if (e > a && (s.charAt(e - 1) == '…' ||
          (e - a >= 3 && s.charAt(e - 1) == '.' && s.charAt(e - 2) == '.' &&
            s.charAt(e - 3) == '.'))) st.ellipsisLines += 1
        // duplicate-line stats on the EXACT (untrimmed) unit string
        if (withDup) {
          val unit = s.substring(a, b)
          val chars = cp(s, a, b)
          st.dlChars += chars
          if (lineSet.add(unit)) {
            st.dlDistinct += 1; st.dlDistinctChars += chars
          }
        }
      }
      if (c4Mode != C4Off) {
        // C4 keep rule: >= minWordsPerLine \s+-words, terminal
        // punctuation after trailing whitespace, no "javascript"
        var e = b
        while (e > a && isJavaWs(s.charAt(e - 1))) e -= 1
        val term = e > a && {
          val lc = s.charAt(e - 1)
          lc == '.' || lc == '!' || lc == '?' || lc == '"' || lc == '”'
        }
        if (term && lineWords(s, a, b) >= minWordsPerLine &&
          !containsJavascript(s, a, b)) {
          if (kept != null && kept.length() > 0) kept.append('\n')
          var j = a
          while (j < b) {
            val c = s.charAt(j)
            if (c == '.' || c == '!' || c == '?') st.c4Marks += 1
            if (kept != null) kept.append(c)
            j += 1
          }
        }
      }
    }

    var ls = 0
    var pos = 0
    while (pos <= n) {
      if (pos == n || s.charAt(pos) == '\n') {
        processLine(ls, pos)
        ls = pos + 1
      }
      pos += 1
    }
    if (kept != null) st.c4Kept = kept.toString

    // ---- scan 3: paragraphs — split on the regex \n\s*\n (greedy:
    // the separator runs to the LAST newline of a whitespace run) -----
    if (withDup) {
      val paraSet = new java.util.HashSet[String]()
      def processPara(a: Int, b: Int): Unit = {
        var t = a
        while (t < b && s.charAt(t) == ' ') t += 1
        if (t < b) {
          st.nParas += 1
          val unit = s.substring(a, b)
          val chars = cp(s, a, b)
          st.dpChars += chars
          if (paraSet.add(unit)) {
            st.dpDistinct += 1; st.dpDistinctChars += chars
          }
        }
      }
      var prev = 0
      var p = 0
      while (p < n) {
        if (s.charAt(p) == '\n') {
          var j = p; var lastNl = p
          while (j < n && isJavaWs(s.charAt(j))) {
            if (s.charAt(j) == '\n') lastNl = j
            j += 1
          }
          if (lastNl > p) {
            processPara(prev, p)
            prev = lastNl + 1
            p = lastNl + 1
          } else p += 1
        } else p += 1
      }
      processPara(prev, n)
    }
    st
  }

  /** `size(filter(split(l, "\\s+"), len > 0))` of the line [a, b) —
    * maximal non-whitespace runs. */
  private def lineWords(s: String, a: Int, b: Int): Int = {
    var count = 0; var in = false; var j = a
    while (j < b) {
      if (isJavaWs(s.charAt(j))) in = false
      else if (!in) { count += 1; in = true }
      j += 1
    }
    count
  }

  /** ASCII case-insensitive "javascript" substring search over
    * [a, b) — equivalent to `lower(l).contains("javascript")` for
    * every input (the pattern is all-ASCII and no Unicode char
    * lowercases into a contiguous ASCII "javascript" fragment). */
  private def containsJavascript(s: String, a: Int, b: Int): Boolean = {
    val pat = "javascript"
    val last = b - pat.length
    var j = a
    while (j <= last) {
      var k = 0
      while (k < pat.length && asciiLower(s.charAt(j + k)) == pat.charAt(k)) k += 1
      if (k == pat.length) return true
      j += 1
    }
    false
  }

  /** Spark `round(x, roundTo)` on doubles: HALF_UP decimal rounding. */
  @inline private def round6(x: Double, scale: Int): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()

  private val Fields = StructType(Seq(
    StructField("words", LongType, nullable = false),
    StructField("word_chars", LongType, nullable = false),
    StructField("alpha_words", LongType, nullable = false),
    StructField("hashes", LongType, nullable = false),
    StructField("ell3", LongType, nullable = false),
    StructField("ellc", LongType, nullable = false),
    StructField("stop_hits", LongType, nullable = false),
    StructField("n_lines", LongType, nullable = false),
    StructField("bullet_lines", LongType, nullable = false),
    StructField("ellipsis_lines", LongType, nullable = false),
    StructField("dl_distinct", LongType, nullable = false),
    StructField("dl_chars", LongType, nullable = false),
    StructField("dl_distinct_chars", LongType, nullable = false),
    StructField("n_paras", LongType, nullable = false),
    StructField("dp_distinct", LongType, nullable = false),
    StructField("dp_chars", LongType, nullable = false),
    StructField("dp_distinct_chars", LongType, nullable = false)))

  /** The full stats struct — the REPORT surface. One walk; consumers
    * read fields with cheap `GetStructField`s. */
  case class TextQualitySignals(child: Expression) extends UnaryExpression {

    override def dataType: DataType = Fields
    override def nullable: Boolean = child.nullable

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      val ref = ctx.addReferenceObj("qualitySignals", this,
        classOf[TextQualitySignals].getName)
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.walk($c);")
    }

    protected override def nullSafeEval(input: Any): Any =
      walk(input.asInstanceOf[UTF8String])

    def walk(u: UTF8String): InternalRow = {
      val st = walkStats(u, 1, C4Off, withDup = true)
      new GenericInternalRow(Array[Any](
        st.words, st.wordChars, st.alphaWords, st.hashes, st.ell3,
        st.ellc, st.stopHits, st.nLines, st.bulletLines,
        st.ellipsisLines, st.dlDistinct, st.dlChars, st.dlDistinctChars,
        st.nParas, st.dpDistinct, st.dpChars, st.dpDistinctChars))
    }

    override protected def withNewChildInternal(c: Expression): TextQualitySignals =
      copy(child = c)
  }

  /** The Gopher Table-A1.1 document thresholds (Rae 2021 defaults).
    * The bullet cap is the paper's 0.9 — the rule removes pages where
    * MORE than 90% of lines start with a bullet — and the 0.1 symbol
    * cap applies to the hash ratio and the ellipsis ratio SEPARATELY. */
  final case class GopherThresholds(
      minWords: Long = 50, maxWords: Long = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, maxBulletFrac: Double = 0.9,
      maxEllipsisFrac: Double = 0.3, minAlphaFrac: Double = 0.8,
      minStopwords: Long = 2)

  /** Gopher's duplicate line/paragraph caps (A1.1: 0.30 by count, 0.20
    * by character mass), compared on the round-to-6 fractions — the
    * exact formulation of [[graft.llm.Repetition.lineStats]]. */
  final case class DupUnitThresholds(
      maxDupLineFrac: Double = 0.3, maxDupParaFrac: Double = 0.3,
      maxDupLineCharFrac: Double = 0.2, maxDupParaCharFrac: Double = 0.2,
      roundTo: Int = 6)

  /** Boolean keep decision over the fused walk — the FILTER surface.
    * Baking the thresholds into ONE boolean (instead of filtering on
    * the struct's derived columns) keeps the walk evaluated once: a
    * column-wise filter lets predicate pushdown substitute every
    * signal alias with its own copy of the walk (measured: 20 copies),
    * and parks the whole decision scan-adjacent where a 100 TB filter
    * belongs. Semantics are exactly the corresponding column filters'. */
  case class QualityKeep(
      child: Expression,
      gopher: Option[GopherThresholds],
      dup: Option[DupUnitThresholds])
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.Predicate {

    require(gopher.isDefined || dup.isDefined,
      "QualityKeep with no thresholds keeps everything — drop the filter")

    override def nullable: Boolean = child.nullable

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      val ref = ctx.addReferenceObj("qualityKeep", this,
        classOf[QualityKeep].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.keep($c);")
    }

    protected override def nullSafeEval(input: Any): Any =
      keep(input.asInstanceOf[UTF8String])

    def keep(u: UTF8String): Boolean = {
      val st = walkStats(u, 1, C4Off, withDup = dup.isDefined)
      val wordsD = math.max(st.words.toDouble, 1.0)
      val linesD = math.max(st.nLines.toDouble, 1.0)
      val gOk = gopher.forall { g =>
        st.words >= g.minWords && st.words <= g.maxWords && {
          val mean = st.wordChars.toDouble / wordsD
          mean >= g.minMeanWordLen && mean <= g.maxMeanWordLen
        } &&
          st.hashes.toDouble / wordsD <= g.maxSymbolRatio &&
          (st.ell3 + st.ellc).toDouble / wordsD <= g.maxSymbolRatio &&
          st.bulletLines.toDouble / linesD <= g.maxBulletFrac &&
          st.ellipsisLines.toDouble / linesD <= g.maxEllipsisFrac &&
          st.alphaWords.toDouble / wordsD >= g.minAlphaFrac &&
          st.stopHits >= g.minStopwords
      }
      def frac(num: Long, den: Long, scale: Int): Double =
        if (den > 0) round6(num.toDouble / den.toDouble, scale) else 0.0
      gOk && dup.forall { d =>
        frac(st.nLines - st.dlDistinct, st.nLines, d.roundTo) <=
          d.maxDupLineFrac &&
          frac(st.nParas - st.dpDistinct, st.nParas, d.roundTo) <=
            d.maxDupParaFrac &&
          frac(st.dlChars - st.dlDistinctChars, st.dlChars, d.roundTo) <=
            d.maxDupLineCharFrac &&
          frac(st.dpChars - st.dpDistinctChars, st.dpChars, d.roundTo) <=
            d.maxDupParaCharFrac
      }
    }

    override protected def withNewChildInternal(c: Expression): QualityKeep =
      copy(child = c)
  }

  /** The C4 page decision (Raffel 2020 §2.2 line rules + kept-sentence
    * floor) WITHOUT building the kept string — one walk per row; the
    * content-based page drops (brace / "lorem ipsum" / bad words) stay
    * cheap built-in `contains`/`rlike` conditions beside it. */
  case class C4Keep(child: Expression, minWordsPerLine: Int,
                    minSentences: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.Predicate {

    require(minWordsPerLine >= 1,
      s"minWordsPerLine must be >= 1: $minWordsPerLine")
    require(minSentences >= 1, s"minSentences must be >= 1: $minSentences")

    override def nullable: Boolean = child.nullable

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      val ref = ctx.addReferenceObj("c4Keep", this, classOf[C4Keep].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.keep($c);")
    }

    protected override def nullSafeEval(input: Any): Any =
      keep(input.asInstanceOf[UTF8String])

    def keep(u: UTF8String): Boolean =
      walkStats(u, minWordsPerLine, C4Count,
        withDup = false).c4Marks >= minSentences

    override protected def withNewChildInternal(c: Expression): C4Keep =
      copy(child = c)
  }

  /** The C4 kept-text rebuild — runs AFTER [[C4Keep]] filtered, so only
    * survivors pay the string build. */
  case class C4KeptText(child: Expression, minWordsPerLine: Int)
    extends UnaryExpression {

    require(minWordsPerLine >= 1,
      s"minWordsPerLine must be >= 1: $minWordsPerLine")

    override def dataType: DataType = StringType
    override def nullable: Boolean = child.nullable

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      val ref = ctx.addReferenceObj("c4Kept", this,
        classOf[C4KeptText].getName)
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $ref.kept($c);")
    }

    protected override def nullSafeEval(input: Any): Any =
      kept(input.asInstanceOf[UTF8String])

    def kept(u: UTF8String): UTF8String = UTF8String.fromString(
      walkStats(u, minWordsPerLine, C4Build, withDup = false).c4Kept)

    override protected def withNewChildInternal(c: Expression): C4KeptText =
      copy(child = c)
  }

  /** Column wrappers. */
  def qualitySignals(text: Column): Column =
    GraftBridge.column(TextQualitySignals(GraftBridge.expression(text)))

  def qualityKeep(text: Column, gopher: Option[GopherThresholds],
                  dup: Option[DupUnitThresholds]): Column =
    GraftBridge.column(QualityKeep(GraftBridge.expression(text), gopher, dup))

  def c4Keep(text: Column, minWordsPerLine: Int, minSentences: Int): Column =
    GraftBridge.column(C4Keep(GraftBridge.expression(text),
      minWordsPerLine, minSentences))

  def c4KeptText(text: Column, minWordsPerLine: Int): Column =
    GraftBridge.column(C4KeptText(GraftBridge.expression(text),
      minWordsPerLine))
}
