package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines (north-star surface):
  * token counting, quality scoring, language ID, fingerprinting.
  * Every operator is a pure projection over built-in expressions —
  * whole-stage-codegen'd, shuffle-free, trivially 100 TB-scalable.
  */
object TextAnalysis {

  /** Whitespace token count. */
  def wordCount(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** BPE-ish token estimate: runs of letters, runs of digits, and single
    * other non-space chars count as one token each (GPT-2-ish regex
    * families); a cheap, deterministic proxy for tokenizer load. */
  def tokenCountEstimate(text: Column): Column =
    size(regexp_extract_all(text, lit("[\\p{L}]+|[\\p{N}]+|[^\\p{L}\\p{N}\\s]"), lit(0)))

  /** The pinned mojibake table: the most common UTF-8-bytes-decoded-
    * as-cp1252 artifacts in web crawls, each mapped back to the
    * character the author typed. The bad sequences are DERIVED from
    * the good characters by the artifact's own definition — the cp1252
    * view of the character's UTF-8 bytes — so the table cannot carry a
    * hand-typed byte error, and the source stays ASCII (every good
    * char is a \u escape). Pairs apply longest-bad-first, which makes
    * the shared `0xE2 0x80` prefix of the punctuation triples safe.
    * Every entry is a full derived sequence — a bare `â€` residue rule
    * was considered and REJECTED: it would also rewrite a legitimate
    * â+€ adjacency (including one this very chain just repaired from
    * `Ã¢` + euro), silently corrupting clean text. One decode
    * generation only — doubly-encoded text is out of scope by design.
    * The misdecoded no-break space normalizes to a plain space. */
  val MojibakeFixes: Seq[(String, String)] = {
    def asMojibake(good: String): String = new String(
      good.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      java.nio.charset.Charset.forName("windows-1252"))
    val restored = Seq(
      "\u2019", "\u2018", "\u201C", "\u201D",                 // curly quotes
      "\u2013", "\u2014", "\u2026", "\u2022",                 // dashes/ellipsis/bullet
      "\u00E1", "\u00E9", "\u00ED", "\u00F3", "\u00FA",      // a e i o u acute
      "\u00E0", "\u00E8", "\u00EC", "\u00F2", "\u00F9",      // grave
      "\u00E2", "\u00EA", "\u00EE", "\u00F4", "\u00FB",      // circumflex
      "\u00E4", "\u00EB", "\u00EF", "\u00F6", "\u00FC",      // diaeresis
      "\u00F1", "\u00E7", "\u00DF",                          // n-tilde, cedilla, eszett
      "\u00C9", "\u00C7", "\u00D6", "\u00DC",                 // uppercase
      "\u00AB", "\u00BB", "\u00B0", "\u00B7")                 // guillemets, deg, middot
      .map(g => asMojibake(g) -> g)
    val normalized = Seq(asMojibake("\u00A0") -> " ")           // nbsp -> space
    (restored ++ normalized).sortBy(-_._1.length)
  }

  /** Mojibake repair (ftfy-lite): literal replacement of every
    * [[MojibakeFixes]] sequence — a pure, shuffle-free projection.
    * Clean text passes through byte-identical. The DuckDB oracle's
    * replace-chain is GENERATED from the same table
    * ([[mojibakeSql]]), so the two sides cannot drift. */
  def fixMojibake(text: Column): Column =
    MojibakeFixes.foldLeft(text) { case (c, (bad, good)) =>
      // literal StringReplace — no regex engine on the per-document
      // hot path (and no quoting subtleties)
      replace(c, lit(bad), lit(good))
    }

  /** [[fixMojibake]] applied in place over `textCol`. */
  def fixMojibake(df: DataFrame, textCol: String): DataFrame =
    df.withColumn(textCol, fixMojibake(col(textCol)))

  /** The SQL replay of [[fixMojibake]]: a nested `replace(...)` chain
    * over `expr`, generated from [[MojibakeFixes]]. */
  def mojibakeSql(expr: String): String =
    MojibakeFixes.foldLeft(expr) { case (e, (bad, good)) =>
      def q(s: String) = "'" + s.replace("'", "''") + "'"
      s"replace($e, ${q(bad)}, ${q(good)})"
    }

  /** Crawl-cleaning HTML strip — the stage raw web text passes BEFORE
    * any other curation: drop script/style blocks with their contents,
    * strip remaining tags, decode the predefined XML entities (+nbsp),
    * collapse whitespace runs, trim. Regex-based by design: the right
    * tool for bulk crawl text where markup is routinely broken — not a
    * DOM parser, and never claims to be. Plain prose without markup,
    * entities, or whitespace runs passes through byte-identical.
    *
    * Decode order matters and is fixed: named/nbsp entities first,
    * `&amp;` LAST — decoding it earlier would turn `&amp;lt;` into a
    * freshly-decodable `&lt;` (double-decode corruption). No
    * backreferences in any pattern, so the same regexes replay on
    * RE2-based engines (the DuckDB oracle). Pure shuffle-free
    * projection, codegen'd like the rest of this module. */
  def stripHtml(text: Column): Column = {
    val noScript = regexp_replace(text, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "(?s)<[^>]+>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) => regexp_replace(c, e, r) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** [[stripHtml]] applied in place over `textCol`. */
  def stripHtml(df: DataFrame, textCol: String): DataFrame =
    df.withColumn(textCol, stripHtml(col(textCol)))

  /** Markdown strip — the README/forum-dump sibling of [[stripHtml]]:
    * reduce markdown markup to its prose so downstream quality /
    * repetition / dedup stages see the text, not the syntax. Order:
    * fenced code blocks drop WITH their contents first (code inside a
    * fence must not leak into the prose stream once the fence markers
    * vanish), then inline code spans, then image/link syntax keeps the
    * alt/anchor TEXT and drops the URL (`![a](u)` before `[a](u)` —
    * the image form is a prefix-superset), then heading/blockquote/
    * rule line markers, asterisk emphasis (keeps the inner text), and
    * finally the same whitespace collapse as [[stripHtml]].
    *
    * Every pattern is backreference-free, so the chain replays
    * identically on RE2-based engines (the DuckDB oracle — group
    * substitution spelled `\\1` there, `$1` here). Underscore
    * emphasis is deliberately left alone: `_` is routine in
    * identifiers and filenames, and mangling `my_var` is worse than
    * keeping a rare `_emphasis_` marker. Plain prose passes through
    * byte-identical. Pure shuffle-free projection. */
  def stripMarkdown(text: Column): Column = {
    val noFence = regexp_replace(text, "(?s)```.*?```", " ")
    val noInline = regexp_replace(noFence, "`[^`]*`", " ")
    val noImage = regexp_replace(noInline,
      "!\\[([^\\]]*)\\]\\([^)]*\\)", "$1")
    val noLink = regexp_replace(noImage,
      "\\[([^\\]]*)\\]\\([^)]*\\)", "$1")
    val noHeading = regexp_replace(noLink, "(?m)^#{1,6}[ \\t]+", "")
    val noQuote = regexp_replace(noHeading, "(?m)^>[ \\t]?", "")
    val noRule = regexp_replace(noQuote, "(?m)^[-*_]{3,}[ \\t]*$", "")
    val noEmph = regexp_replace(noRule, "\\*{1,2}([^*\\n]+)\\*{1,2}", "$1")
    trim(regexp_replace(noEmph, "\\s+", " "))
  }

  /** [[stripMarkdown]] applied in place over `textCol`. */
  def stripMarkdown(df: DataFrame, textCol: String): DataFrame =
    df.withColumn(textCol, stripMarkdown(col(textCol)))

  /** Quality metrics + a composite score in [0,1]. All ratios are over
    * character length; formula is deterministic and documented so the
    * oracle can mirror it. */
  def quality(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val len = length(t).cast("double")
    val words = wordCount(t).cast("double")
    val punct = length(regexp_replace(t, "[^.,;:!?]", "")).cast("double")
    val digits = length(regexp_replace(t, "[^0-9]", "")).cast("double")
    val upper = length(regexp_replace(t, "[^A-Z]", "")).cast("double")
    val avgWordLen = when(words > 0, (len - (words - 1)) / words).otherwise(lit(0.0))
    // score: long enough, low punct/digit noise, sane word length
    val score =
      least(len / 200.0, lit(1.0)) * 0.4 +
        (lit(1.0) - least(punct / greatest(len, lit(1.0)) * 10.0, lit(1.0))) * 0.2 +
        (lit(1.0) - least(digits / greatest(len, lit(1.0)) * 5.0, lit(1.0))) * 0.2 +
        when(avgWordLen >= 3 && avgWordLen <= 10, 1.0).otherwise(0.0) * 0.2
    df.withColumn("char_len", length(t).cast("long"))
      .withColumn("word_count", wordCount(t).cast("long"))
      .withColumn("avg_word_len", avgWordLen)
      .withColumn("punct_ratio", punct / greatest(len, lit(1.0)))
      .withColumn("digit_ratio", digits / greatest(len, lit(1.0)))
      .withColumn("upper_ratio", upper / greatest(len, lit(1.0)))
      .withColumn("quality_score", score)
  }

  /** C4 cleaning rules (Raffel et al. 2020, "Exploring the Limits of
    * Transfer Learning…", §2.2) — the OTHER canonical web-cleaning
    * recipe next to the Gopher-style [[Repetition]] thresholds, at
    * LINE granularity where Gopher works on token statistics:
    *
    *   - keep only lines ending in terminal punctuation (`.` `!` `?`
    *     or a closing quote), containing >= `minWordsPerLine` words,
    *     and not mentioning "javascript" (the boilerplate tell);
    *   - drop the whole page if the ORIGINAL text contains `{` (code),
    *     the phrase "lorem ipsum", or any word in `badWords`
    *     (word-boundary match, case-insensitive — the paper uses a
    *     public blocklist; pass your own);
    *   - drop pages whose KEPT text has fewer than `minSentences`
    *     sentences (proxied by `.`/`!`/`?` marks anywhere in the kept
    *     text — exact for punctuation-terminated lines; a line kept
    *     ONLY by its closing quote counts the marks inside the quote,
    *     so `…here.”` counts one and a punctuation-free quote counts
    *     zero).
    *
    * The paper's remaining rule — three-sentence-span dedup — is
    * [[SubstringDedup]]'s job at token granularity. Pure per-row
    * projection + filter: no shuffle, streams unchanged, every rule
    * replayable in SQL. */
  def c4Filter(df: DataFrame, textCol: String, minWordsPerLine: Int = 5,
               minSentences: Int = 3, badWords: Seq[String] = Nil)
      : DataFrame = {
    require(minWordsPerLine >= 1, s"minWordsPerLine >= 1: $minWordsPerLine")
    require(minSentences >= 1, s"minSentences >= 1: $minSentences")
    val t = col(textCol)
    // the keep DECISION is one fused-walk boolean
    // ([[graft.functions.QualityExprs.C4Keep]]: line keep-rule +
    // kept-sentence floor, no string build) that filters
    // scan-adjacent; only SURVIVORS pay the kept-text rebuild
    // ([[graft.functions.QualityExprs.C4KeptText]]) in the projection
    // above. The built-in split/filter/rlike chain this replaces
    // re-tokenized every document once per rule.
    // Page-level rules test the ORIGINAL text (the paper removes the
    // page for content anywhere on it, kept lines or not).
    val docBad = t.contains("{") || lower(t).contains("lorem ipsum") ||
      (if (badWords.isEmpty) lit(false)
       else lower(t).rlike(badWords.map(w =>
         "\\b" + java.util.regex.Pattern.quote(w.toLowerCase) + "\\b")
         .mkString("(", "|", ")")))
    df.filter(!docBad && graft.functions.QualityExprs
        .c4Keep(t, minWordsPerLine, minSentences))
      .withColumn(textCol,
        graft.functions.QualityExprs.c4KeptText(t, minWordsPerLine))
  }

  /** Gopher quality SIGNALS (Rae et al. 2021, "Scaling Language
    * Models…", Appendix A1.1) — the document-statistics canon next to
    * [[c4Filter]]'s line rules; [[gopherFilter]] applies the paper's
    * thresholds over these columns. Adds:
    *
    *   - `g_words`            whitespace-token count
    *   - `g_mean_word_len`    characters per word (codepoints)
    *   - `g_hash_ratio`       `#` occurrences / words
    *   - `g_ellipsis_ratio`   `...`/`…` occurrences / words (the paper
    *     caps the symbol-to-word ratio for the hash and the ellipsis
    *     SEPARATELY — a combined ratio would be strictly tighter than
    *     published)
    *   - `g_bullet_line_frac` lines starting with a bullet glyph
    *     (`•`/`‣`/`▪`/`-`/`*` after leading whitespace)
    *   - `g_ellipsis_line_frac` lines ending with `...`/`…`
    *   - `g_alpha_word_frac`  words containing >= 1 alphabetic char
    *   - `g_stopword_hits`    DISTINCT hits among the paper's 8 stop
    *     words (the, be, to, of, and, that, have, with) as whole
    *     lowercase words
    *
    * Every signal derives from ONE fused native text walk
    * ([[graft.functions.QualityExprs]] — the stacked built-in chains
    * re-tokenized each document once per signal family) — no shuffle,
    * streams, SQL-replayable. Empty/whitespace-only text yields 0
    * words and 0-valued ratios (the filter drops it on the word-count
    * floor, never on a NULL). */
  def gopherSignals(df: DataFrame, textCol: String): DataFrame = {
    Guards.requireFreshColumns(df, Seq("__gq", "g_words",
      "g_mean_word_len", "g_hash_ratio", "g_ellipsis_ratio",
      "g_bullet_line_frac", "g_ellipsis_line_frac",
      "g_alpha_word_frac", "g_stopword_hits"), "TextAnalysis.gopherSignals")
    val d = df.withColumn("__gq",
      graft.functions.QualityExprs.qualitySignals(col(textCol)))
    val q = col("__gq")
    val wordsD = greatest(q("words").cast("double"), lit(1.0))
    val linesD = greatest(q("n_lines").cast("double"), lit(1.0))
    d.withColumn("g_words", q("words"))
      .withColumn("g_mean_word_len", q("word_chars").cast("double") / wordsD)
      .withColumn("g_hash_ratio", q("hashes").cast("double") / wordsD)
      .withColumn("g_ellipsis_ratio",
        (q("ell3") + q("ellc")).cast("double") / wordsD)
      .withColumn("g_bullet_line_frac",
        q("bullet_lines").cast("double") / linesD)
      .withColumn("g_ellipsis_line_frac",
        q("ellipsis_lines").cast("double") / linesD)
      .withColumn("g_alpha_word_frac",
        q("alpha_words").cast("double") / wordsD)
      .withColumn("g_stopword_hits", q("stop_hits"))
      .drop("__gq")
  }

  /** The Gopher quality FILTER at the paper's published thresholds:
    * 50 <= words <= 100k, mean word length in [3, 10], hash ratio
    * <= 0.1 AND ellipsis ratio <= 0.1 (the paper gates each symbol
    * family separately at the same 0.1), <= 90% bullet lines (A1.1
    * removes documents with MORE than 90% bullet-started lines — a
    * structural "this page is one big list" test, not a style nit),
    * <= 30% ellipsis lines, >= 80% alphabetic words, >= 2 distinct
    * stop words. Signal columns are dropped from the output — use
    * [[gopherSignals]] directly for the report surface. */
  def gopherFilter(df: DataFrame, textCol: String,
                   minWords: Long = 50, maxWords: Long = 100000,
                   minMeanWordLen: Double = 3.0,
                   maxMeanWordLen: Double = 10.0,
                   maxSymbolRatio: Double = 0.1,
                   maxBulletFrac: Double = 0.9,
                   maxEllipsisFrac: Double = 0.3,
                   minAlphaFrac: Double = 0.8,
                   minStopwords: Long = 2): DataFrame = {
    require(minWords >= 1 && maxWords >= minWords,
      s"need 1 <= minWords <= maxWords: $minWords, $maxWords")
    // ONE boolean keep expression, not a filter over the signal
    // columns: predicate pushdown would substitute each signal alias
    // with its own copy of the fused walk (measured: 20 copies) —
    // [[graft.functions.QualityExprs.QualityKeep]] evaluates it once
    // and the filter sits scan-adjacent
    df.filter(graft.functions.QualityExprs.qualityKeep(col(textCol),
      Some(graft.functions.QualityExprs.GopherThresholds(
        minWords, maxWords, minMeanWordLen, maxMeanWordLen,
        maxSymbolRatio, maxBulletFrac, maxEllipsisFrac, minAlphaFrac,
        minStopwords)),
      None))
  }

  /** The FULL Gopher Table-A1.1 block — [[gopherFilter]]'s 7 document
    * thresholds AND [[Repetition.filterDuplicateUnits]]'s duplicate
    * line/paragraph caps, all at the paper's published values, as ONE
    * fused-walk boolean: composing the two operators would walk every
    * document twice, and filtering on signal columns would let
    * predicate pushdown inline the walk once per signal. This is the
    * curation pipeline's `gopher_rules` stage. Null text drops (the
    * word floor), matching the composed operators. */
  def gopherRulesFilter(df: DataFrame, textCol: String): DataFrame =
    df.filter(graft.functions.QualityExprs.qualityKeep(col(textCol),
      Some(graft.functions.QualityExprs.GopherThresholds()),
      Some(graft.functions.QualityExprs.DupUnitThresholds())))

  /** Stopword tables for the n-gram/stopword language-ID heuristic.
    * Deliberately small + documented: the heuristic is the operator, not
    * a model. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"),
    "es" -> Seq("el", "la", "los", "de", "que", "es", "un", "una", "por", "con"))

  /** Count hits of any word in `ws` (word-boundary, case-insensitive). */
  private def hitCount(t: Column, ws: Seq[String]): Column =
    size(regexp_extract_all(lower(t),
      lit("\\b(" + ws.mkString("|") + ")\\b"), lit(0)))

  /** Language ID: argmax of stopword hit counts; "und" (undetermined)
    * when nothing hits. Ties break by language code order (documented,
    * deterministic). */
  def langId(text: Column): Column = {
    val langs = stopwords.keys.toSeq.sorted
    val scored = langs.map(l => struct(hitCount(text, stopwords(l)).as("hits"),
      lit(l).as("lang")))
    val best = greatest(scored: _*)
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Exact content fingerprint: md5 of whitespace-normalized lowercase
    * text — the key for exact dedup across formatting variants. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), "\\s+", " "))

  /** Bottom-k sketch fingerprint: the k smallest shingle hashes, folded
    * to one long — robust to small edits (winnowing-style), constant
    * size per document. */
  def sketchFingerprint(text: Column, k: Int = 8, nGram: Int = 3): Column = {
    val hashes = graft.functions.SketchExprs.shingleHashes(text, nGram)
    val bottomK = slice(array_sort(hashes), 1, k)
    hash(bottomK).cast("long")
  }

  /** PII regexes: deliberately simple, deterministic, and written in the
    * common Java-regex/RE2 subset so the DuckDB oracle evaluates them
    * identically. The patterns are the operator's contract (documented,
    * auditable) — not a best-effort PII model. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+\\d{1,3}([- ]\\d{2,4}){2,4}" // intl form: +CC nnn-nnn-nnnn
  val Ipv4Re  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  /** Card-number CANDIDATES: contiguous 13-19 digit runs on word
    * boundaries (a longer run matches nowhere — IDs/hashes stay).
    * Candidates must then pass [[luhnValid]]; a bare digit-run rule
    * would redact order numbers and timestamps wholesale. */
  val CardRe  = "\\b\\d{13,19}\\b"

  /** Luhn checksum over a digit-only string Column — double every 2nd
    * digit from the RIGHT, fold digit sums, valid iff ≡ 0 (mod 10).
    * Exact integer arithmetic over codepoints, so the DuckDB oracle
    * replays it with the same fold. */
  def luhnValid(c: Column): Column = {
    val n = length(c)
    val total = aggregate(
      sequence(lit(1), n),
      lit(0L),
      (acc, i) => {
        val d = (ascii(c.substr(n - i + 1, lit(1))) - lit(48)).cast("long")
        val dd = when(pmod(i, lit(2)) === 0,
          when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
        acc + dd
      })
    pmod(total, lit(10L)) === 0
  }

  /** Redact emails, then Luhn-VALID card numbers, then phone numbers,
    * then IPv4 addresses (fixed order: each count is taken on the text
    * AFTER the previous category was replaced, so overlapping patterns
    * are never double-counted). Adds `n_emails` / `n_ccs` /
    * `n_phones` / `n_ips` and the `redacted` text. Card candidates
    * are 13-19 digit runs that pass the Luhn checksum — a failing run
    * (an order id, a timestamp) is counted nowhere and left in place.
    * Pure projection — shuffle-free, codegen'd, 100 TB-safe. */
  def redactPii(df: DataFrame, textCol: String): DataFrame = {
    val raw = col(textCol)
    val afterEmail = regexp_replace(raw, EmailRe, "<EMAIL>")
    // valid-card OCCURRENCES (counts), distinct values (each replace()
    // already rewrites every occurrence of that literal)
    val ccs = filter(
      regexp_extract_all(afterEmail, lit(CardRe), lit(0)), luhnValid(_))
    val afterCc = aggregate(array_distinct(ccs), afterEmail,
      (acc, c) => replace(acc, c, lit("<CC>")))
    val afterPhone = regexp_replace(afterCc, PhoneRe, "<PHONE>")
    df.withColumn("n_emails", regexp_count(raw, lit(EmailRe)))
      .withColumn("n_ccs", size(ccs))
      .withColumn("n_phones", regexp_count(afterCc, lit(PhoneRe)))
      .withColumn("n_ips", regexp_count(afterPhone, lit(Ipv4Re)))
      .withColumn("redacted", regexp_replace(afterPhone, Ipv4Re, "<IP>"))
  }

  /** One-stop analysis projection over a document table. */
  def analyze(df: DataFrame, textCol: String): DataFrame =
    quality(df, textCol)
      .withColumn("token_estimate", tokenCountEstimate(col(textCol)).cast("long"))
      .withColumn("lang_guess", langId(col(textCol)))
      .withColumn("fingerprint", fingerprint(col(textCol)))

  /** Corpus-level profile: ONE row of dataset health statistics — the
    * before/after snapshot a training pipeline takes around every dedup
    * or filter pass (volume, duplication rate via distinct fingerprints,
    * token budget, quality drift).
    *
    * Scale shape: the analysis columns are a shuffle-free projection, so
    * the whole profile is one aggregation with map-side partials —
    * except the exact distinct-fingerprint count, whose one hash shuffle
    * carries (fingerprint) keys only. At 100 TB pass
    * `exactDistinct = false` and the HLL sketch
    * (`approx_count_distinct`, ~2% error) makes the profile fully
    * shuffle-light: partials merge, nothing wide ever moves.
    *
    * `avg_quality` goes through DECIMAL(18,6) per-row so the sum is
    * EXACT and independent of partitioning/summation order (a double
    * sum would drift in the low bits across runs). */
  def corpusProfile(df: DataFrame, textCol: String,
                    exactDistinct: Boolean = true): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(18, 6)
    val a = analyze(df, textCol)
    a.agg(
      count(lit(1)).as("n_docs"),
      (if (exactDistinct) countDistinct(col("fingerprint"))
       else approx_count_distinct(col("fingerprint"))).as("distinct_fingerprints"),
      sum(col("char_len")).as("total_chars"),
      sum(col("word_count")).as("total_words"),
      sum(col("token_estimate")).as("total_tokens"),
      round(sum(round(col("quality_score"), 6).cast(dec)).cast("double")
        / count(lit(1)), 6).as("avg_quality"),
      min(col("char_len")).as("min_chars"),
      max(col("char_len")).as("max_chars"))
  }

  /** Crawl opt-out / consent signals: `<meta>` robots directives a
    * compliant training-data pipeline honors before anything else —
    * `noai` / `noimageai` (the DeviantArt-led AI opt-out tokens, also
    * emitted by Raptive and Squarespace sites) and classic `noindex`.
    * One boolean per directive, matched as a word-bounded token inside
    * a meta tag's content attribute (either quote style) — so
    * `content="noai, noimageai"` sets both, while prose mentioning
    * "noai" outside a meta tag sets neither. RE2-safe patterns; the
    * oracle runs them verbatim. Caveat (fixture-pinned): a content
    * value containing a literal `>` ends the tag match early — a miss,
    * never a false flag. Pure per-row projection; streams. */
  def optOutFlags(df: DataFrame, textCol: String): DataFrame = {
    def flag(token: String): Column = {
      val dq = s"""(?i)<meta\\b[^>]*content\\s*=\\s*"[^"]*\\b$token\\b[^"]*""""
      val sq = s"(?i)<meta\\b[^>]*content\\s*=\\s*'[^']*\\b$token\\b[^']*'"
      col(textCol).rlike(dq) || col(textCol).rlike(sq)
    }
    df.withColumn("noai", flag("noai"))
      .withColumn("noimageai", flag("noimageai"))
      .withColumn("noindex", flag("noindex"))
  }

  /** Structured page metadata from raw crawl HTML — the fields a
    * curation pipeline keys on before any stripping: `page_title`
    * (first `<title>` inner text, dotall + non-greedy so a multi-line
    * title stops at its own close tag), `meta_description`,
    * `canonical_url` (the canonical-URL dedup key — stronger than
    * string-normalizing the fetch URL), `og_title` / `og_image`
    * (the social-card fields LAION-style pair mining falls back to
    * when `alt` is empty), and `html_lang` (the author-declared
    * language, a prior for [[LangId]]). All RE2-safe regexes run
    * verbatim by the oracle; attribute matching covers BOTH orders
    * (`name=… content=…` and `content=… name=…`), double-quoted
    * values (the overwhelming crawl case — single-quoted attr values
    * here are a documented miss, never a wrong field); absent or
    * empty fields are NULL. Pure per-row projection; streams. */
  def pageMeta(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    def ex(pattern: String): Column =
      nullif(regexp_extract(t, pattern, 1), lit(""))
    // content="..." after the discriminating attribute, or before it
    def meta(attr: String, value: String): Column = coalesce(
      ex(s"""(?i)<meta\\b[^>]*$attr\\s*=\\s*"$value"[^>]*content\\s*=\\s*"([^"]*)""""),
      ex(s"""(?i)<meta\\b[^>]*content\\s*=\\s*"([^"]*)"[^>]*$attr\\s*=\\s*"$value""""))
    df.withColumn("page_title", ex("(?is)<title[^>]*>(.*?)</title>"))
      .withColumn("meta_description", meta("name", "description"))
      .withColumn("canonical_url", coalesce(
        ex("""(?i)<link\b[^>]*rel\s*=\s*"canonical"[^>]*href\s*=\s*"([^"]*)""""),
        ex("""(?i)<link\b[^>]*href\s*=\s*"([^"]*)"[^>]*rel\s*=\s*"canonical"""")))
      .withColumn("og_title", meta("property", "og:title"))
      .withColumn("og_image", meta("property", "og:image"))
      .withColumn("html_lang",
        ex("""(?i)<html\b[^>]*\blang\s*=\s*"([^"]*)""""))
  }
}
