package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection: which corpus documents share
  * word n-grams with an evaluation/benchmark probe set? The standard
  * decontamination pass before pre-training (n = 8..13 word-grams in
  * published pipelines).
  *
  * Scale shape: the probe side (a benchmark) is small — its distinct
  * grams are broadcast, so the corpus is never shuffled by gram: the
  * plan is scan → explode → broadcast-hash-join → partial-agg by
  * doc_id. Per-doc gram sets are deduped BEFORE the explode leaves the
  * row (array_distinct), so the exploded stream is bounded by document
  * length, and only (doc_id, count) partials cross the wire.
  */
object Contamination {

  /** Word tokens: lowercase, split on non-word runs, empties dropped —
    * the same tokenizer as the n-gram Jaccard dedup family. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\W+"), t => length(t) > 0)

  /** Distinct word n-grams of `text` as "w1 w2 … wn" strings; empty
    * array when the document has fewer than n tokens. (The size guard
    * matters: Spark's `sequence(1, k)` DESCENDS for k < 1 instead of
    * returning empty.) Readable/debuggable form — [[check]] joins on
    * [[hashedNgrams]], the one-pass native hash image of exactly these
    * grams. */
  def ngrams(text: Column, n: Int): Column = {
    require(n >= 1, s"n must be >= 1: $n")
    val toks = tokens(text)
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - lit(n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n)))))
        .otherwise(array()))
  }

  /** xxhash64 image of [[ngrams]] (strict [[graft.functions.SketchExprs.ShingleHash]]:
    * same tokens, same gram strings, hashed in ONE codegen'd pass —
    * the interpreted transform/concat_ws lambda chain was the whole
    * cost of the contamination scan). Distinct-count semantics are
    * preserved: equal grams ⇔ equal hashes up to 2^-64 collisions. */
  def hashedNgrams(text: Column, n: Int): Column =
    graft.functions.SketchExprs.shingleHashes(text, n, strict = true)

  /** Per-document contamination report against `probes`:
    * `matched_grams` (distinct n-grams shared with ANY probe),
    * `total_grams`, and `contamination` = matched/total, for every
    * document sharing at least one gram. Probe grams are broadcast —
    * benchmark sets are tiny next to a training corpus.
    *
    * One corpus pass: the native hashed n-gram projection runs once,
    * and both counts ride the same broadcast LEFT join: total =
    * exploded grams per doc, matched = grams the join marked. No
    * second scan, no id re-join, no interpreted lambdas in the scan. */
  def check(corpus: DataFrame, probes: DataFrame, idCol: String,
            textCol: String, probeTextCol: String, n: Int = 8,
            roundTo: Int = 6): DataFrame = {
    val id = col(idCol)
    val probeGrams = probes
      .select(explode(hashedNgrams(col(probeTextCol), n)).as("gram")).distinct()
      .withColumn("__hit", lit(1))
    val docGrams = corpus.select(id,
      explode(hashedNgrams(col(textCol), n)).as("gram"))
    // per-doc grams are already distinct → counts = distinct counts
    docGrams.join(broadcast(probeGrams), Seq("gram"), "left")
      .groupBy(id)
      .agg(count(col("__hit")).as("matched_grams"),
        count(lit(1)).as("total_grams"))
      .filter(col("matched_grams") > 0)
      .select(id, col("matched_grams"), col("total_grams"),
        round(col("matched_grams") / col("total_grams"), roundTo)
          .as("contamination"))
  }

  /** Per-SUITE contamination attribution: [[check]] answers "how
    * contaminated is this document", this answers "by WHICH benchmark"
    * — the audit table a release review actually wants (MMLU leaked
    * into 40 documents, GSM8K into 2). One row per (document, suite)
    * with at least one shared n-gram: distinct grams shared with THAT
    * suite, the document's total distinct grams, and their ratio.
    *
    * Scale shape: same as [[check]] — suite-tagged probe grams
    * broadcast (benchmark suites are tiny), the corpus explodes its
    * per-doc-distinct gram hashes ONCE, and only (doc, suite, count)
    * partials cross the wire; per-doc totals come from a shuffle-free
    * `size()` projection, joined back keys-only AFTER the per-suite
    * aggregation. A gram shared by two suites counts toward both —
    * attribution, not partition. */
  def checkBySuite(corpus: DataFrame, probes: DataFrame, idCol: String,
                   textCol: String, probeTextCol: String,
                   suiteCol: String, n: Int = 8,
                   roundTo: Int = 6): DataFrame = {
    require(probes.columns.contains(suiteCol),
      s"no such probe column '$suiteCol'")
    val id = col(idCol)
    val probeGrams = probes
      .select(col(suiteCol).as("suite"),
        explode(hashedNgrams(col(probeTextCol), n)).as("gram"))
      .distinct()
    val totals = corpus.select(id,
      size(hashedNgrams(col(textCol), n)).cast("long").as("total_grams"))
    corpus.select(id, explode(hashedNgrams(col(textCol), n)).as("gram"))
      .join(broadcast(probeGrams), Seq("gram"))
      .groupBy(id, col("suite"))
      .agg(count(lit(1)).as("matched_grams"))
      .join(totals, Seq(idCol))
      .select(id, col("suite"), col("matched_grams"), col("total_grams"),
        round(col("matched_grams") / col("total_grams"), roundTo)
          .as("contamination"))
  }

  /** The removal step [[check]] reports for: keep only documents whose
    * contamination stays BELOW `maxContamination`. `0.0` is the strict
    * mode — drop every document sharing even one n-gram with a probe.
    * The decision compares the UNROUNDED matched/total ratio (the
    * rounded report column would misclassify ratios that round onto
    * the threshold). Documents sharing no gram never enter the
    * decision join.
    *
    * Scale shape: [[check]]'s broadcast scan yields the contaminated-id
    * set — small by construction (benchmark-adjacent docs) — and the
    * corpus anti-joins it BY ID ONLY; document text crosses exactly the
    * one exchange any keep/drop-set join costs, nothing per-gram. */
  /** EXACT-substring contamination — the canary-string check: flag
    * every document containing ANY probe VERBATIM (benchmark answer
    * strings, eval canaries, license sentinels). The n-gram
    * [[check]] measures fuzzy overlap fractions; this one answers the
    * sharper question "does the eval string itself appear".
    *
    * Returns (id, matched_probes) for hit documents only.
    *
    * Scale shape: probes collect to the driver (canary lists are
    * small — capped loudly at `maxProbes`) and compile into ONE
    * codegen'd contains-chain projection, so the corpus pays a single
    * shuffle-free scan — no explode, no join, no per-gram state. For
    * probe sets beyond the cap, use the n-gram [[check]] (broadcast
    * join) instead. */
  def exactSubstring(corpus: DataFrame, probes: DataFrame, idCol: String,
                     textCol: String, probeTextCol: String,
                     maxProbes: Int = 1000): DataFrame = {
    require(corpus.columns.contains(idCol), s"no such column '$idCol'")
    require(corpus.columns.contains(textCol), s"no such column '$textCol'")
    val ps = probes.select(col(probeTextCol).cast("string"))
      .filter(col(probeTextCol).isNotNull)
      .distinct().limit(maxProbes + 1)
      .collect().map(_.getString(0))
    require(ps.length <= maxProbes,
      s"more than $maxProbes distinct probes — use the n-gram check " +
        "(broadcast join) for large probe sets")
    require(ps.forall(_.nonEmpty),
      "empty-string probe would match every document")
    require(ps.nonEmpty, "probe set is empty")
    val hits = ps.map(p =>
      when(col(textCol).contains(lit(p)), 1L).otherwise(0L))
      .reduce(_ + _)
    corpus.select(col(idCol), hits.as("matched_probes"))
      .filter(col("matched_probes") > 0)
  }

  /** Corpus-level overlap report — "how much of corpus B is already in
    * corpus A?" — the dataset-vs-dataset question behind training-set
    * refresh decisions (is the new crawl novel?), license audits and
    * corpus-granularity contamination, where [[check]] answers it per
    * document. ONE row: distinct shingle counts of each corpus, their
    * intersection, `containment_b_in_a` = |A∩B| / |B| (how much of B
    * that A already covers) and the symmetric `jaccard`.
    *
    * Scale shape: both corpora reduce to DISTINCT 8-byte shingle
    * hashes (text never shuffles) that meet in one full-outer
    * hash-join; counts aggregate map-side into a single row. Distinct
    * shingle space ~ corpus vocabulary of n-grams — big but keys-only;
    * there is no all-pairs step anywhere. */
  def corpusContainment(a: DataFrame, b: DataFrame, textCol: String,
                        n: Int = 3): DataFrame = {
    require(a.columns.contains(textCol) && b.columns.contains(textCol),
      s"both corpora need a '$textCol' column")
    def shingles(df: DataFrame, mark: String) = df
      .select(explode(
        graft.functions.SketchExprs.shingleHashes(col(textCol), n)).as("h"))
      .distinct()
      .withColumn(mark, lit(1L))
    shingles(a, "__a").join(shingles(b, "__b"), Seq("h"), "full_outer")
      .agg(
        sum(coalesce(col("__a"), lit(0L))).as("n_a"),
        sum(coalesce(col("__b"), lit(0L))).as("n_b"),
        sum(when(col("__a").isNotNull && col("__b").isNotNull, 1L)
          .otherwise(0L)).as("n_common"))
      .select(col("n_a"), col("n_b"), col("n_common"),
        (col("n_common").cast("double") / col("n_b").cast("double"))
          .as("containment_b_in_a"),
        (col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double"))
          .as("jaccard"))
  }

  def decontaminate(corpus: DataFrame, probes: DataFrame, idCol: String,
                    textCol: String, probeTextCol: String, n: Int = 8,
                    maxContamination: Double = 0.2): DataFrame = {
    require(maxContamination >= 0.0 && maxContamination <= 1.0,
      s"maxContamination must be in [0, 1]: $maxContamination")
    val dropIds = check(corpus, probes, idCol, textCol, probeTextCol, n)
      .filter(col("matched_grams").cast("double") / col("total_grams")
        >= lit(maxContamination))
      .select(col(idCol))
    corpus.join(dropIds, Seq(idCol), "left_anti")
  }

  // ------------------------------------------------------------------
  // Substring-granularity decontamination: EXCISE the contaminated
  // span, KEEP the document (the field standard for eval-set leakage —
  // the same Lee et al. 2021 token-window machinery as
  // [[SubstringDedup]], aimed at a probe corpus instead of the corpus
  // itself). [[decontaminate]] drops whole documents at fuzzy n-gram
  // overlap; this surgically removes every >= w-token span that appears
  // VERBATIM in any probe (benchmark question, eval passage, canary),
  // so one leaked paragraph no longer costs an entire document.
  //
  // Scale shape — better than the dedup pass needs to be, because the
  // probe side is BOUNDED (an eval suite, not a crawl): the probe
  // windows collect once into a sorted 8-byte-hash array (loud cap)
  // that rides the plan into every task, and the corpus pays ONE
  // per-row projection — window-hash, binary-search membership,
  // interval merge, rebuild — with NO shuffle and NO join anywhere.
  // That per-row shape is also what makes the stage streamable (the
  // curation stream pipeline runs it unchanged). Probes shorter than
  // w tokens emit no windows and cannot match — use the n-gram
  // [[check]]/[[decontaminate]] for short-probe fuzzy coverage.
  // ------------------------------------------------------------------

  /** Distinct probe window hashes as a sorted array — the driver-side
    * probe index. Loudly capped: past `maxProbeWindows` the index is
    * no longer "bounded eval suite"-sized and the whole design premise
    * fails (8 bytes/window; the default cap is 32 MiB of plan).
    *
    * The probe side ALWAYS windows at stride 1 — this is the
    * asymmetric-stride safety rule: with probe windows at every token
    * offset, a corpus window taken at any stride-s grid position still
    * finds its verbatim twin in the index whenever it lies inside a
    * leaked span. Striding BOTH sides would desynchronize the two
    * grids (a span whose occurrence offsets differ by a non-multiple
    * of s produces ZERO matching hashes — a silent contamination
    * miss, against the house loud-failure convention). The probe side
    * is the bounded side, so its stride-1 cost is the cheap one. */
  private[llm] def probeWindowHashes(probes: DataFrame, probeTextCol: String,
                                     w: Int,
                                     maxProbeWindows: Int): Array[Long] = {
    require(maxProbeWindows >= 1,
      s"maxProbeWindows must be >= 1: $maxProbeWindows")
    val rows = probes
      .select(explode(graft.functions.SketchExprs
        .tokenWindowHashes(col(probeTextCol).cast("string"), w, stride = 1))
        .as("__w"))
      .select(col("__w")("h")).distinct()
      .limit(maxProbeWindows + 1).collect()
    require(rows.length <= maxProbeWindows,
      s"probe corpus exceeds maxProbeWindows=$maxProbeWindows distinct " +
        s"$w-token windows — this operator broadcasts the probe index " +
        "into a per-row projection and is sized for bounded eval " +
        "suites; raise the cap deliberately or pre-trim the probes")
    require(rows.nonEmpty,
      s"probe corpus yields no $w-token windows (every probe is " +
        s"shorter than $w tokens?) — nothing could ever match; use " +
        "the n-gram check/decontaminate for short probes")
    rows.map(_.getLong(0))
  }

  /** Merged maximal matched spans of `textCol` as a per-row
    * `array<struct<s,e>>` column (codepoint [s, e), ordered): window
    * hashes filtered by probe-set membership, then overlapping/
    * adjacent windows coalesced by one in-plan fold. */
  private def matchedSpans(textCol: String, hs: Array[Long],
                           w: Int, stride: Int): Column = {
    val hits = filter(
      graft.functions.SketchExprs.tokenWindowHashes(col(textCol), w, stride),
      x => graft.functions.SetExprs.inLongSet(x("h"), hs))
    // fold in window order (TokenWindowHashes emits s-ascending):
    // start a new span when the window begins past the last span's
    // end, else extend the last span — the same coalescing rule as
    // [[Spans.mergeIntervals]], expressed per-row
    val empty = array().cast("array<struct<s:int,e:int>>")
    aggregate(hits, empty, (acc, x) => {
      val last = element_at(acc, -1)
      when(size(acc) === 0 || x("s") > last("e"),
        concat(acc, array(struct(x("s").as("s"), x("e").as("e")))))
        .otherwise(concat(slice(acc, lit(1), size(acc) - 1),
          array(struct(last("s").as("s"),
            greatest(last("e"), x("e")).as("e")))))
    })
  }

  /** Report surface: one row per (id, matched maximal span) with
    * codepoint bounds — what [[decontaminateExcise]] would cut.
    *
    * `stride` applies to the CORPUS side only (the probe index is
    * stride-1 by construction — [[probeWindowHashes]]). Guarantee: a
    * leaked span of >= w + stride - 1 tokens always contains at least
    * one corpus-grid window and is detected regardless of its offset;
    * the reported bounds may under-cover by up to stride - 1 tokens at
    * each edge (the span ends between grid positions). stride = 1 (the
    * default and the curation pipeline's setting) detects every
    * >= w-token leak with exact maximal bounds. */
  def contaminationSpans(corpus: DataFrame, probes: DataFrame,
                         idCol: String, textCol: String,
                         probeTextCol: String, w: Int = 50,
                         stride: Int = 1,
                         maxProbeWindows: Int = 1 << 22): DataFrame = {
    val hs = probeWindowHashes(probes, probeTextCol, w, maxProbeWindows)
    corpus
      .select(col(idCol),
        explode(matchedSpans(textCol, hs, w, stride)).as("__iv"))
      .select(col(idCol), col("__iv")("s").as("span_start"),
        col("__iv")("e").as("span_end"))
  }

  /** The corpus pass: every >= w-token span appearing verbatim in any
    * probe is excised from `textCol` (document KEPT — a fully
    * contaminated document survives as an auditable empty-string husk,
    * the [[Spans.excise]] contract), and `charsCol` reports the
    * codepoints removed per document (0 for clean rows, including
    * null-text rows, which pass through untouched). Keeps every input
    * column; pure per-row projection — streams unchanged.
    *
    * `stride` strides the CORPUS window grid only; the probe index is
    * always stride-1 ([[probeWindowHashes]]), so any corpus window
    * inside a leak matches regardless of offset alignment. Guarantee:
    * leaks of >= w + stride - 1 tokens are always excised; up to
    * stride - 1 leading/trailing leak tokens can survive at the span
    * edges. stride = 1 (the default) excises every >= w-token leak
    * exactly. */
  def decontaminateExcise(corpus: DataFrame, probes: DataFrame,
                          idCol: String, textCol: String,
                          probeTextCol: String, w: Int = 50,
                          stride: Int = 1,
                          maxProbeWindows: Int = 1 << 22,
                          charsCol: String = "contaminated_chars")
      : DataFrame = {
    require(corpus.columns.contains(textCol), s"no such column '$textCol'")
    require(!probes.isStreaming,
      "probe corpus must be a static (batch) frame — the probe index " +
        "collects once; the CORPUS side may stream")
    val hs = probeWindowHashes(probes, probeTextCol, w, maxProbeWindows)
    exciseSpans(corpus, textCol,
      matchedSpans(textCol, hs, w, stride), charsCol)
  }

  /** Cut every [s, e) span of `spansCol` (an ordered, disjoint
    * array<struct<s:int, e:int, …>> in codepoints) out of `textCol`,
    * reporting the codepoints removed in `charsCol` — the positional
    * reassembly shared by the verbatim and fuzzy excision passes (the
    * same fold as [[Spans.exciseIntervals]]). Null text passes through
    * null with 0 chars. */
  private def exciseSpans(corpus: DataFrame, textCol: String,
                          spansCol: Column, charsCol: String): DataFrame = {
    Guards.requireFreshColumns(corpus, Seq("__ivs", charsCol),
      "Contamination.exciseSpans")
    val t = col(textCol)
    val rebuilt = aggregate(
      col("__ivs"),
      struct(lit(0).as("p"), lit("").as("acc")),
      (st, iv) => struct(
        iv("e").as("p"),
        concat(st("acc"), t.substr(st("p") + lit(1), iv("s") - st("p")))
          .as("acc")),
      st => concat(st("acc"), t.substr(st("p") + lit(1), length(t) - st("p"))))
    corpus
      .withColumn("__ivs", spansCol)
      .withColumn(charsCol,
        coalesce(aggregate(col("__ivs"), lit(0L),
          (a, iv) => a + (iv("e") - iv("s")).cast("long")), lit(0L)))
      .withColumn(textCol,
        when(col("__ivs").isNull || size(col("__ivs")) === 0, t)
          .otherwise(rebuilt))
      .drop("__ivs")
  }

  // ------------------------------------------------------------------
  // EDIT-TOLERANT (near-verbatim) span decontamination: the winnowing-
  // fingerprint complement to the verbatim pass above. A leaked eval
  // passage with one token changed produces zero matching verbatim
  // windows — decontaminateExcise misses it entirely, and the fuzzy
  // n-gram decontaminate only drops at DOCUMENT granularity. This pass
  // localizes the near-verbatim region (winnow seed → char-gram run
  // clustering → overlap verify, graft.functions.FuzzySpanExprs) and
  // excises it with the same positional rebuild, keeping the document.
  //
  // Guarantee (documented on FuzzySpanExprs, unit-pinned): a leak is
  // detected iff it contains a clean stretch of >= w + k - 1
  // codepoints; reported bounds are matched-gram-run bounds, so edits
  // within k codepoints of a leak edge shrink the cut by that edge's
  // corrupted-gram neighborhood. Same scale shape as the verbatim
  // pass: two bounded sorted probe indexes (loud caps) riding the
  // plan, ONE per-row projection, no shuffle, no join — streams.
  // ------------------------------------------------------------------

  /** The fuzzy probe indexes: distinct winnowing-fingerprint values
    * (the SEED index — [[graft.functions.SketchExprs.winnowFingerprints]],
    * so the hash family is the pinned portable polynomial) and
    * distinct char-gram hashes (the LOCALIZE/VERIFY index), both
    * sorted, both loudly capped. */
  private[llm] def fuzzyProbeIndex(probes: DataFrame, probeTextCol: String,
                                   k: Int, w: Int, maxProbeGrams: Int)
      : (Array[Long], Array[Long]) = {
    require(maxProbeGrams >= 1, s"maxProbeGrams must be >= 1: $maxProbeGrams")
    val txt = col(probeTextCol).cast("string")
    val fpRows = probes
      .select(explode(graft.functions.SketchExprs
        .winnowFingerprints(txt, k, w)).as("__f"))
      .select(col("__f")("h")).distinct()
      .limit(maxProbeGrams + 1).collect()
    val gramRows = probes
      .select(explode(graft.functions.FuzzySpanExprs
        .polyGramHashes(txt, k)).as("__g"))
      .distinct().limit(maxProbeGrams + 1).collect()
    require(gramRows.length <= maxProbeGrams,
      s"probe corpus exceeds maxProbeGrams=$maxProbeGrams distinct " +
        s"$k-codepoint grams — this operator broadcasts the probe " +
        "index into a per-row projection and is sized for bounded " +
        "eval suites; raise the cap deliberately or pre-trim the probes")
    require(gramRows.nonEmpty,
      s"probe corpus yields no $k-codepoint grams (every probe is " +
        s"shorter than $k codepoints?) — nothing could ever match")
    val fps = fpRows.map(_.getLong(0)); java.util.Arrays.sort(fps)
    val grams = gramRows.map(_.getLong(0)); java.util.Arrays.sort(grams)
    (fps, grams)
  }

  /** Report surface: one row per (id, matched near-verbatim span) with
    * codepoint bounds plus the matched/total gram counts the verify
    * step used — what [[decontaminateFuzzy]] would cut. */
  def fuzzyContaminationSpans(corpus: DataFrame, probes: DataFrame,
                              idCol: String, textCol: String,
                              probeTextCol: String, k: Int = 16,
                              w: Int = 32, maxGapGrams: Int = 64,
                              minOverlap: Double = 0.5,
                              minSpanGrams: Int = 32,
                              maxProbeGrams: Int = 1 << 22): DataFrame = {
    val (fps, grams) = fuzzyProbeIndex(probes, probeTextCol, k, w,
      maxProbeGrams)
    corpus
      .select(col(idCol),
        explode(graft.functions.FuzzySpanExprs.fuzzyMatchSpans(
          col(textCol), fps, grams, k, w, maxGapGrams, minOverlap,
          minSpanGrams)).as("__iv"))
      .select(col(idCol), col("__iv")("s").as("span_start"),
        col("__iv")("e").as("span_end"),
        col("__iv")("matched").as("matched_grams"),
        col("__iv")("total").as("total_grams"))
  }

  /** The corpus pass: every near-verbatim probe span (winnow seed →
    * gram-run cluster → >= minOverlap verify) is excised from
    * `textCol` (document KEPT — the same husk contract as the
    * verbatim pass) and `charsCol` reports the codepoints removed.
    * Defaults: k = 16, w = 32 → detection needs a clean stretch of
    * >= 47 codepoints; maxGapGrams = 64 bridges a few adjacent edits
    * (one e-codepoint edit corrupts <= k + e - 1 grams); minSpanGrams
    * = 32 + minOverlap = 0.5 reject incidental shared phrases. Pure
    * per-row projection — streams unchanged. */
  def decontaminateFuzzy(corpus: DataFrame, probes: DataFrame,
                         idCol: String, textCol: String,
                         probeTextCol: String, k: Int = 16,
                         w: Int = 32, maxGapGrams: Int = 64,
                         minOverlap: Double = 0.5,
                         minSpanGrams: Int = 32,
                         maxProbeGrams: Int = 1 << 22,
                         charsCol: String = "contaminated_chars")
      : DataFrame = {
    require(corpus.columns.contains(textCol), s"no such column '$textCol'")
    require(!probes.isStreaming,
      "probe corpus must be a static (batch) frame — the probe index " +
        "collects once; the CORPUS side may stream")
    val (fps, grams) = fuzzyProbeIndex(probes, probeTextCol, k, w,
      maxProbeGrams)
    exciseSpans(corpus, textCol,
      graft.functions.FuzzySpanExprs.fuzzyMatchSpans(col(textCol), fps,
        grams, k, w, maxGapGrams, minOverlap, minSpanGrams), charsCol)
  }
}
