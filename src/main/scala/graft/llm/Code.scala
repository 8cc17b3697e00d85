package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.CodeExprs
import graft.functions.CodeExprs.CodeThresholds

/** Code-corpus curation — The Stack / StarCoder structural filters
  * (Kocetkov et al. 2022; Li et al. 2023) plus license detection, the
  * two passes every source-code pretraining set runs before anything
  * else: drop minified bundles / vendored blobs / generated bindings
  * by line shape and data-run mass, and keep only permissively
  * licensed files.
  *
  * Scale shape: everything here is a per-row projection or a scan-
  * adjacent boolean filter over ONE fused text walk
  * ([[CodeExprs]]) — no shuffle, no state, streams as-is. License
  * detection is Spark built-ins only (`regexp_extract` / `contains`
  * on the lowered text), codegen'd end to end. */
object Code {

  /** Flattened structural statistics (one walk; see [[CodeExprs]] for
    * each field's exact definition and SQL oracle). */
  def stats(df: DataFrame, text: Column): DataFrame = {
    val st = CodeExprs.codeStats(text)
    df.withColumn("n_lines", st.getField("n_lines"))
      .withColumn("max_line_len", st.getField("max_line_len"))
      .withColumn("line_chars", st.getField("line_chars"))
      .withColumn("total_chars", st.getField("total_chars"))
      .withColumn("alnum_chars", st.getField("alnum_chars"))
      .withColumn("max_b64_run", st.getField("max_b64_run"))
      .withColumn("max_hex_run", st.getField("max_hex_run"))
      .withColumn("autogen", st.getField("autogen"))
  }

  /** Structural keep filter — ONE baked boolean predicate so the walk
    * runs once at the scan (the [[graft.functions.QualityExprs]]
    * pushdown lesson). */
  def filter(df: DataFrame, text: Column,
             th: CodeThresholds = CodeThresholds()): DataFrame =
    df.filter(CodeExprs.codeKeep(text, th))

  /** SPDX tags that permit pretraining-style reuse without copyleft
    * obligations — the Stack v1's allow-list core. Compared
    * case-insensitively against the extracted `spdx_id`. */
  val PermissiveSpdx: Seq[String] = Seq(
    "mit", "apache-2.0", "bsd-2-clause", "bsd-3-clause", "isc",
    "unlicense", "cc0-1.0", "0bsd", "zlib")

  /** License evidence per document, null-safe and oracle-replayable:
    *  - `spdx_id`: the first `SPDX-License-Identifier:` value (the
    *    machine-readable header both GitHub and the Linux kernel
    *    standardized on), NULL when absent.
    *  - `permissive`: spdx_id on the allow-list, OR a canonical
    *    permissive license phrase in the text (MIT's "permission is
    *    hereby granted", BSD's "redistribution and use in source and
    *    binary forms", "apache license", the Unlicense's preamble).
    *  - `copyleft`: a GNU GPL/AGPL/LGPL family phrase or tag.
    *  - `cc_variant`: the creativecommons.org/licenses/<variant> path
    *    component (web-text licensing — "by", "by-nc-nd", …), NULL
    *    when absent.
    * Oracle: identical `regexp_extract`/`LIKE` over `lower(text)` —
    * all patterns are ASCII so engine case folds agree. */
  def licenseFlags(df: DataFrame, text: Column): DataFrame = {
    val lower = org.apache.spark.sql.functions.lower(text)
    val spdx = nullif(
      regexp_extract(text, "SPDX-License-Identifier:[ \\t]*([0-9A-Za-z.+-]+)", 1),
      lit(""))
    val spdxLower = org.apache.spark.sql.functions.lower(col("spdx_id"))
    df.withColumn("spdx_id", spdx)
      .withColumn("permissive",
        coalesce(spdxLower.isin(PermissiveSpdx: _*), lit(false)) ||
          lower.contains("permission is hereby granted") ||
          lower.contains("redistribution and use in source and binary forms") ||
          lower.contains("apache license") ||
          lower.contains("this is free and unencumbered software"))
      .withColumn("copyleft",
        lower.contains("gnu general public license") ||
          lower.contains("gnu affero general public license") ||
          lower.contains("gnu lesser general public license") ||
          coalesce(spdxLower.startsWith("gpl-") ||
            spdxLower.startsWith("agpl-") ||
            spdxLower.startsWith("lgpl-"), lit(false)))
      .withColumn("cc_variant", nullif(
        regexp_extract(lower, "creativecommons\\.org/licenses/([a-z-]+)", 1),
        lit("")))
  }

  /** Fill-in-the-middle transformation (Bavarian et al. 2022; the
    * StarCoder/Code-Llama code-training pass): a `rate` fraction of
    * documents is rewritten into PSM order —
    * `<fim_prefix>P<fim_suffix>S<fim_middle>M` — so the model learns
    * infilling from the same corpus mass. Selection AND both cut
    * points derive from the SQL-portable seeded hash
    * ([[Sampling.portableBucket]]) of the integer id, so the transform
    * is deterministic, reproducible across runs, and replayed verbatim
    * by the DuckDB oracle (`q_code_fim`). Cut points are uniform-ish
    * over [0, len] (hash mod — the modulo bias is ≤ len/10^6 and
    * irrelevant for a data transform). Pure per-row projection; adds a
    * `fim` boolean, rewrites `textCol` in place for selected rows.
    * Codepoint-based (`length`/`substr` SQL semantics); empty docs
    * rewrite to the bare sentinel triple. */
  def fim(df: DataFrame, idCol: String, textCol: String,
          rate: Double = 0.5, seed: Long = 0L): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    Sampling.requireIntegralId(df, idCol, "Code.fim")
    val id = col(idCol)
    val text = col(textCol)
    val len = length(text).cast("int")
    val selected = Sampling.portableBucket(id + lit(seed)) <
      lit((rate * Sampling.Buckets).toLong)
    val a = pmod(Sampling.portableBucket(id * 2 + lit(seed + 1)),
      (len + 1).cast("long")).cast("int")
    val bLen = pmod(Sampling.portableBucket(id * 3 + lit(seed + 2)),
      (len - a + 1).cast("long")).cast("int")
    val b = a + bLen
    val psm = concat(lit("<fim_prefix>"), text.substr(lit(1), a),
      lit("<fim_suffix>"), text.substr(b + 1, len - b),
      lit("<fim_middle>"), text.substr(a + 1, bLen))
    df.withColumn("fim", selected)
      .withColumn(textCol, when(selected, psm).otherwise(text))
  }
}
