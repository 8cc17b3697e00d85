package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B measurement for the round-13 quality-stage fusion: the stacked
  * `c4_rules` + `gopher_rules` path over the SAME page corpus, once
  * through the pre-fusion built-in chains (inlined verbatim below from
  * the pre-93fb71f operators) and once through the fused
  * [[graft.functions.QualityExprs]] walk. Pages are synthesized from
  * the documents table into 3-line terminal-punctuated form (so the C4
  * line rule keeps content) and MATERIALIZED to parquet first — the
  * timed sections read identical bytes. Numbers land in SCALING.md.
  *
  * Usage: runMain graft.tools.FusionBench [sfDir] [reps]
  */
object FusionBench {

  /** The PRE-fusion gopher signal chain (TextAnalysis.gopherSignals as
    * of round 12), inlined so the A side stays runnable after the
    * operator moved to the fused walk. Combined-symbol-ratio variant
    * kept split for rule parity with the new filter. */
  private def oldGopherFilter(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val words = filter(split(t, "\\s+"), w => length(w) > 0)
    val nWords = size(words).cast("long")
    val wordsD = greatest(nWords.cast("double"), lit(1.0))
    val lines = filter(split(t, "\n"), l => length(trim(l)) > 0)
    val nLines = greatest(size(lines).cast("double"), lit(1.0))
    val hashes = length(t) - length(regexp_replace(t, "#", ""))
    val ell3 = (length(t) -
      length(regexp_replace(t, "\\.\\.\\.", ""))) / lit(3)
    val ellC = length(t) - length(regexp_replace(t, "…", ""))
    val bulletLines = size(filter(lines, l => trim(l).rlike("^[•‣▪*-]")))
    val ellipsisLines = size(filter(lines,
      l => l.rlike("(\\.\\.\\.|…)\\s*$")))
    val alphaWords = size(filter(words, w => w.rlike("[A-Za-z]")))
    val stopHits = Seq("the", "be", "to", "of", "and", "that", "have",
      "with").map(sw =>
      when(lower(t).rlike("\\b" + sw + "\\b"), 1L).otherwise(0L))
      .reduce(_ + _)
    df.filter(nWords.between(50L, 100000L) &&
      (aggregate(words, lit(0L), (a, w) => a + length(w).cast("long"))
        .cast("double") / wordsD).between(3.0, 10.0) &&
      hashes.cast("double") / wordsD <= 0.1 &&
      (ell3 + ellC).cast("double") / wordsD <= 0.1 &&
      bulletLines.cast("double") / nLines <= 0.9 &&
      ellipsisLines.cast("double") / nLines <= 0.3 &&
      alphaWords.cast("double") / wordsD >= 0.8 &&
      stopHits >= 2L)
  }

  /** The PRE-fusion duplicate line/paragraph filter (Repetition
    * .lineStats + filterDuplicateUnits as of round 12), inlined. */
  private def oldDupUnits(df: DataFrame, textCol: String): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    def frac(num: org.apache.spark.sql.Column,
             den: org.apache.spark.sql.Column) =
      when(den > 0, round(num.cast("double") / den.cast("double"), 6))
        .otherwise(lit(0.0))
    def charSum(units: org.apache.spark.sql.Column) =
      aggregate(units, lit(0L), (a, u) => a + length(u).cast("long"))
    val lines = filter(split(t, "\n"), l => length(trim(l)) > 0)
    val paras = filter(split(t, "\n\\s*\n"), p => length(trim(p)) > 0)
    val dl = array_distinct(lines); val dp = array_distinct(paras)
    df.filter(
      frac(size(lines) - size(dl), size(lines)) <= 0.3 &&
        frac(size(paras) - size(dp), size(paras)) <= 0.3 &&
        frac(charSum(lines) - charSum(dl), charSum(lines)) <= 0.2 &&
        frac(charSum(paras) - charSum(dp), charSum(paras)) <= 0.2)
  }

  /** The PRE-fusion C4 filter (TextAnalysis.c4Filter as of round 12),
    * inlined. */
  private def oldC4(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val keptLines = filter(split(t, "\n"), l =>
      size(filter(split(l, "\\s+"), w => length(w) > 0)) >= 5 &&
        l.rlike("[.!?\"”]\\s*$") &&
        !lower(l).contains("javascript"))
    val docBad = t.contains("{") || lower(t).contains("lorem ipsum")
    df.withColumn("__c4bad", docBad)
      .withColumn(textCol, array_join(keptLines, "\n"))
      .filter(!col("__c4bad") &&
        length(regexp_replace(col(textCol), "[^.!?]", "")) >= 3)
      .drop("__c4bad")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 3-line, terminal-punctuated pages so every rule family has work
    val pagesPath = "target/tmp/fusion_pages.parquet"
    val toks = split(col("text"), " ")
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), concat_ws("\n",
        concat(array_join(slice(toks, 1, 30), " "),
          lit(" we worked with that team and have seen it be of use.")),
        concat(array_join(slice(toks, 31, 15), " "), lit(".")),
        concat(array_join(slice(toks, 46, 15), " "), lit("!")))
        .as("text"))
      .write.mode("overwrite").parquet(pagesPath)
    val pages = spark.read.parquet(pagesPath)
    val n = pages.count()

    def time(label: String)(mk: => DataFrame): Unit = {
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val kept = mk.count()
        println(f"[fusion] $label rep$i: ${(System.nanoTime() - t0) / 1e9}%6.2fs kept=$kept/$n")
      }
    }
    // warm both paths once
    oldDupUnits(oldGopherFilter(oldC4(pages.limit(200), "text"), "text"), "text").count()
    graft.llm.TextAnalysis.gopherRulesFilter(
      graft.llm.TextAnalysis.c4Filter(pages.limit(200), "text"), "text").count()

    time("OLD c4->gopher->dup (built-in chains)") {
      oldDupUnits(oldGopherFilter(oldC4(pages, "text"), "text"), "text")
    }
    time("NEW c4->gopher_rules (fused walk)") {
      graft.llm.TextAnalysis.gopherRulesFilter(
        graft.llm.TextAnalysis.c4Filter(pages, "text"), "text")
    }
    spark.stop()
  }
}
