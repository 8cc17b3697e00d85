package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-size document chunking with overlap: long documents become
  * training/embedding-sized windows of `chunkTokens` whitespace tokens,
  * each window starting `chunkTokens - overlap` tokens after the
  * previous one (so consecutive chunks share `overlap` tokens of
  * context). The splitter every RAG/embedding pipeline runs before
  * vectorizing a corpus.
  *
  * Contract: tokens are the document's whitespace-separated words kept
  * verbatim (case and punctuation intact — this is a text splitter,
  * not the `\W+`-normalizing dedup tokenizer); chunk text rejoins them
  * with single spaces. Every non-empty document yields at least one
  * chunk; the final chunk may be shorter than `chunkTokens`; empty
  * documents yield none.
  *
  * Scale shape: tokenize → per-row `sequence`/`transform` of chunk
  * starts → `posexplode` — a pure projection + generator, NO shuffle;
  * output size is input tokens × (1 + overlap/step) with no
  * intermediate wider than one document. At 100 TB the explode
  * parallelizes with the scan partitions.
  */
object Chunking {

  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
                     chunkTokens: Int = 50, overlap: Int = 10): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be >= 1: $chunkTokens")
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap must be in [0, chunkTokens): $overlap vs $chunkTokens")
    val step = chunkTokens - overlap
    val toks = filter(split(col(textCol), "\\s+"), t => length(t) > 0)
    // nChunks = max(1, ceil((n - overlap) / step)); n + (step-overlap-1)
    // is always > 0, so the double floor is the integer ceiling exactly
    val d = df
      .withColumn("__tk", toks)
      .withColumn("__n", size(col("__tk")))
      .filter(col("__n") > 0)
      .withColumn("__nch", greatest(lit(1L),
        floor((col("__n") + lit(step - overlap - 1)).cast("double") / lit(step))
          .cast("long")))
    d.select(col(idCol), col("__tk"), col("__n"),
        posexplode(transform(sequence(lit(0L), col("__nch") - 1),
          i => i * step)).as(Seq("chunk_idx", "chunk_start")))
      .select(col(idCol),
        col("chunk_idx").cast("long").as("chunk_idx"),
        col("chunk_start").cast("long").as("chunk_start"),
        least(lit(chunkTokens.toLong), col("__n") - col("chunk_start"))
          .as("chunk_len"),
        concat_ws(" ",
          slice(col("__tk"), (col("chunk_start") + 1).cast("int"),
            lit(chunkTokens)))
          .as("chunk_text"))
  }
}
