package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: lay documents head-to-tail into fixed token-budget
  * training sequences ("packs"), the standard pre-training batching step
  * (docs are concatenated into one token stream and cut every `budget`
  * tokens; a document belongs to the pack where it STARTS, and
  * `spans_boundary` marks docs the cut splits across packs).
  *
  * This offset-packing formulation is a running sum + integer division —
  * exactly one shuffle (the window's hash partition by stream), then
  * arithmetic in whole-stage codegen. Exact first-fit bin packing is
  * inherently sequential (each decision depends on every bin's fill) and
  * cannot be expressed as a scalable plan; offset packing is what
  * large-scale pipelines actually run, because the straddling document
  * is split/continued at the boundary rather than re-shelved.
  *
  * Scale shape: one window per (groupCols, stream). A single ordered
  * stream would serialize the whole corpus through one task, so
  * `subStreams` shards documents into `n` deterministic independent
  * streams (portable-hash of the id — reproducible in any engine);
  * parallelism = groups × subStreams, each stream packed independently.
  * Each task needs only its running counter — O(1) state, any stream
  * length.
  */
object Packing {

  /** Assign every row a (stream, pack_id, pack_offset):
    *
    *  - `stream`: deterministic sub-stream of the row (portable hash of
    *    `orderCol` mod `subStreams`) — the parallelism unit;
    *  - `pack_id`: index of the budget-sized pack (within the stream)
    *    where this document's first token lands;
    *  - `pack_offset`: token offset of the document inside that pack;
    *  - `spans_boundary`: true when the document's last token falls in a
    *    later pack (the cut splits it).
    *
    * Documents are ordered by `orderCol` (must be unique within a
    * stream for a deterministic layout). Token counts come from
    * `tokensCol`. A document longer than `budget` spans several packs —
    * offset packing never drops or truncates; downstream consumers
    * split the text at the recorded offsets.
    */
  def packSequences(df: DataFrame, orderCol: String, tokensCol: String,
                    budget: Long, groupCols: Seq[String] = Nil,
                    subStreams: Int = 1): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    require(subStreams > 0, s"subStreams must be positive: $subStreams")
    val stream =
      if (subStreams == 1) lit(0L)
      else pmod(Sampling.portableBucket(col(orderCol)), lit(subStreams.toLong))
    val parts = (groupCols :+ "stream").map(col)
    val w = Window.partitionBy(parts: _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = df.withColumn("stream", stream)
      .withColumn("__cum", sum(col(tokensCol).cast("long")).over(w))
    val start = col("__cum") - col(tokensCol).cast("long")
    val last = col("__cum") - lit(1L) // offset of the doc's final token
    withCum
      .withColumn("pack_id", packIndex(start, budget))
      .withColumn("pack_offset", pmod(start, lit(budget)))
      .withColumn("spans_boundary",
        col(tokensCol) > 0 && packIndex(last, budget) > packIndex(start, budget))
      .drop("__cum")
  }

  /** floor(tokenOffset / budget), exact: the numerator is reduced to an
    * exact multiple of budget first, so the (double) division yields an
    * integer quotient, which IEEE division returns exactly for any
    * quotient < 2^53 — far past any one stream's token count. */
  private def packIndex(offset: Column, budget: Long): Column =
    ((offset - pmod(offset, lit(budget))) / lit(budget)).cast("long")

  /** Length-bucketed BATCH assignment — the padding-waste minimizer
    * for inference/eval serving: rows are grouped into length buckets
    * (`edges` are the exclusive upper bounds of all but the last,
    * open-ended bucket), ordered (tokens, id) inside each bucket, and
    * cut into fixed-size batches. Each batch then pads only to its
    * own maximum — batching unsorted corpora instead pads everything
    * to the global max (the classic GPU-hours leak).
    *
    * Output adds (bucket, batch_idx, batch_pos). Deterministic: the
    * (tokens, id) order is total, so the same corpus always yields
    * the same batches.
    *
    * Scale shape: ONE window exchange hash-partitioned by bucket —
    * |edges|+1 partitions of independent sorts. Buckets bound the
    * sort width; batches are arithmetic on the row number. */
  def bucketBatches(df: DataFrame, idCol: String, tokensCol: String,
                    edges: Seq[Long], batchSize: Int): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    require(edges.nonEmpty, "need at least one bucket edge")
    require(edges == edges.sorted && edges.distinct.size == edges.size,
      s"edges must be strictly increasing: ${edges.mkString(",")}")
    Seq(idCol, tokensCol).foreach(c =>
      require(df.columns.contains(c), s"no such column '$c'"))
    Guards.requireFreshColumns(df,
      Seq("bucket", "batch_idx", "batch_pos", "__rn"),
      "Packing.bucketBatches")
    val t = col(tokensCol).cast("long")
    val bucket = edges.zipWithIndex.foldRight(lit(edges.size.toLong)) {
      case ((e, i), acc) => when(t < e, lit(i.toLong)).otherwise(acc)
    }
    val w = Window.partitionBy(col("bucket")).orderBy(t, col(idCol))
    df.filter(t.isNotNull)
      .withColumn("bucket", bucket)
      .withColumn("__rn", row_number().over(w).cast("long") - 1L)
      .withColumn("batch_idx",
        ((col("__rn") - pmod(col("__rn"), lit(batchSize.toLong)))
          / lit(batchSize.toLong)).cast("long"))
      .withColumn("batch_pos", pmod(col("__rn"), lit(batchSize.toLong)))
      .drop("__rn")
  }

  /** Per-pack summary: docs per pack and tokens that START in the pack
    * (a boundary-spanning doc counts its full length here; pack fill is
    * `budget` by construction for all but each stream's last pack). */
  def packSummary(packed: DataFrame, tokensCol: String,
                  groupCols: Seq[String] = Nil): DataFrame =
    packed.groupBy((groupCols ++ Seq("stream", "pack_id")).map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokensCol).cast("long")).as("tokens_started"))
}
