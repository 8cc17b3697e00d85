package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TopK.top_k_longs

/** Grouped top-k: the k best rows per group by an integral sort key,
  * deterministic tie-break by smallest id. The reference engine has no
  * grouped ranking at all (its transfers are row-independent); this is
  * the curation primitive behind "keep the 5 longest documents per
  * language" / "top sources per domain" selection steps.
  *
  * Scale shape: ONE hash aggregation on the group keys using the native
  * bounded [[graft.functions.TopK.TopKLongs]] buffer — the map side
  * already reduces every (partition, group) to k rows before the
  * shuffle, and no Window/full-group sort appears anywhere in the plan
  * (asserted in PlanSpec). The classic `row_number() <= k` formulation
  * shuffles and sorts entire groups; on a skewed corpus the hot group's
  * sort is the job's critical path. Here per-group state is 2k longs at
  * every stage regardless of group size.
  *
  * The id rejoin to recover non-integral payload columns is a
  * broadcast-sized join ONLY when the group count is small; callers at
  * scale keep the (group, rank, id, key) result and join lazily. */
object GroupTopK {

  /** (groupCols..., rank, id, key) — rank is 1-based in (key, id) order. */
  def topK(df: DataFrame, groupCols: Seq[String], keyCol: String,
           idCol: String, k: Int, desc: Boolean = true): DataFrame = {
    require(groupCols.nonEmpty, "group_topk needs at least one group column")
    val gs: Seq[Column] = groupCols.map(col)
    df.groupBy(gs: _*)
      .agg(top_k_longs(col(keyCol), col(idCol), k, desc).as("__topk"))
      .select(gs :+ posexplode(col("__topk")).as(Seq("__pos", "__row")): _*)
      .select(gs ++ Seq((col("__pos") + 1).cast("int").as("rank"),
        col("__row")("id").as(idCol), col("__row")("key").as(keyCol)): _*)
  }
}
