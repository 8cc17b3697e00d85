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

  /** Top-N + "Others" rollup (the BI report shape): per group, the N
    * largest items by an aggregated measure keep their own row; every
    * remaining item collapses into ONE `othersLabel` row whose value is
    * the EXACT complement (group total − top-N total, decimal
    * arithmetic — the report's rows always reconcile to the group
    * total). Ranks are deterministic (value desc, item asc); an
    * Others row appears only when something was actually collapsed and
    * carries the collapsed item count.
    *
    * Scale shape: one map-side-combined groupBy reduces the data to
    * (group, item) totals; the rank window runs per group over that
    * aggregated frame (distinct items per group — orders of magnitude
    * below row count; for integral-measure million-item groups, the
    * bounded [[topK]] shape is the alternative), and the Others
    * complement is a second tiny aggregation — values never shuffle
    * twice.
    *
    * @return (groupCols..., item, value, rank, is_others,
    *         items_collapsed) — value in original units (double),
    *         rank null on the Others row */
  def topNOthers(df: DataFrame, groupCols: Seq[String], itemCol: String,
                 valueCol: String, n: Int, othersLabel: String = "Others",
                 scale: Int = 2): DataFrame = {
    require(groupCols.nonEmpty, "topNOthers needs at least one group column")
    (groupCols ++ Seq(itemCol, valueCol)).foreach(c =>
      require(df.columns.contains(c),
        s"column '$c' not in ${df.columns.mkString(", ")}"))
    require(n >= 1, s"n must be >= 1, got $n")
    require(scale >= 0 && scale <= 6, s"scale must be in [0,6], got $scale")
    val q = (c: String) => col("`" + c.replace("`", "``") + "`")
    val pow = math.pow(10.0, scale)
    val perItem = df.groupBy((groupCols :+ itemCol).map(q): _*)
      .agg(floor(sum(q(valueCol).cast("double")) * pow + 0.5).cast("long")
        .as("__wi"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(q): _*)
      .orderBy(col("__wi").desc, q(itemCol).asc)
    val ranked = perItem.withColumn("__rk", row_number().over(w))
    val top = ranked.where(col("__rk") <= n).select(
      groupCols.map(q) ++ Seq(
        q(itemCol).cast("string").as("item"),
        (col("__wi").cast("double") / pow).as("value"),
        col("__rk").as("rank"),
        lit(false).as("is_others"),
        lit(null).cast("long").as("items_collapsed")): _*)
    val others = ranked.where(col("__rk") > n)
      .groupBy(groupCols.map(q): _*)
      .agg(sum(col("__wi")).as("__ow"), count(lit(1)).as("__oc"))
      .select(groupCols.map(q) ++ Seq(
        lit(othersLabel).as("item"),
        (col("__ow").cast("double") / pow).as("value"),
        lit(null).cast("int").as("rank"),
        lit(true).as("is_others"),
        col("__oc").as("items_collapsed")): _*)
    top.unionByName(others)
  }
}
