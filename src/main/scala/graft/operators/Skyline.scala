package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier): the rows not DOMINATED on two
  * criteria — "biggest part at the lowest price", "fastest route with
  * the fewest hops", "highest-quality doc with the fewest tokens".
  * Row r dominates row s when r is at least as good on both dimensions
  * and strictly better on at least one; the skyline is every
  * undominated row. Each dimension independently maximizes or
  * minimizes; rows with a null in either dimension are excluded (null
  * is not comparable, so it can neither dominate nor survive).
  *
  * Scale shape: the naive spelling is a NOT-EXISTS self-join — O(n²)
  * per key and a guaranteed nested loop. In 2-D the skyline has a
  * sort-based identity: a row survives iff its y is its x-group's best
  * AND strictly beats the best y among all strictly-better-x groups.
  * That "best over the better prefix" is the same cumulative the
  * order-statistic family computes, so this rides the
  * [[Distributions]] pattern — ONE map-side-combined groupBy to a
  * per-(key, x) frame, a RANGE-partitioned parallel prefix MAX over it
  * (per-partition subtotals → a tiny keys×width offsets frame →
  * broadcast back), and one equi-join on (key, x) to recover the
  * surviving rows. No serial stage wider than keys × shuffle-width
  * rows, no self-join, no nested loop. Ties on BOTH dimensions are
  * mutually undominating, so all such duplicates survive — matching
  * the NOT-EXISTS semantics the oracle replays.
  *
  * Two dimensions only, by design: the sort-based identity is what
  * makes the operator exact without a pairwise step; d>2 skylines need
  * block-nested or grid partitioning with genuinely pairwise work. */
object Skyline {

  private def q(c: String): Column = col("`" + c.replace("`", "``") + "`")

  /** @param keyCols  optional grouping — a skyline per key set
    * @param xCol     first criterion column (any orderable type)
    * @param yCol     second criterion column
    * @param maximizeX true → larger x is better; false → smaller
    * @param maximizeY likewise for y
    * @return the undominated input rows, original columns intact */
  def skyline(df: DataFrame, keyCols: Seq[String], xCol: String, yCol: String,
              maximizeX: Boolean = true, maximizeY: Boolean = true)
      : DataFrame = {
    (keyCols :+ xCol :+ yCol).foreach(c => require(df.columns.contains(c),
      s"column '$c' not in ${df.columns.mkString(", ")}"))
    require(xCol != yCol, "skyline dimensions must be two distinct columns")
    graft.llm.Guards.requireFreshColumns(df,
      Seq("__best_y", "__pid", "__po", "__prev", "__sk_best_y") ++
        (keyCols :+ xCol).map("__sk_" + _), "Skyline.skyline")

    // flip minimized dimensions into canonical maximize-maximize form
    // via ordering direction (no value negation — works for any type)
    def better(dir: Boolean, c: Column) = if (dir) c.desc else c.asc
    val bestY: Column => Column = if (maximizeY) max else min
    // strict "beats": a > b in the dimension's better-direction
    def beatsY(a: Column, b: Column) =
      if (maximizeY) a > b else a < b

    val rows = df.where(q(xCol).isNotNull && q(yCol).isNotNull)
    // per-(key, x) best y — map-side combined, the only full-data shuffle
    val perX = rows.groupBy((keyCols :+ xCol).map(q): _*)
      .agg(bestY(q(yCol)).as("__best_y"))

    // parallel prefix best over strictly-better x groups:
    // 1. range-partition in better-x order (global order, full width)
    val parts = perX
      .repartitionByRange((keyCols.map(q) :+ better(maximizeX, q(xCol))): _*)
      .withColumn("__pid", spark_partition_id())
    // 2. tiny offsets frame: each partition's best-so-far from the
    //    partitions strictly before it (keys × width rows)
    val wOff = Window.partitionBy(keyCols.map(q): _*).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = parts
      .groupBy((keyCols.map(q) :+ col("__pid")): _*)
      .agg(bestY(col("__best_y")).as("__pb"))
      .withColumn("__po", bestY(col("__pb")).over(wOff))
      .drop("__pb")
    // 3. finish within each partition: best y among strictly-better x
    //    (x values are distinct per key here, so "previous rows" in
    //    better-x order is exactly the strictly-better prefix)
    val wIn = Window.partitionBy((keyCols.map(q) :+ col("__pid")): _*)
      .orderBy(better(maximizeX, q(xCol)))
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = parts.join(broadcast(offs), keyCols :+ "__pid")
      .withColumn("__prev", {
        val inPart = bestY(col("__best_y")).over(wIn)
        if (maximizeY) greatest(col("__po"), inPart) // nulls lose greatest
        else least(col("__po"), inPart)              // and least
      })
      // survive: no better-x group at all, or strictly beat their best
      .where(col("__prev").isNull || beatsY(col("__best_y"), col("__prev")))
      .select((keyCols :+ xCol).map(q) :+ col("__best_y"): _*)
    // recover the full surviving rows: y must equal its x-group's best.
    // Renamed probe side — frontier descends from `rows`, and grouping
    // attributes keep their exprIds, so a direct self-join would be
    // ambiguous
    val probe = frontier.toDF(
      (keyCols :+ xCol).map("__sk_" + _) :+ "__sk_best_y": _*)
    val cond = ((keyCols :+ xCol).map(c => q(c) === col("__sk_" + c)) :+
      (q(yCol) === col("__sk_best_y"))).reduce(_ && _)
    rows.join(probe, cond).select(df.columns.toSeq.map(q): _*)
  }
}
