package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Winsorization: clamp numeric columns to their exact
  * [pLo, pHi] order-statistic bounds — the standard outlier treatment
  * before training on heavy-tailed numerics. Bounds are ORDER
  * STATISTICS (value at 0-based sorted position `floor((n-1)·pLo)` /
  * `ceil((n-1)·pHi)`, nulls excluded), not interpolated quantiles, so
  * they are actual data values and replay exactly in any engine.
  *
  * Scale shape: ONE scan melts all requested columns into (col, value)
  * pairs, a map-side-combined groupBy collapses them to per-column
  * value DISTRIBUTIONS (distinct value + count), and
  * [[Distributions.cumulativeByKey]]'s range-partitioned parallel
  * prefix sums locate the two order statistics per column — no global
  * sort of the data and no serial pass over a column's distribution
  * (a near-unique column would otherwise serialize onto one reducer). The resulting |cols|-row bounds frame broadcasts back
  * onto the table as a single crossJoin(broadcast) — the whole thing
  * is one lazy plan, no driver-side collect. Clamped columns come back
  * as doubles under their original names.
  *
  * Null bounds (all-null column) leave values unchanged — the clamp is
  * a CASE, not greatest/least, so engines that disagree on
  * greatest(NULL, x) cannot diverge. */
object Winsorize {

  private def q(c: String): Column = col("`" + c.replace("`", "``") + "`")

  def clamp(df: DataFrame, cols: Seq[String],
            pLo: Double = 0.01, pHi: Double = 0.99): DataFrame = {
    require(cols.nonEmpty, "winsorize needs at least one column")
    require(pLo >= 0 && pHi <= 1 && pLo < pHi,
      s"need 0 <= pLo < pHi <= 1, got [$pLo, $pHi]")
    cols.foreach { c =>
      require(df.columns.contains(c), s"no such column '$c'")
      require(df.schema(c).dataType.isInstanceOf[NumericType],
        s"column '$c' (${df.schema(c).dataType.simpleString}) is not numeric")
    }
    // one scan → per-column value distribution
    val melted = df
      .select(explode(array(cols.map(c =>
        struct(lit(c).as("c"), q(c).cast("double").as("v"))): _*)).as("s"))
      .select(col("s.c").as("c"), col("s.v").as("v"))
      .where(col("v").isNotNull)
    // value with inclusive cumulative end e and count cnt covers
    // 0-based sorted positions [e-cnt, e-1]; parallel prefix sums —
    // no serial pass over a column's whole distribution
    val pos = Distributions.cumulativeByKey(
      melted.groupBy("c", "v").agg(count(lit(1)).as("cnt")))
    val kLo = floor((col("n") - 1) * lit(pLo))
    val kHi = ceil((col("n") - 1) * lit(pHi))
    def at(k: Column): Column =
      max(when(col("e") - col("cnt") <= k && k < col("e"), col("v")))
    val bounds = pos.groupBy("c").agg(at(kLo).as("lo"), at(kHi).as("hi"))
    // pivot to one row and broadcast back onto the table
    val pivots = cols.zipWithIndex.flatMap { case (c, i) => Seq(
      max(when(col("c") === lit(c), col("lo"))).as(s"__lo_$i"),
      max(when(col("c") === lit(c), col("hi"))).as(s"__hi_$i")) }
    val wide = bounds.groupBy().agg(pivots.head, pivots.tail: _*)
    val idx = cols.zipWithIndex.toMap
    df.crossJoin(broadcast(wide)).select(df.columns.toSeq.map { c =>
      idx.get(c) match {
        case Some(i) =>
          val v = q(c).cast("double")
          val lo = col(s"__lo_$i")
          val hi = col(s"__hi_$i")
          when(v < lo, lo).when(v > hi, hi).otherwise(v).as(c)
        case None => q(c)
      }
    }: _*)
  }
}
