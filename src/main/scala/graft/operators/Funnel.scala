package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered funnel analysis: for each key, the earliest time every
  * stage is reached IN ORDER — stage i counts only events STRICTLY
  * after stage i-1's reach time (the product-analytics "view →
  * click → purchase" conversion question).
  *
  * One window pass computes a running reach-time per stage over the
  * time-sorted events (`min` of the stage's qualifying timestamps so
  * far, where "qualifying" reads the PREVIOUS stage's running
  * reach-time); because events are time-ordered, each running min's
  * final value equals the true sequential-funnel time, which is what
  * the per-key aggregate then takes. Same-timestamp events never
  * satisfy the strict `>`, so ties between stages resolve identically
  * here and in the oracle's join-chain replay.
  *
  * Scale shape: ONE exchange. The window partitions by key and the
  * closing groupBy reuses that partitioning, so a billion-user event
  * log shuffles once; the join-chain formulation the oracle replays
  * (one join + agg per stage) would shuffle the log per stage.
  * Output: keyCols, `t_<stage>` per stage, `stages_reached`. */
object Funnel {

  private def q(c: String): Column = col("`" + c.replace("`", "``") + "`")

  def funnel(df: DataFrame, keyCols: Seq[String], tsCol: String,
             typeCol: String, stages: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "funnel needs at least one key column")
    require(stages.size >= 2, "funnel needs at least two stages")
    require(stages.distinct.size == stages.size, "stages must be distinct")
    (keyCols ++ Seq(tsCol, typeCol)).foreach(c =>
      require(df.columns.contains(c), s"no such column '$c'"))

    val w = Window.partitionBy(keyCols.map(q): _*).orderBy(q(tsCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    var cur = df
    stages.zipWithIndex.foreach { case (st, i) =>
      val cond =
        if (i == 0) q(typeCol) === st
        else q(typeCol) === st && q(tsCol) > col(s"__run_${i - 1}")
      cur = cur.withColumn(s"__run_$i",
        min(when(cond, q(tsCol))).over(w))
    }
    // each running min is non-increasing along the sort, so the group
    // min IS its final value
    val aggs = stages.zipWithIndex.map { case (st, i) =>
      min(col(s"__run_$i")).as(s"t_$st")
    }
    // fold in stage order so the LAST stage's check ends up outermost
    val reached = stages.zipWithIndex.foldLeft(lit(0)) {
      case (acc, (st, i)) =>
        when(col(s"t_$st").isNotNull, i + 1).otherwise(acc)
    }
    cur.groupBy(keyCols.map(q): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("stages_reached", reached)
  }
}
