package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Supervised-label generation over event streams — the step that
  * turns raw activity into training targets without leaking the
  * future into features. First member: future-activity labels
  * ("will this user act again within H?"), the churn/retention
  * prediction target.
  *
  * Semantics per event: `next_gap` = time to the SAME key's next
  * event (null on the key's last event), `label_active` = that gap is
  * within the horizon, and `label_censored` = the event sits within
  * one horizon of the key's observation end, where "no further
  * activity" is not yet knowable — a model trained on censored rows
  * as negatives learns the dataset boundary, not churn, so the flag
  * lets callers drop or specially-weight them (the same censoring
  * insight as [[Survival]], applied to labeling).
  *
  * Exactness: gaps are exact long tick deltas; the label compares
  * integers. Ties on equal timestamps order by `idCol`, so labels are
  * engine-deterministic. Scale shape: ONE hash exchange on the keys —
  * a lead() and a per-key max in the same sorted window pass; no
  * self-join, no per-row subquery. */
object Labels {

  private def q(c: String): Column = col("`" + c.replace("`", "``") + "`")

  /** @param horizon label window in microseconds (timestamp column)
    *                or plain units (integral column)
    * @param asOfEnd observation end in the same ticks; None derives
    *                the corpus max timestamp (1-row broadcast, the
    *                stats-attachment pattern). The end must be
    *                CORPUS-wide, not per key — a key's own last event
    *                would mark itself censored even when the data
    *                proves years of silence.
    * @return input + (next_gap long|null, label_active boolean,
    *         label_censored boolean) */
  def futureActivity(df: DataFrame, keyCols: Seq[String], tsCol: String,
                     idCol: String, horizon: Long,
                     asOfEnd: Option[Long] = None): DataFrame = {
    require(keyCols.nonEmpty,
      "futureActivity needs at least one key column")
    (keyCols ++ Seq(tsCol, idCol)).foreach(c =>
      require(df.columns.contains(c),
        s"column '$c' not in ${df.columns.mkString(", ")}"))
    require(horizon > 0, s"horizon must be positive, got $horizon")
    graft.llm.Guards.requireFreshColumns(df,
      Seq("next_gap", "label_active", "label_censored", "__t", "__nt",
        "__end"), "Labels.futureActivity")
    val ord = df.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.TimestampType => unix_micros(q(tsCol))
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType => q(tsCol).cast("long")
      case other => throw new IllegalArgumentException(
        s"futureActivity time column must be timestamp or integral, got $other")
    }
    val w = Window.partitionBy(keyCols.map(q): _*).orderBy(ord, q(idCol))
    val ticked = df.withColumn("__t", ord)
    val withEnd = asOfEnd match {
      case Some(e) => ticked.withColumn("__end", lit(e))
      case None => ticked.crossJoin(
        broadcast(ticked.agg(max(col("__t")).as("__end"))))
    }
    withEnd
      .withColumn("__nt", lead(col("__t"), 1).over(w))
      .withColumn("next_gap", col("__nt") - col("__t"))
      .withColumn("label_active",
        coalesce(col("next_gap") <= horizon, lit(false)))
      // not yet active AND too close to the observation end to know
      .withColumn("label_censored",
        !col("label_active") && col("__end") - col("__t") < lit(horizon))
      .drop("__t", "__nt", "__end")
  }
}
