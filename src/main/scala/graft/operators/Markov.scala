package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order Markov transition estimation over per-key event
  * sequences — "after a view, how often does a click follow?" The
  * navigation/behavior-model companion to [[Funnel]] (which fixes the
  * stage order up front; transitions LEARN the order structure), and
  * the classic input to next-event prediction, anomaly detection on
  * session flows, and PageRank-style random-surfer models.
  *
  * Semantics: within each key's timeline (ordered by `tsCol`, then
  * `tieCols` for a total order), every adjacent pair (state_i,
  * state_{i+1}) is one observed transition. Output: (from_state,
  * to_state, n, p) where p is the row-normalized probability over
  * each from_state's outgoing transitions. Null states and rows
  * whose key has a single event contribute nothing.
  *
  * Scale shape: ONE window exchange (hash-partitioned by key,
  * per-key sort) to form adjacent pairs via lag, then ONE aggregation
  * over (from, to) — states are small strings/ids, so both shuffles
  * are narrow. The per-from normalizer rides a second aggregation on
  * the GROUPED counts (|states|² rows at most), not the raw events,
  * then a broadcast-sized join. No self-join of events, no collect. */
object Markov {

  def transitions(df: DataFrame, keyCols: Seq[String], tsCol: String,
                  stateCol: String, tieCols: Seq[String] = Seq.empty): DataFrame = {
    (keyCols ++ Seq(tsCol, stateCol) ++ tieCols).foreach(c =>
      require(df.columns.contains(c), s"no such column '$c'"))
    require(keyCols.nonEmpty, "keyCols must be non-empty")

    val order: Seq[Column] = (col(tsCol) +: tieCols.map(col))
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    // Catalyst prunes the window input to (keys, ts, ties, state) —
    // no explicit projection needed, and the order columns keep their
    // names for the window spec
    val pairs = df
      .filter(col(stateCol).isNotNull && col(tsCol).isNotNull)
      .withColumn("__from", lag(col(stateCol), 1).over(w))
      .filter(col("__from").isNotNull)

    val counts = pairs.groupBy(col("__from").as("from_state"),
        col(stateCol).as("to_state"))
      .agg(count(lit(1)).as("n"))
    // normalizer over the aggregated counts (tiny), broadcast back
    val totals = counts.groupBy(col("from_state"))
      .agg(sum(col("n")).as("__tot"))
    counts.join(broadcast(totals), Seq("from_state"))
      .select(col("from_state"), col("to_state"), col("n"),
        (col("n").cast("double") / col("__tot")).as("p"))
  }
}
