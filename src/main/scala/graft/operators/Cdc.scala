package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC changelog apply: merge a change stream (upserts + deletes, each
  * stamped with a monotonically increasing sequence) into a snapshot —
  * the standard "materialize a table from its binlog/WAL feed" step a
  * warehouse refresh or a Delta/Hudi-style MERGE performs. The
  * reference engine only appends or truncate-loads whole tables
  * (engine.rs transfer loop); it has no keyed merge at all.
  *
  * Per key the HIGHEST (seqCol ++ orderCols) change wins: a winning
  * delete removes the key, a winning upsert replaces (or inserts) the
  * row, untouched snapshot keys pass through unchanged. (seqCol ++
  * orderCols) must totally order each key's changes — a tie would make
  * "latest" nondeterministic, the same contract [[Scd2]] documents.
  *
  * Scale shape (100 TB snapshot, GB-scale changelog — the production
  * ratio): the window sort runs over the CHANGES ONLY, never the
  * snapshot. The snapshot is touched by exactly one left-anti join on
  * the key columns — when the resolved changelog is broadcastable the
  * snapshot NEVER shuffles (plan-asserted in CdcSpec); when it isn't,
  * one hash exchange on the key is the floor for keyed deletion. The
  * union is a no-shuffle concatenation. */
object Cdc {

  private def q(c: String): Column = col("`" + c.replace("`", "``") + "`")

  /** @param snapshot  current table state (all payload columns)
    * @param changes   changelog rows: snapshot columns + seqCol + opCol
    * @param keyCols   primary-key columns (present on both sides)
    * @param seqCol    change-order column (commit LSN, batch id, ts)
    * @param opCol     string op column; `deleteOp` deletes, anything
    *                  else upserts
    * @param orderCols extra tie-break columns after seqCol */
  def apply(snapshot: DataFrame, changes: DataFrame, keyCols: Seq[String],
            seqCol: String, opCol: String, deleteOp: String = "D",
            orderCols: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "cdc apply needs at least one key column")
    keyCols.foreach { c =>
      require(snapshot.columns.contains(c), s"snapshot lacks key '$c'")
      require(changes.columns.contains(c), s"changes lack key '$c'")
    }
    (Seq(seqCol, opCol) ++ orderCols).foreach(c =>
      require(changes.columns.contains(c), s"changes lack column '$c'"))
    Seq(seqCol, opCol).foreach(c =>
      require(!snapshot.columns.contains(c),
        s"'$c' exists on the snapshot — seq/op columns belong to the " +
          "changelog only"))
    val payload = changes.columns.filterNot((Seq(seqCol, opCol) ++ orderCols).contains)
    require(payload.sorted.sameElements(snapshot.columns.sorted),
      s"changelog payload columns ${payload.sorted.mkString(",")} must " +
        s"equal snapshot columns ${snapshot.columns.sorted.mkString(",")}")

    // resolve the changelog: latest change per key (changes-only sort)
    val w = Window.partitionBy(keyCols.map(q): _*)
      .orderBy((seqCol +: orderCols).map(c => q(c).desc): _*)
    val latest = changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
    val upserts = latest.filter(q(opCol) =!= deleteOp)
      .select(snapshot.columns.map(q): _*)
    // the anti join ships ONLY the key columns of the resolved log
    val touched = latest.select(keyCols.map(q): _*)
    snapshot.join(touched, keyCols, "left_anti").unionByName(upserts)
  }
}
