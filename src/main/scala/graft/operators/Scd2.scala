package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) versioning: turn an update
  * stream ("user 7's plan became X at t") into interval-versioned
  * history rows — `valid_from` / `valid_to` / `is_current` — the
  * standard dimension shape every warehouse join expects, and the
  * one-join answer to "what was this entity's state when the fact
  * happened" (pair it with [[AsOfJoin]] or [[RangeJoin]]).
  *
  * The reference engine moves rows; it has no temporal versioning at
  * all. Here it is ONE window pass: hash-partition by the entity keys,
  * sort each entity's updates, `lead` closes every version at its
  * successor's timestamp (half-open intervals, the last version open).
  * Ties need `orderCols` to break them totally (update-id, source
  * sequence) — a nondeterministic version order would silently shuffle
  * history between runs, so sameness of (tsCol ++ orderCols) is the
  * caller's contract.
  *
  * Merging a new batch into existing history = `history(old versions ∪
  * new updates)`: lead() re-closes reopened tails automatically. The
  * whole pass stays one exchange either way. */
object Scd2 {

  private def q(c: String): Column = col("`" + c.replace("`", "``") + "`")

  def history(updates: DataFrame, keyCols: Seq[String], tsCol: String,
              orderCols: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "scd2 needs at least one key column")
    (keyCols :+ tsCol) ++ orderCols foreach { c =>
      require(updates.columns.contains(c), s"no such column '$c'") }
    Seq("valid_from", "valid_to", "is_current").foreach(c =>
      require(!updates.columns.contains(c),
        s"'$c' is reserved by scd2 — rename the input column"))
    val w = Window.partitionBy(keyCols.map(q): _*)
      .orderBy((tsCol +: orderCols).map(c => q(c).asc): _*)
    updates
      .withColumn("valid_from", q(tsCol))
      .withColumn("valid_to", lead(q(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
