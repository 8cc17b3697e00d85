package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** k-anonymity assessment (Sweeney 2002): a row is re-identifiable
  * when its quasi-identifier combination (zip × birth-year × gender …)
  * is shared by fewer than k rows — the classic governance gate before
  * a dataset leaves the building. This reports every equivalence class
  * under its quasi-identifiers with its size and risk flag, plus a
  * one-row corpus summary; [[suppress]] enforces the policy by
  * dropping the risky rows (suppression — the baseline mechanism;
  * generalization hierarchies are the caller's domain knowledge).
  *
  * Scale shape: ONE keys-only aggregation on the quasi-identifier
  * tuple for the class report; enforcement is a semi-join of the
  * original rows against the passing classes — full rows never ride
  * the counting shuffle. */
object Privacy {

  private def q(c: String): Column = col("`" + c.replace("`", "``") + "`")

  /** Equivalence-class report: one row per distinct quasi-identifier
    * combination — (qi..., class_size, at_risk). Null QI values group
    * as their own class (SQL grouping semantics, mirrored by any
    * engine). */
  def kAnonymityClasses(df: DataFrame, quasiIds: Seq[String],
                        k: Int): DataFrame = {
    require(quasiIds.nonEmpty, "k-anonymity needs quasi-identifier columns")
    require(k >= 2, s"k must be >= 2, got $k")
    quasiIds.foreach(c => require(df.columns.contains(c),
      s"no such column '$c'"))
    df.groupBy(quasiIds.map(q): _*)
      .agg(count(lit(1)).as("class_size"))
      .withColumn("at_risk", col("class_size") < k)
  }

  /** One-row corpus summary: total rows, risky classes, risky rows,
    * and the anonymity level actually achieved (the smallest class —
    * the dataset IS min-class-k-anonymous). */
  def kAnonymitySummary(df: DataFrame, quasiIds: Seq[String],
                        k: Int): DataFrame =
    kAnonymityClasses(df, quasiIds, k)
      .agg(sum(col("class_size")).as("n_rows"),
        count(lit(1)).as("n_classes"),
        sum(when(col("at_risk"), lit(1L)).otherwise(0L))
          .as("risky_classes"),
        sum(when(col("at_risk"), col("class_size")).otherwise(0L))
          .as("risky_rows"),
        min(col("class_size")).as("achieved_k"))

  /** Enforce by suppression: keep only rows whose quasi-identifier
    * class reaches size k. Full rows come back via one semi-join on
    * the passing classes. */
  def suppress(df: DataFrame, quasiIds: Seq[String], k: Int): DataFrame = {
    val ok = kAnonymityClasses(df, quasiIds, k)
      .where(!col("at_risk"))
      .select(quasiIds.map(c => q(c).as(s"__ok_$c")): _*)
    // NULL-SAFE equality: a null quasi-identifier is its own class and
    // must match itself — plain `=` would silently suppress every
    // null-QI row regardless of its class size
    val cond = quasiIds.map(c => q(c) <=> col(s"`__ok_$c`")).reduce(_ && _)
    df.join(ok, cond, "left_semi")
  }
}
