package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Golden-record survivorship — the record-merge half of entity
  * resolution: several sources each carry a partial, possibly stale
  * view of the same entity; the output is ONE row per entity where
  * every field holds the value from the highest-priority source that
  * actually has it (non-null). The CRM-shaped sibling of
  * [[graft.llm.Dedup]]'s keep-best: keep-best picks one whole winning
  * ROW per duplicate group, survivorship fuses a row FIELD-WISE
  * across sources.
  *
  * Input: the union of all sources with a numeric `priorityCol`
  * (higher wins; priorities must be distinct per source or the merge
  * is ill-defined — ties within one entity are rejected loudly).
  * Output: one row per key with each payload field's surviving value,
  * the contributing source count, and `best_priority` (the highest
  * priority that supplied ANY field — i.e. the freshest source seen).
  *
  * Scale shape: ONE hash aggregation — including the tie guard. Each
  * field survives via `max(struct(priority, field))` over only the
  * rows where the field is non-null — partial-aggregating, no window,
  * no per-field join — so S sources × F fields costs the same single
  * shuffle as a plain groupBy, with (key, F small structs) as the
  * shuffle payload. The null guard sits on the STRUCT, not the field,
  * so a genuinely null field in the winning source does not leak an
  * older source's value (same single-struct discipline as
  * [[AsOfJoin]]). A duplicate priority within an entity makes field
  * survival nondeterministic between the tied sources, so it fails
  * fast with `raise_error` INSIDE the same aggregation (rows vs
  * distinct priorities per key) — the [[graft.validate.Validation]]
  * pattern, costing no second scan. */
object Survivorship {

  def goldenRecords(df: DataFrame, keyCols: Seq[String],
                    priorityCol: String, fieldCols: Seq[String]): DataFrame = {
    (keyCols ++ Seq(priorityCol) ++ fieldCols).foreach(c =>
      require(df.columns.contains(c), s"no such column '$c'"))
    require(fieldCols.nonEmpty, "fieldCols must be non-empty")

    val survivors = fieldCols.map { c =>
      max(when(col(c).isNotNull,
        struct(col(priorityCol).as("p"), col(c).as("v"))))
        .getField("v").as(c)
    }
    val agged = df.groupBy(keyCols.map(col): _*)
      .agg(survivors.head,
        (survivors.tail :+
          max(col(priorityCol)).as("best_priority") :+
          count(lit(1)).as("__n_rows") :+
          countDistinct(col(priorityCol)).as("__n_prios")): _*)
    agged
      .withColumn("n_sources",
        when(col("__n_rows") === col("__n_prios"), col("__n_rows"))
          .otherwise(raise_error(concat(
            lit("duplicate (key, priority) rows for key "),
            concat_ws(",", keyCols.map(c => col(c).cast("string")): _*),
            lit("; assign each source a distinct priority")))
            .cast("long")))
      .drop("__n_rows", "__n_prios")
  }
}
