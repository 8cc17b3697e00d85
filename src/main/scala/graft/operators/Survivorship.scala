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
  * Scale shape: ONE hash aggregation. Each field survives via
  * `max(struct(priority, field))` over only the rows where the field
  * is non-null — partial-aggregating, no window, no per-field join —
  * so S sources × F fields costs the same single shuffle as a plain
  * groupBy, with (key, F small structs) as the shuffle payload. The
  * null guard sits on the STRUCT, not the field, so a genuinely null
  * field in the winning source does not leak an older source's value
  * (same single-struct discipline as [[AsOfJoin]]). */
object Survivorship {

  def goldenRecords(df: DataFrame, keyCols: Seq[String],
                    priorityCol: String, fieldCols: Seq[String]): DataFrame = {
    (keyCols ++ Seq(priorityCol) ++ fieldCols).foreach(c =>
      require(df.columns.contains(c), s"no such column '$c'"))
    require(fieldCols.nonEmpty, "fieldCols must be non-empty")

    // a duplicate priority within one entity makes field survival
    // nondeterministic between the tied sources — reject loudly
    val tied = df.groupBy((keyCols :+ priorityCol).map(col): _*)
      .agg(count(lit(1)).as("n")).filter(col("n") > 1).limit(1).collect()
    require(tied.isEmpty,
      s"duplicate (key, priority) rows, e.g. ${tied.headOption}; " +
        "assign each source a distinct priority")

    val survivors = fieldCols.map { c =>
      max(when(col(c).isNotNull,
        struct(col(priorityCol).as("p"), col(c).as("v"))))
        .getField("v").as(c)
    }
    df.groupBy(keyCols.map(col): _*)
      .agg(survivors.head,
        (survivors.tail :+
          max(col(priorityCol)).as("best_priority") :+
          count(lit(1)).as("n_sources")): _*)
  }
}
