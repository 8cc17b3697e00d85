package graft.llm

import org.apache.spark.sql.DataFrame

/** Shared input checks for operators that append fixed-name columns:
  * a collision with an existing column would silently overwrite user
  * data, so every such operator fails loudly instead
  * ([[Repetition.stats]], [[Urls.analyze]], [[Boilerplate.score]]). */
private[graft] object Guards {

  def requireFreshColumns(df: DataFrame, names: Seq[String],
                          op: String): Unit = {
    val clash = df.columns.toSet.intersect(names.toSet)
    require(clash.isEmpty,
      s"$op would overwrite existing column(s) " +
        s"${clash.toSeq.sorted.mkString(", ")} — rename them first")
  }
}
