package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** RFM segmentation (recency / frequency / monetary) — the classic
  * behavioral scoring every CRM warehouse ships: per entity, days
  * since last activity, activity count, exact money total, each
  * scored 1–5 by population quintile, concatenated into the familiar
  * segment code ("555" = recent, frequent, high-value).
  *
  * Scoring is RANK-based (score = 1 + floor(5·rank₀/n) over a total
  * deterministic order), not value-based ntile: ties break on the
  * entity id, so every engine and partitioning assigns identical
  * scores, and quintiles stay balanced even when a metric is heavily
  * tied (a value-quantile cut would dump half the population into one
  * score). Recency orders ASCENDING days (fresher = higher score
  * after inversion); frequency/monetary order ascending value.
  *
  * Scale shape: one keys-only aggregation to per-entity metrics, then
  * three global rank assignments via RANGE-partitioned sort (Spark's
  * orderBy shape — parallel, no single reducer) + zipWithIndex, the
  * same machinery as sorted-neighborhood blocking. Money accumulates
  * as exact decimals. */
object Rfm {

  private def q(c: String): Column = col("`" + c.replace("`", "``") + "`")

  /** Global deterministic 0-based rank of `by` (ties by `id`) attached
    * as `rankName` — range exchange + parallel sorts + zipWithIndex. */
  private def ranked(df: DataFrame, by: String, id: String,
                     rankName: String): DataFrame = {
    val sorted = df.orderBy(col(by), col(id))
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+ org.apache.spark.sql.types.StructField(
        rankName, org.apache.spark.sql.types.LongType, nullable = false))
    sorted.sparkSession.createDataFrame(
      sorted.rdd.zipWithIndex.map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
      }, schema)
  }

  /** @param asOf    the analysis instant (recency measures up to it)
    * @param scale   fixed-point decimals for the money column
    * @return (entity, recency_days, frequency, monetary, r, f, m,
    *         segment) with r/f/m in 1..5 and segment = "rfm" */
  def score(events: DataFrame, entityCol: String, tsCol: String,
            amountCol: String, asOf: java.sql.Timestamp,
            scale: Int = 2): DataFrame = {
    Seq(entityCol, tsCol, amountCol).foreach(c =>
      require(events.columns.contains(c), s"no such column '$c'"))
    val pow = math.pow(10.0, scale)
    val amt = floor(q(amountCol).cast("double") * pow + 0.5).cast("long")
    val metrics = events
      .where(q(tsCol).isNotNull && q(tsCol) <= lit(asOf))
      .groupBy(q(entityCol).as("entity"))
      .agg(
        floor((lit(asOf.getTime * 1000L) - unix_micros(max(q(tsCol))))
          .cast("double") / lit(86400e6)).cast("long").as("recency_days"),
        count(lit(1)).as("frequency"),
        sum(amt.cast(DecimalType(38, 0))).as("__m"))
      .withColumn("monetary",
        col("__m").cast("double") / pow)
      .drop("__m")
    val n = metrics.count()
    require(n > 0, "RFM needs at least one in-window event")
    def quint(rank: Column): Column =
      (lit(1L) + floor(rank.cast("double") * 5.0 / n.toDouble)
        .cast("long")).cast("int")
    // recency: MORE days = staler = LOWER score -> rank descending
    // days by ranking the negated value ascending
    val r1 = ranked(metrics.withColumn("__negrec", -col("recency_days")),
      "__negrec", "entity", "__rr").drop("__negrec")
    val r2 = ranked(r1, "frequency", "entity", "__rf")
    val r3 = ranked(r2, "monetary", "entity", "__rm")
    r3.select(col("entity"), col("recency_days"), col("frequency"),
        col("monetary"),
        quint(col("__rr")).as("r"), quint(col("__rf")).as("f"),
        quint(col("__rm")).as("m"))
      .withColumn("segment",
        concat(col("r").cast("string"), col("f").cast("string"),
          col("m").cast("string")))
  }
}
