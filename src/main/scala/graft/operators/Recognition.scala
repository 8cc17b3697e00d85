package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Day-weighted calendar-month revenue recognition — the finance
  * warehouse staple: a contract (subscription, service line) spanning
  * [start, end] recognizes its value across the calendar months it
  * overlaps, proportionally to the days of service in each month, with
  * the recognized cents summing EXACTLY to the contract total (an
  * auditor reconciles the ledger; "± a few cents from float rounding"
  * is a finding).
  *
  * Built by composition: one narrow month explode
  * (`sequence(month(start), month(end))` — array length = span months,
  * no join, no calendar table), day-overlap weights in exact integer
  * day arithmetic, then [[Allocation.prorate]] (Hamilton
  * largest-remainder) allocates the fixed-point total across the
  * months — floor shares first, leftover cents to the largest
  * remainders, ties broken by month ascending. Exactness is inherited:
  * Σ recognized ≡ round(value · 10^scale) per contract by
  * construction.
  *
  * Scale shape: the explode is narrow (bounded by span months);
  * proration is per-key windows over ONE hash exchange on the
  * contract id. Degenerate spans are loud: end < start is a data bug
  * (`raise_error`), not a zero. */
object Recognition {

  private def q(c: String): Column = col("`" + c.replace("`", "``") + "`")

  /** @param idCol    unique contract/line id (the proration group)
    * @param startCol first service day (date or castable)
    * @param endCol   last service day, INCLUSIVE (date or castable)
    * @param valueCol money total to recognize
    * @param scale    fixed-point decimals (2 = cents)
    * @return (idCol, month_start, days, recognized) — `recognized` in
    *         scaled units (long), one row per overlapped month */
  def byMonth(df: DataFrame, idCol: String, startCol: String,
              endCol: String, valueCol: String, scale: Int = 2)
      : DataFrame = {
    Seq(idCol, startCol, endCol, valueCol).foreach(c =>
      require(df.columns.contains(c),
        s"column '$c' not in ${df.columns.mkString(", ")}"))
    graft.llm.Guards.requireFreshColumns(df,
      Seq("month_start", "days", "recognized", "__rg_s", "__rg_e"),
      "Recognition.byMonth")
    val start = to_date(q(startCol))
    val end = to_date(q(endCol))
    val checked = df
      .withColumn("__rg_s", start)
      .withColumn("__rg_e",
        when(end < start, raise_error(concat(
            lit("recognition: end before start for id "),
            q(idCol).cast("string"))))
          .otherwise(end))
    val monthly = checked
      .select(q(idCol), q(valueCol), col("__rg_s"), col("__rg_e"),
        explode(sequence(trunc(col("__rg_s"), "MM"),
          trunc(col("__rg_e"), "MM"),
          expr("interval 1 month"))).as("month_start"))
      .withColumn("days",
        datediff(least(col("__rg_e"), last_day(col("month_start"))),
          greatest(col("__rg_s"), col("month_start"))) + 1)
    Allocation.prorate(monthly, Seq(idCol), "days", valueCol,
        "month_start", totalScale = scale, outCol = "recognized")
      .select(q(idCol), col("month_start"), col("days").cast("long"),
        col("recognized"))
  }
}
