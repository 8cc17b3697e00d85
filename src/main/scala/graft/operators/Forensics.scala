package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Audit-analytics primitives: Benford first-digit conformance (the
  * classic fabricated-numbers screen) and market-concentration
  * measures (HHI, Gini) — the forensic/economic reports a warehouse
  * layer serves next to its aggregates.
  *
  * Everything here follows the engine's exactness discipline: counts
  * and value sums aggregate exactly (order-independent), and every
  * reported ratio is a fixed double sequence rounded tie-safely, so
  * the reports replay bit-for-bit in the SQL oracle. */
object Forensics {

  private def q(c: String): Column = col("`" + c.replace("`", "``") + "`")

  /** Benford's-law first-digit profile (Nigrini's audit screen):
    * genuine organic amounts lead with 1 ~30% of the time
    * (P(d) = log10(1 + 1/d)); fabricated or constrained data flattens
    * the curve. The leading digit comes from the fixed-point integer's
    * STRING form — exact, no log10 edge cases at powers of ten — and
    * power-of-ten scaling cannot change a leading significant digit,
    * so the `scale` snap is harmless. All nine digits report (zero
    * counts included); `dev` is the absolute observed−expected gap,
    * whose mean is Nigrini's MAD statistic.
    *
    * Scale shape: one shuffle-free projection + a 9-key aggregation. */
  def benford(df: DataFrame, valueCol: String, scale: Int = 2,
              roundTo: Int = 6): DataFrame = {
    val pow = math.pow(10.0, scale)
    val rf = math.pow(10.0, roundTo)
    val vi = abs(floor(q(valueCol).cast("double") * pow + 0.5).cast("long"))
    val counts = df
      .where(q(valueCol).isNotNull)
      .select(vi.as("__v")).where(col("__v") > 0)
      .select(substring(col("__v").cast("string"), 1, 1)
        .cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val spark = df.sparkSession
    import spark.implicits._
    val digits = (1 to 9).toDF("digit")
    val total = counts.agg(sum(col("n")).as("__t"))
    digits.join(counts, Seq("digit"), "left")
      .select(col("digit"), coalesce(col("n"), lit(0L)).as("n"))
      .crossJoin(broadcast(total))
      .withColumn("observed_p",
        floor(col("n").cast("double") / col("__t").cast("double")
          * rf + 0.5) / rf)
      .withColumn("expected_p",
        floor(log10(lit(1.0) + lit(1.0) / col("digit").cast("double"))
          * rf + 0.5) / rf)
      .withColumn("dev", abs(col("observed_p") - col("expected_p")))
      .drop("__t")
  }

  /** Per-key Herfindahl-Hirschman index + Gini coefficient over a
    * positive value column (revenue, volume): HHI on the 0–10000
    * points scale (10000 = monopoly; US-DOJ reads > 2500 as highly
    * concentrated), Gini in [0, 1) via the rank formulation
    * G = 2·Σ(rank·v) / (n·Σv) − (n+1)/n with ranks ordered
    * (value, member) for determinism under ties.
    *
    * Exactness: values snap to fixed point; Σv, Σv² and Σ(rank·v) are
    * exact decimal sums, so both indices are fixed double sequences.
    *
    * Scale shape: ONE window exchange per key for the ranks (group
    * sizes = members per market — the Rolling family's bound), then a
    * keys-only aggregation. */
  def concentration(df: DataFrame, keyCols: Seq[String], valueCol: String,
                    memberCol: String, scale: Int = 2,
                    roundTo: Int = 6): DataFrame = {
    require(keyCols.nonEmpty, "concentration needs at least one key column")
    val pow = math.pow(10.0, scale)
    val rf = math.pow(10.0, roundTo)
    val vi = floor(q(valueCol).cast("double") * pow + 0.5).cast("long")
    val w = Window.partitionBy(keyCols.map(q): _*)
      .orderBy(col("__v").asc, q(memberCol).asc)
    val ranked = df
      .where(q(valueCol).isNotNull && q(valueCol) >= 0)
      .select(keyCols.map(q) :+ q(memberCol) :+ vi.as("__v"): _*)
      .withColumn("__r", row_number().over(w).cast("long"))
    val agg = ranked.groupBy(keyCols.map(q): _*)
      .agg(count(lit(1)).as("n"),
        sum(col("__v").cast(DecimalType(38, 0))).as("__s"),
        sum((col("__v").cast(DecimalType(19, 0)) * col("__v"))
          .cast(DecimalType(38, 0))).as("__s2"),
        sum((col("__v").cast(DecimalType(19, 0)) * col("__r"))
          .cast(DecimalType(38, 0))).as("__rs"))
    val s = col("__s").cast("double")
    val hhi = col("__s2").cast("double") / (s * s) * 10000.0
    val gini = lit(2.0) * col("__rs").cast("double") /
      (col("n").cast("double") * s) -
      (col("n").cast("double") + 1.0) / col("n").cast("double")
    agg.select(keyCols.map(q) ++ Seq(col("n"),
      (s / pow).as("total"),
      when(col("__s") > 0, floor(hhi * rf + 0.5) / rf).as("hhi"),
      when(col("__s") > 0, floor(gini * rf + 0.5) / rf).as("gini")): _*)
  }
}
