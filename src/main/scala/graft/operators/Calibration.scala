package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Classifier calibration (reliability diagram data): bin predictions
  * by confidence and compare each bin's MEAN predicted probability
  * against its OBSERVED positive rate — the standard check before a
  * model's scores gate anything (a quality classifier that says "0.9"
  * should be right ~90% of the time there). [[ece]] reduces the
  * detail to the expected calibration error with the usual 10-bin
  * convention.
  *
  * Exactness: scores snap to fixed point (6 decimals) so per-bin
  * score sums are exact decimals; observed rates are exact-count
  * ratios; every reported number is a fixed double sequence rounded
  * tie-safely. All `bins` bins report (zero counts included).
  *
  * Scale shape: one shuffle-free binning projection + a bins-keyed
  * aggregation; the scaffold join is bins-sized. */
object Calibration {

  private def q(c: String): Column = col("`" + c.replace("`", "``") + "`")
  private val Scale = 1000000L

  /** @param scoreCol predicted probability in [0, 1]
    * @param labelCol boolean (or 0/1) actual outcome
    * @return one row per bin: (bin, n, mean_predicted, observed_rate,
    *         gap) — mean/rate null for empty bins */
  def reliability(df: DataFrame, scoreCol: String, labelCol: String,
                  bins: Int = 10, roundTo: Int = 6): DataFrame = {
    require(bins >= 2 && bins <= 100, s"bins must be in [2, 100]: $bins")
    val rf = math.pow(10.0, roundTo)
    val si = floor(q(scoreCol).cast("double") * Scale + 0.5).cast("long")
    val binned = df
      .where(q(scoreCol).isNotNull && q(labelCol).isNotNull &&
        q(scoreCol) >= 0 && q(scoreCol) <= 1)
      .select(si.as("__s"),
        when(q(labelCol).cast("boolean"), 1L).otherwise(0L).as("__y"))
      .groupBy(least(floor(col("__s") * bins / Scale), lit(bins - 1L))
        .cast("long").as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("__s").cast(DecimalType(38, 0))).as("__ss"),
        sum(col("__y")).as("__pos"))
    val spark = df.sparkSession
    import spark.implicits._
    val scaffold = (0 until bins).map(_.toLong).toDF("bin")
    scaffold.join(binned, Seq("bin"), "left")
      .select(col("bin"), coalesce(col("n"), lit(0L)).as("n"),
        when(col("n") > 0, floor(col("__ss").cast("double")
          / col("n").cast("double") / Scale * rf + 0.5) / rf)
          .as("mean_predicted"),
        when(col("n") > 0, floor(col("__pos").cast("double")
          / col("n").cast("double") * rf + 0.5) / rf)
          .as("observed_rate"))
      .withColumn("gap",
        abs(col("mean_predicted") - col("observed_rate")))
  }

  /** Expected calibration error over a [[reliability]] detail frame:
    * ECE = Σ_bins (n_b/N)·gap_b, on the detail's rounded bin values
    * (a bins-sized frame — the sum is a driver-free single-row agg,
    * pinned by units rather than the oracle like the PSI summary). */
  def ece(detail: DataFrame): DataFrame =
    detail.where(col("n") > 0)
      .agg(sum(col("n")).as("__t"),
        sum(col("n").cast("double") * col("gap")).as("__w"))
      .select((floor(col("__w") / col("__t").cast("double") * 1e6 + 0.5)
        / 1e6).as("ece"))
}
