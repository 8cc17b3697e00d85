package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A/B experiment readout: two-proportion z-test of every treatment
  * variant against the control — conversion rates, absolute and
  * relative lift, the pooled-variance z statistic and the
  * conventional two-sided 95% significance call. The closing step of
  * the funnel/attribution family: after the warehouse computes who
  * converted, this answers "did the variant actually move the
  * metric?"
  *
  * Exactness: inputs reduce to four exact integers per variant
  * (trials and conversions for variant and control); every reported
  * ratio is a fixed double sequence rounded tie-safely, and the
  * significance flag evaluates on the ROUNDED z against the
  * conventional 1.96 — deterministic on any engine. Degenerate pooled
  * variance (0% or 100% conversion in both arms) yields a null z and
  * an insignificant call, loudly documented rather than ±Inf.
  *
  * Scale shape: ONE keys-only aggregation to per-variant counts, a
  * broadcast of the single control row back onto the (tiny) variant
  * frame. Nothing scales with subjects except the first count. */
object AbTest {

  private val Z95 = 1.96

  /** @param subjects one row per experimental unit
    * @param convertedCol boolean (or 0/1) success indicator
    * @return one row per non-control variant: (variant, n_control,
    *         conv_control, n_variant, conv_variant, rate_control,
    *         rate_variant, abs_lift, rel_lift, z, significant_95) */
  def proportionTest(subjects: DataFrame, variantCol: String,
                     convertedCol: String, controlLabel: String,
                     roundTo: Int = 6): DataFrame = {
    require(subjects.columns.contains(variantCol) &&
      subjects.columns.contains(convertedCol),
      s"need ($variantCol, $convertedCol) in " +
        subjects.columns.mkString(", "))
    val rf = math.pow(10.0, roundTo)
    def r(c: Column) = floor(c * rf + 0.5) / rf
    val counts = subjects.groupBy(col(variantCol).as("variant"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(convertedCol).cast("boolean"), 1L).otherwise(0L))
          .as("x"))
    val control = counts.where(col("variant") === controlLabel)
      .select(col("n").as("n_control"), col("x").as("conv_control"))
    val variants = counts.where(col("variant") =!= controlLabel)
      .select(col("variant"), col("n").as("n_variant"),
        col("x").as("conv_variant"))
    val pc = col("conv_control").cast("double") /
      col("n_control").cast("double")
    val pv = col("conv_variant").cast("double") /
      col("n_variant").cast("double")
    val pPool = (col("conv_control") + col("conv_variant")).cast("double") /
      (col("n_control") + col("n_variant")).cast("double")
    val se = sqrt(pPool * (lit(1.0) - pPool) *
      (lit(1.0) / col("n_control").cast("double") +
        lit(1.0) / col("n_variant").cast("double")))
    val z = when(pPool > 0 && pPool < 1, r((pv - pc) / se))
    variants.crossJoin(broadcast(control))
      .select(col("variant"),
        col("n_control"), col("conv_control"),
        col("n_variant"), col("conv_variant"),
        r(pc).as("rate_control"), r(pv).as("rate_variant"),
        r(pv - pc).as("abs_lift"),
        when(col("conv_control") > 0, r((pv - pc) / pc)).as("rel_lift"),
        z.as("z"),
        coalesce(abs(z) >= Z95, lit(false)).as("significant_95"))
  }
}
