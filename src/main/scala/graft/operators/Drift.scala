package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring via the Population Stability Index —
  * the standard "did this feature shift since training?" gate in
  * model-ops pipelines: PSI = Σ_bins (p_cur − p_base)·ln(p_cur/p_base),
  * with the conventional readings < 0.1 stable, 0.1–0.25 moderate
  * drift, > 0.25 action required.
  *
  * Numeric features bin EQUI-WIDTH over the baseline's own [min, max]
  * (fixed-point exact bounds; current-snapshot values outside the
  * baseline range clamp into the edge bins — out-of-range mass is
  * precisely the drift signal). Categorical features bin by value.
  * Empty bins take the conventional ε = 1e-4 substitute so the log
  * stays finite — spelled identically in the oracle, as is every
  * double op, so the index replays bit-for-bit.
  *
  * Scale shape: baseline bounds are ONE broadcast min/max row; both
  * snapshots then bin in a shuffle-free projection and aggregate to
  * `bins` keys-only counts. Nothing is quadratic, nothing sorts. */
object Drift {

  private def q(c: String): Column = col("`" + c.replace("`", "``") + "`")
  private val Eps = 1e-4

  /** Per-bin drift detail for a numeric column: (bin, n_base, n_cur,
    * p_base, p_cur, psi_contribution). Total PSI = sum of the
    * contributions ([[psiSummary]] does it). */
  def psiNumeric(base: DataFrame, current: DataFrame, valueCol: String,
                 bins: Int = 10, scale: Int = 4,
                 roundTo: Int = 6): DataFrame = {
    require(bins >= 2 && bins <= 1000, s"bins must be in [2, 1000]: $bins")
    val pow = math.pow(10.0, scale)
    def vi(df: DataFrame) = df.where(q(valueCol).isNotNull)
      .select(floor(q(valueCol).cast("double") * pow + 0.5)
        .cast("long").as("v"))
    val b = vi(base)
    val c = vi(current)
    val bounds = b.agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
    // equi-width bin over baseline bounds; constant baselines put
    // everything in bin 0; out-of-range clamps to the edge bins
    def bin(v: Column): Column =
      when(col("mx") === col("mn"), lit(0L)).otherwise(
        least(greatest(
          floor((v - col("mn")).cast("double") * bins /
            (col("mx") - col("mn")).cast("double")).cast("long"),
          lit(0L)), lit(bins - 1L)))
    def binned(df: DataFrame, mark: String) = df
      .crossJoin(broadcast(bounds))
      .groupBy(bin(col("v")).as("bin"))
      .agg(count(lit(1)).as(mark))
    psiFromCounts(
      binned(b, "n_base"), binned(c, "n_cur"), "bin", roundTo)
  }

  /** Per-category drift detail for a categorical column — same output
    * shape keyed by the category value (nulls are their own bin). */
  def psiCategorical(base: DataFrame, current: DataFrame,
                     catCol: String, roundTo: Int = 6): DataFrame = {
    def counts(df: DataFrame, mark: String) = df
      .groupBy(q(catCol).as("bin")).agg(count(lit(1)).as(mark))
    psiFromCounts(counts(base, "n_base"), counts(current, "n_cur"),
      "bin", roundTo)
  }

  /** One-row report over a per-bin detail frame: (psi, n_bins, level)
    * with the conventional stable/moderate/action thresholds decided
    * on the ROUNDED contributions (tie-safe on any engine). */
  def psiSummary(detail: DataFrame): DataFrame =
    detail.agg(
        floor(sum(col("psi_contribution")) * 1e6 + 0.5).cast("long")
          .as("__s"),
        count(lit(1)).as("n_bins"))
      .select((col("__s").cast("double") / 1e6).as("psi"), col("n_bins"))
      .withColumn("level",
        when(col("psi") < 0.1, "stable")
          .when(col("psi") < 0.25, "moderate")
          .otherwise("action"))

  /** EXACT two-sample Kolmogorov-Smirnov statistic — the
    * binning-free drift test PSI cannot be: D = max over values of
    * |F_base(v) − F_cur(v)|, sensitive to shape changes that leave
    * decile masses untouched. Returns one row (n_base, n_cur, d_stat,
    * at_value) with the statistic and the value where the CDFs
    * diverge most (ties on D broken by the smaller value —
    * deterministic on any engine).
    *
    * Scale shape: both samples reduce to fixed-point (value, count)
    * distributions, meet in a full-outer join padded with zero counts
    * so BOTH sides share one value axis, and the per-side cumulative
    * fractions ride [[Distributions.cumulativeByKey]]'s
    * range-partitioned parallel prefix sums — no single-reducer
    * window over the merged distribution. One final max reduces to a
    * row. */
  def ksStatistic(base: DataFrame, current: DataFrame, valueCol: String,
                  scale: Int = 4, roundTo: Int = 6): DataFrame = {
    val pow = math.pow(10.0, scale)
    def dist(df: DataFrame) = df.where(q(valueCol).isNotNull)
      .select(floor(q(valueCol).cast("double") * pow + 0.5)
        .cast("long").as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("cnt"))
    val merged = dist(base).withColumnRenamed("cnt", "ca")
      .join(dist(current).withColumnRenamed("cnt", "cb"),
        Seq("v"), "full_outer")
      .select(col("v"), coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    // one shared value axis, cumulative per side via the parallel
    // prefix sums; the side rides the key through an EXPLODE (a union
    // of two selects would duplicate the full-outer-join lineage into
    // both branches), and the two sides meet again through ONE pivot
    // aggregation on the value (a self-join would re-evaluate the
    // cumulative subtree per side)
    val long = merged.select(col("v"), explode(array(
        struct(lit("a").as("c"), col("ca").as("cnt")),
        struct(lit("b").as("c"), col("cb").as("cnt")))).as("x"))
      .select(col("x.c").as("c"), col("v"), col("x.cnt").as("cnt"))
    val cum = Distributions.cumulativeByKey(long)
    val rf = math.pow(10.0, roundTo)
    val pivoted = cum.groupBy(col("v"))
      .agg(max(when(col("c") === "a", col("e"))).as("ea"),
        max(when(col("c") === "a", col("n"))).as("na"),
        max(when(col("c") === "b", col("e"))).as("eb"),
        max(when(col("c") === "b", col("n"))).as("nb"))
    val gap = abs(col("ea").cast("double") / col("na").cast("double") -
      col("eb").cast("double") / col("nb").cast("double"))
    pivoted
      .select(col("v"), col("na"), col("nb"),
        (floor(gap * rf + 0.5) / rf).as("__g"))
      .agg(max(col("na")).as("n_base"), max(col("nb")).as("n_cur"),
        max(struct(col("__g"), (-col("v")).as("__nv"))).as("__best"))
      .select(col("n_base"), col("n_cur"),
        col("__best.__g").as("d_stat"),
        ((-col("__best.__nv")).cast("double") / pow).as("at_value"))
  }

  private def psiFromCounts(baseCounts: DataFrame, curCounts: DataFrame,
                            key: String, roundTo: Int): DataFrame = {
    val joined = baseCounts.join(curCounts, Seq(key), "full_outer")
      .select(col(key),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val totals = joined.agg(sum(col("n_base")).as("__tb"),
      sum(col("n_cur")).as("__tc"))
    val rf = math.pow(10.0, roundTo)
    def prop(n: Column, tot: Column): Column = {
      val p = n.cast("double") / tot.cast("double")
      when(n === 0L, lit(Eps)).otherwise(p)
    }
    joined.crossJoin(broadcast(totals))
      .withColumn("p_base", prop(col("n_base"), col("__tb")))
      .withColumn("p_cur", prop(col("n_cur"), col("__tc")))
      .withColumn("psi_contribution",
        floor((col("p_cur") - col("p_base")) *
          log(col("p_cur") / col("p_base")) * rf + 0.5) / rf)
      .select(col(key), col("n_base"), col("n_cur"),
        floor(col("p_base") * rf + 0.5).divide(rf).as("p_base"),
        floor(col("p_cur") * rf + 0.5).divide(rf).as("p_cur"),
        col("psi_contribution"))
  }
}
