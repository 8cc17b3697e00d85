package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Time- and volume-weighted averages — the irregular-sampling
  * location estimates a plain AVG gets wrong: a sensor that reports
  * 100× per second while idle and once a minute under load, or a
  * ticker quoted densely at the open, dominates an unweighted mean
  * with its oversampled regime. TWAP weights each observation by how
  * long it was CURRENT (until the next observation); VWAP weights by
  * an explicit size column (the execution-quality benchmark).
  *
  * Exactness: values and weights snap to fixed point and every product
  * accumulates as an exact DECIMAL(38,0) — order-independent, so the
  * result replays bit-for-bit on any engine and partitioning; the
  * final ratio is a fixed sequence of double ops rounded tie-safely.
  * Simultaneous observations order deterministically by (ts, value),
  * mirrored in the oracle.
  *
  * Scale shape: TWAP is ONE window exchange per key (lead + grouped
  * sum — the as-of/rolling family's shape); VWAP is a pure map-side
  * combined aggregation, no window at all. */
object Timeseries {

  private def q(c: String): Column = col("`" + c.replace("`", "``") + "`")

  /** Per-key time-weighted average over the observed span: each value
    * holds from its timestamp until the key's next observation; the
    * last observation closes the span (zero weight). Keys with fewer
    * than two observations have no span — null twap.
    *
    * @return (keys..., n_segments, span_us, twap) */
  def twap(df: DataFrame, keyCols: Seq[String], tsCol: String,
           valueCol: String, scale: Int = 4,
           roundTo: Int = 6): DataFrame = {
    require(keyCols.nonEmpty, "twap needs at least one key column")
    require(df.schema(tsCol).dataType == TimestampType,
      s"twap time column must be a timestamp, got ${df.schema(tsCol).dataType}")
    val pow = math.pow(10.0, scale)
    val t = unix_micros(q(tsCol))
    val vi = floor(q(valueCol).cast("double") * pow + 0.5).cast("long")
    val seg = df
      .select(keyCols.map(q) :+ vi.as("__vi") :+ t.as("__t") :+
        q(valueCol).as("__v"): _*)
      .withColumn("__nt", lead(col("__t"), 1).over(
        Window.partitionBy(keyCols.map(q): _*)
          .orderBy(col("__t"), col("__v"))))
      .where(col("__nt").isNotNull)
      .select(keyCols.map(q) :+ col("__vi") :+
        (col("__nt") - col("__t")).as("__dur"): _*)
    val rf = math.pow(10.0, roundTo)
    seg.groupBy(keyCols.map(q): _*)
      .agg(count(lit(1)).as("n_segments"),
        sum(col("__dur")).as("span_us"),
        sum(col("__vi").cast(DecimalType(19, 0)) * col("__dur"))
          .as("__s"))
      .select(keyCols.map(q) ++ Seq(col("n_segments"), col("span_us"),
        when(col("span_us") > 0,
          floor(col("__s").cast("double") / col("span_us").cast("double")
            / pow * rf + 0.5) / rf).as("twap")): _*)
  }

  /** Per-key volume-weighted average: Σ value·weight / Σ weight with
    * both factors in fixed point. Zero/negative total weight → null.
    *
    * @return (keys..., n, total_weight, vwap) */
  def vwap(df: DataFrame, keyCols: Seq[String], valueCol: String,
           weightCol: String, scale: Int = 2,
           roundTo: Int = 6): DataFrame = {
    require(keyCols.nonEmpty, "vwap needs at least one key column")
    val pow = math.pow(10.0, scale)
    val vi = floor(q(valueCol).cast("double") * pow + 0.5).cast("long")
    val wi = floor(q(weightCol).cast("double") * pow + 0.5).cast("long")
    val rf = math.pow(10.0, roundTo)
    df.where(q(valueCol).isNotNull && q(weightCol).isNotNull)
      .select(keyCols.map(q) :+ vi.as("__vi") :+ wi.as("__wi"): _*)
      .groupBy(keyCols.map(q): _*)
      .agg(count(lit(1)).as("n"),
        sum(col("__wi")).as("__sw"),
        sum(col("__vi").cast(DecimalType(19, 0)) * col("__wi")).as("__s"))
      .select(keyCols.map(q) ++ Seq(col("n"),
        (col("__sw").cast("double") / pow).as("total_weight"),
        when(col("__sw") > 0,
          floor(col("__s").cast("double") / col("__sw").cast("double")
            / pow * rf + 0.5) / rf).as("vwap")): _*)
  }

  /** CALENDAR-aware period-over-period comparison (the MoM/YoY report
    * row): per key and period, the aggregated value next to the PRIOR
    * period's and the SAME period one season back, with exact deltas
    * and tie-safely rounded percent changes. "Calendar-aware" is the
    * point — the naive `lag(1) OVER (ORDER BY period)` silently
    * compares across gaps (a missing month shifts every later row's
    * "prior"); here periods map to an integer calendar index and
    * prior/season values arrive by EQUI-JOIN on (key, idx−1) /
    * (key, idx−seasonLag), so a gap yields an honest null.
    *
    * Exactness: per-period sums accumulate as DECIMAL(18,`scale`)
    * (order-independent); deltas are decimal subtraction; pct changes
    * are one double division rounded floor-half-up at 6dp, the oracle
    * spelling. Scale shape: one map-side-combined groupBy reduces the
    * data to (keys × periods); both comparison joins run on that
    * aggregated frame. Null timestamps are excluded.
    *
    * @param grain     "month" or "day"
    * @param seasonLag same-period-last-season distance in grains
    *                  (12 for YoY on months, 7 for day-vs-same-weekday)
    * @return (keys..., period_start, value, prior_value, delta,
    *         pct_change, season_value, season_delta, season_pct) */
  def periodOverPeriod(df: DataFrame, keyCols: Seq[String], tsCol: String,
                       valueCol: String, grain: String = "month",
                       seasonLag: Int = 12, scale: Int = 2): DataFrame = {
    (keyCols ++ Seq(tsCol, valueCol)).foreach(c =>
      require(df.columns.contains(c),
        s"column '$c' not in ${df.columns.mkString(", ")}"))
    require(grain == "month" || grain == "day",
      s"grain must be month|day, got '$grain'")
    require(seasonLag >= 2, s"seasonLag must be >= 2, got $seasonLag " +
      "(1 would duplicate the prior-period comparison)")
    require(scale >= 0 && scale <= 6, s"scale must be in [0,6], got $scale")
    val ts = q(tsCol)
    val idx: Column = grain match {
      case "month" => (year(ts) * 12 + month(ts) - 1).cast("long")
      case "day" => datediff(to_date(ts), lit("1970-01-01")).cast("long")
    }
    val dec = DecimalType(18, scale)
    val agg = df.where(ts.isNotNull)
      .groupBy((keyCols.map(q) :+ idx.as("__idx")): _*)
      .agg(min(date_trunc(grain, ts)).as("period_start"),
        sum(q(valueCol).cast(dec)).as("__v"))
    def shifted(back: Int, as: String) = agg.select(
      (keyCols.map(c => q(c).as("__s_" + c)) :+
        (col("__idx") + back).as("__s_idx") :+ col("__v").as(as)): _*)
    def joinBack(base: DataFrame, sh: DataFrame) = base.join(sh,
      (keyCols.map(c => base(c) === sh("__s_" + c)) :+
        (base("__idx") === sh("__s_idx"))).reduce(_ && _), "left")
      .drop((keyCols.map("__s_" + _) :+ "__s_idx"): _*)
    val rf = 1e6
    def pct(cur: Column, prev: Column): Column =
      when(prev.isNotNull && prev =!= 0,
        floor((cur - prev).cast("double") / prev.cast("double") * rf + 0.5)
          / rf)
    val joined = joinBack(joinBack(agg, shifted(1, "__prior")),
      shifted(seasonLag, "__season"))
    joined.select(keyCols.map(q) ++ Seq(
      col("period_start"),
      col("__v").cast("double").as("value"),
      col("__prior").cast("double").as("prior_value"),
      (col("__v") - col("__prior")).cast("double").as("delta"),
      pct(col("__v"), col("__prior")).as("pct_change"),
      col("__season").cast("double").as("season_value"),
      (col("__v") - col("__season")).cast("double").as("season_delta"),
      pct(col("__v"), col("__season")).as("season_pct")): _*)
  }
}
