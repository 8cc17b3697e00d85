package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared machinery for the exact order-statistic family (winsorize,
  * robust stats, equi-depth histograms, quantile ranks): per-key
  * distinct-value distributions with cumulative counts.
  *
  * The naive cumulative — `sum(cnt) OVER (PARTITION BY key ORDER BY
  * v)` — serializes each key's ENTIRE distribution through one
  * reducer. "Bounded by cardinality" is no bound at all on a
  * near-unique double column: at 100 TB that is a single-threaded sort
  * of ~every value. This helper computes the same cumulative with
  * RANGE-PARTITIONED parallel prefix sums instead:
  *
  *  1. range-partition the (key, v) distribution — global order across
  *     partitions, parallelism = shuffle width;
  *  2. per-(key, partition) subtotals → a TINY frame (keys × width)
  *     whose window pass computes each partition's starting offset;
  *  3. broadcast the offsets back and finish with a window PARTITIONED
  *     BY (key, partition-id) — every partition scans only its own
  *     slice.
  *
  * Same numbers as the serial window, no serial stage wider than
  * keys × shuffle-width rows. */
object Distributions {

  /** Input: distinct rows (c, v, cnt) — a per-key value distribution.
    * Output: (c, v, cnt, e, n) with `e` the inclusive cumulative count
    * of rows up to and including `v` within key `c`, and `n` the key's
    * total. A value with cumulative end `e` and count `cnt` covers
    * 0-based sorted positions `[e-cnt, e-1]` of its key. */
  def cumulativeByKey(dist: DataFrame): DataFrame = {
    require(Seq("c", "v", "cnt").forall(dist.columns.contains),
      s"cumulativeByKey expects (c, v, cnt), got ${dist.columns.mkString(", ")}")
    // LAZY persist: the range partitioner's sampling pass would
    // otherwise evaluate the whole distribution lineage once for the
    // sample and again for the real exchange — on a wide scan that is
    // the scan twice. MEMORY_AND_DISK, so a huge distribution spills
    // instead of OOMing; freed by the context cleaner with the frame.
    val d = dist.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val parts = d.repartitionByRange(col("c"), col("v"))
      .withColumn("__pid", spark_partition_id())
    // tiny: |keys| × shuffle-width rows
    val wOff = Window.partitionBy("c").orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy("c")
    val offs = parts.groupBy("c", "__pid").agg(sum("cnt").as("__pt"))
      .withColumn("__off", coalesce(sum("__pt").over(wOff), lit(0L)))
      .withColumn("n", sum("__pt").over(wTot))
      .drop("__pt")
    val wIn = Window.partitionBy("c", "__pid").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    parts.join(broadcast(offs), Seq("c", "__pid"))
      .withColumn("e", col("__off") + sum("cnt").over(wIn))
      .select(col("c"), col("v"), col("cnt"), col("e"), col("n"))
  }

  /** Single-column convenience: distribution + cumulative for one
    * numeric expression of `df` (nulls excluded), constant key. */
  def cumulative(df: DataFrame, value: Column): DataFrame =
    cumulativeByKey(df
      .select(value.cast("double").as("v")).where(col("v").isNotNull)
      .groupBy("v").agg(count(lit(1)).as("cnt"))
      .withColumn("c", lit("_")))
      .drop("c")

  /** Per-key INTERPOLATED percentiles (the PostgreSQL/NIST
    * `percentile_cont` definition: position `(n−1)·p`, linear between
    * the two straddling order statistics) — the latency-dashboard
    * primitive (p50/p90/p99 per service/route/day) with EXACT order
    * statistics, not approximations.
    *
    * Values snap to fixed point; both straddling statistics come from
    * ONE conditional-aggregate pass over the cumulative distribution
    * (the position expressions are functions of the key's own `n`, so
    * no per-key subqueries and no sort) — the same parallel
    * prefix-sum machinery as the rest of the order-statistic family,
    * with its no-single-reducer guarantee. The interpolation is a
    * fixed double sequence rounded tie-safely — replays exactly.
    *
    * @param ps (outputColumn, fraction) pairs, fractions in [0, 1]
    * @return (key, n, <one column per requested percentile>) */
  def percentilesByKey(df: DataFrame, keyCol: String, valueCol: String,
                       ps: Seq[(String, Double)], scale: Int = 4,
                       roundTo: Int = 6): DataFrame = {
    require(ps.nonEmpty, "need at least one percentile")
    require(ps.forall { case (_, p) => p >= 0.0 && p <= 1.0 },
      s"fractions must be in [0, 1]: $ps")
    require(ps.map(_._1).distinct.size == ps.size,
      s"duplicate output names: $ps")
    val pow = math.pow(10.0, scale)
    val rf = math.pow(10.0, roundTo)
    val vi = floor(col("`" + valueCol.replace("`", "``") + "`")
      .cast("double") * pow + 0.5).cast("long")
    val dist = df
      .where(col(valueCol).isNotNull)
      .select(col(keyCol).as("c"), vi.as("v"))
      .groupBy(col("c"), col("v")).agg(count(lit(1)).as("cnt"))
    val cum = cumulativeByKey(dist)
    // value at 0-based sorted position j: the v whose span
    // [e−cnt, e−1] covers j — j is an expression of the key's n
    def at(j: Column): Column =
      max(when(col("e") - col("cnt") <= j && j < col("e"), col("v")))
    val aggs = ps.flatMap { case (name, p) =>
      val pos = (col("n") - 1).cast("double") * lit(p)
      val k = floor(pos).cast("long")
      val k1 = least(k + 1, col("n") - 1)
      Seq(at(k).as(s"__lo_$name"), at(k1).as(s"__hi_$name"),
        max(pos - k.cast("double")).as(s"__fr_$name"))
    }
    val outs = ps.map { case (name, _) =>
      val lo = col(s"__lo_$name").cast("double")
      val hi = col(s"__hi_$name").cast("double")
      (floor((lo + (hi - lo) * col(s"__fr_$name")) / pow * rf + 0.5) / rf)
        .as(name)
    }
    cum.groupBy(col("c").as(keyCol))
      .agg(max(col("n")).as("n"), aggs: _*)
      .select(col(keyCol) +: col("n") +: outs: _*)
  }
}
