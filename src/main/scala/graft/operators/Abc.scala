package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ABC contribution analysis (Pareto classification): rank each key's
  * items by their share of the key's total and cut the ranking into
  * the classic inventory classes — A = the head items that together
  * carry the first `aPct`% of value, B = up to `bPct`%, C = the tail.
  * "Which SKUs are 80% of revenue", "which suppliers carry the spend",
  * "which tables are the storage bill".
  *
  * Class boundaries use the PRIOR cumulative share — the item that
  * crosses a threshold still belongs to the class it was crossing
  * into (the standard convention: the first items up to AND INCLUDING
  * the 80% crossing are A). The compare is exact integer arithmetic
  * (`100·prev < aPct·n` on scaled longs); no float ever decides a
  * class. Ties order deterministically (value desc, then item).
  *
  * Scale shape: one map-side-combined aggregation to per-(key, item)
  * totals, then the cumulative rides [[Distributions.cumulativeByKey]]
  * with the SCALED VALUE as the count — its range-partitioned parallel
  * prefix sums make `e` the cumulative value in better-items-first
  * order without a single-reducer per-key window (keys with millions
  * of items stay parallel). Negative item totals fail loudly — a
  * signed mix makes cumulative share non-monotone and the classes
  * meaningless; net the values upstream first. */
object Abc {

  private def q(c: String): Column = col("`" + c.replace("`", "``") + "`")

  /** @param keyCols grouping (empty → one global classification)
    * @param itemCol the classified entity (unique per key after agg)
    * @param valueCol contribution measure, aggregated by sum
    * @param aPct    A-class boundary, percent of total
    * @param bPct    B-class boundary, percent of total
    * @param scale   fixed-point decimals for exact value accumulation
    * @return (keys..., item, value, share, cum_share, abc_class) —
    *         share/cum_share tie-safely rounded at 6dp; an all-zero
    *         key has no shares to split and emits null class */
  def classify(df: DataFrame, keyCols: Seq[String], itemCol: String,
               valueCol: String, aPct: Int = 80, bPct: Int = 95,
               scale: Int = 2): DataFrame = {
    (keyCols ++ Seq(itemCol, valueCol)).foreach(c =>
      require(df.columns.contains(c),
        s"column '$c' not in ${df.columns.mkString(", ")}"))
    require(aPct > 0 && aPct < bPct && bPct <= 100,
      s"need 0 < aPct < bPct <= 100, got ($aPct, $bPct)")
    require(scale >= 0 && scale <= 6, s"scale must be in [0,6], got $scale")
    val pow = math.pow(10.0, scale)
    val perItem = df.groupBy((keyCols :+ itemCol).map(q): _*)
      .agg(sum(q(valueCol).cast("double")).as("__sv"))
    val wi = floor(col("__sv") * pow + 0.5).cast("long")
    val snapped = perItem.withColumn("__wi",
      when(wi < 0, raise_error(concat(
        lit(s"Abc.classify: negative item total in '$valueCol': "),
        col("__sv").cast("string")))).otherwise(coalesce(wi, lit(0L))))
    // cumulativeByKey with cnt = scaled value: `e` becomes the
    // cumulative VALUE in (value desc, item) order, `n` the key total
    val keyStruct =
      if (keyCols.isEmpty) lit("_") else struct(keyCols.map(q): _*)
    val dist = snapped.select(
      keyStruct.as("c"),
      struct((-col("__wi")).as("o"), q(itemCol).as("i")).as("v"),
      col("__wi").as("cnt"))
    val cum = Distributions.cumulativeByKey(dist)
    def r6(c: Column): Column = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    val prev = col("e") - col("cnt")
    val cls = when(col("n") === 0, lit(null).cast("string"))
      .when(lit(100L) * prev < lit(aPct.toLong) * col("n"), "A")
      .when(lit(100L) * prev < lit(bPct.toLong) * col("n"), "B")
      .otherwise("C")
    cum.select(
      keyCols.map(k => col("c").getField(k).as(k)) ++ Seq(
        col("v").getField("i").as(itemCol),
        (col("cnt").cast("double") / lit(pow)).as("value"),
        when(col("n") =!= 0,
          r6(col("cnt").cast("double") / col("n").cast("double")))
          .as("share"),
        when(col("n") =!= 0,
          r6(col("e").cast("double") / col("n").cast("double")))
          .as("cum_share"),
        cls.as("abc_class")): _*)
  }
}
