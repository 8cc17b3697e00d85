package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact proportional allocation (largest-remainder proration): split
  * a per-group integer total across the group's rows proportionally to
  * a weight, so the shares are whole units and SUM EXACTLY to the
  * total — invoice lines from an order total, shared infra cost across
  * tenants by usage, ad spend across campaigns by impressions. The
  * float spelling (`total * w / W` rounded) drifts: rounded shares sum
  * to total ± a few units and reconciliation breaks. Largest-remainder
  * (Hamilton) fixes it: floor shares first, then hand the leftover
  * units to the rows with the largest division remainders — exact
  * integer arithmetic end to end, deterministic tie-break (remainder
  * desc, then `idCol` asc), Σshares ≡ total by construction.
  *
  * Contract: the total is a per-row column CONSTANT within each group
  * (the natural shape after joining a header table onto its lines); a
  * group whose rows disagree fails loudly, as do negative weights or
  * totals. All-zero-weight groups fall back to uniform weights (the
  * total still must land somewhere, and silently dropping it would
  * un-reconcile the ledger). Null weights count as zero; null totals
  * fail loudly (an unpriced group is a data bug, not a zero).
  *
  * Scale shape: everything happens inside per-key windows over ONE
  * hash exchange on the keys (constancy check, weight sum, floor
  * shares) plus a remainder-rank window in the same exchange; no
  * join, no collect, no global sort. Fixed-point snaps keep products
  * in LONG range: |total_scaled| * W_scaled must stay under 2^63 —
  * guarded loudly at runtime, not silently wrapped. */
object Allocation {

  private def q(c: String): Column = col("`" + c.replace("`", "``") + "`")

  /** @param keyCols     allocation group (e.g. the order key)
    * @param weightCol   proportional weight (numeric, >= 0)
    * @param totalCol    group total, constant within each group
    * @param idCol       deterministic tie-break within a group
    * @param totalScale  fixed-point decimals for the total (2 = cents)
    * @param weightScale fixed-point decimals for weights
    * @param outCol      output column, allocated units at `totalScale`
    * @return input columns + `outCol` (long, scaled units) */
  def prorate(df: DataFrame, keyCols: Seq[String], weightCol: String,
              totalCol: String, idCol: String, totalScale: Int = 2,
              weightScale: Int = 0, outCol: String = "allocated")
      : DataFrame = {
    require(keyCols.nonEmpty, "prorate needs at least one key column")
    (keyCols ++ Seq(weightCol, totalCol, idCol)).foreach(c =>
      require(df.columns.contains(c),
        s"column '$c' not in ${df.columns.mkString(", ")}"))
    require(totalScale >= 0 && totalScale <= 6,
      s"totalScale must be in [0,6], got $totalScale")
    require(weightScale >= 0 && weightScale <= 6,
      s"weightScale must be in [0,6], got $weightScale")
    graft.llm.Guards.requireFreshColumns(df,
      Seq(outCol, "__wi", "__ti", "__w_sum", "__t_chk", "__prod",
        "__floor", "__rem", "__rrank", "__left"), "Allocation.prorate")

    val wKey = Window.partitionBy(keyCols.map(q): _*)
    val tPow = math.pow(10.0, totalScale)
    val wPow = math.pow(10.0, weightScale)
    // fixed-point snaps (floor-half-up, the house convention); loud on
    // negatives and null totals — both are data bugs, not zeros
    val wiRaw = floor(q(weightCol).cast("double") * wPow + 0.5).cast("long")
    val wi = when(wiRaw < 0, raise_error(concat(
        lit(s"prorate: negative weight in '$weightCol': "),
        q(weightCol).cast("string"))))
      .otherwise(coalesce(wiRaw, lit(0L)))
    val tiRaw = floor(q(totalCol).cast("double") * tPow + 0.5).cast("long")
    val ti = when(tiRaw.isNull, raise_error(
        lit(s"prorate: null total in '$totalCol'")))
      .when(tiRaw < 0, raise_error(concat(
        lit(s"prorate: negative total in '$totalCol': "),
        q(totalCol).cast("string"))))
      .otherwise(tiRaw)

    val snapped = df.withColumn("__wi", wi).withColumn("__ti", ti)
      .withColumn("__w_sum", sum(col("__wi")).over(wKey))
      .withColumn("__t_chk",
        when(max(col("__ti")).over(wKey) =!= min(col("__ti")).over(wKey),
          raise_error(concat(lit(
            s"prorate: '$totalCol' is not constant within a group (keys "),
            concat_ws(",", keyCols.map(c => q(c).cast("string")): _*),
            lit(")")))).otherwise(col("__ti")))
      // all-zero groups allocate uniformly — the total must land
      .withColumn("__wi",
        when(col("__w_sum") === 0, lit(1L)).otherwise(col("__wi")))
      .withColumn("__w_sum",
        when(col("__w_sum") === 0, count(lit(1)).over(wKey))
          .otherwise(col("__w_sum")))
    // overflow guard: total * W must fit a long (then every per-row
    // product does too, since wi <= W) — loud, never wrapped. `div` is
    // SQL integer division; Column `/` would go through double and
    // lose exactness above 2^53.
    val prod = when(col("__t_chk") =!= 0 &&
        col("__w_sum") > expr(s"${Long.MaxValue}L div greatest(__t_chk, 1L)"),
        raise_error(lit("prorate: total*weightSum overflows long — " +
          "reduce totalScale/weightScale")))
      .otherwise(col("__t_chk") * col("__wi"))
    // tie-break: remainder desc, then idCol, then the weight itself —
    // so if idCol is not unique within a group, rows still tying are
    // identical in (key, weight, total) and the bump assignment is
    // interchangeable for any projection of those columns
    val wRank = Window.partitionBy(keyCols.map(q): _*)
      .orderBy(col("__rem").desc, q(idCol).asc, col("__wi").asc)
    snapped
      .withColumn("__prod", prod)
      .withColumn("__floor", expr("__prod div __w_sum"))
      .withColumn("__rem", col("__prod") % col("__w_sum"))
      .withColumn("__left", col("__t_chk") - sum(col("__floor")).over(wKey))
      .withColumn("__rrank", row_number().over(wRank))
      .withColumn(outCol,
        col("__floor") + when(col("__rrank") <= col("__left"), 1L)
          .otherwise(0L))
      .drop("__wi", "__ti", "__w_sum", "__t_chk", "__prod", "__floor",
        "__rem", "__rrank", "__left")
  }
}
