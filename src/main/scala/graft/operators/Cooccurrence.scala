package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence / association-rule statistics — the
  * "customers who bought X also bought Y" operator: for every item
  * pair appearing together in at least `minCount` baskets, the
  * co-occurrence count plus the classic rule metrics (support,
  * directional confidence, lift). Feeds recommenders, substitution
  * analysis, and — on document corpora — term co-occurrence graphs.
  *
  * Semantics: items are DISTINCT within a basket (quantity doesn't
  * multiply co-occurrence), pairs are canonical (item_a < item_b),
  * `support` = co_count / N baskets, `conf_a_to_b` = P(b | basket
  * contains a), `lift` = support / (P(a)·P(b)) — lift > 1 means the
  * pair co-occurs more than independence predicts.
  *
  * Scale shape: the pair generation is a self-equi-join of the
  * DISTINCT (basket, item) frame on basket — narrow rows only, and
  * fan-out is quadratic in BASKET size, not corpus size, so the
  * loud `maxBasketSize` guard is the skew bound (a degenerate
  * mega-basket — one "order" holding the whole catalog — would
  * otherwise go quadratic; such baskets are dropped, the documented
  * trade of every pairwise operator here, cf. the LSH bucket cap).
  * Item totals and the basket count are tiny aggregations broadcast
  * back onto the pair counts. */
object Cooccurrence {

  def pairs(df: DataFrame, basketCol: String, itemCol: String,
            minCount: Long = 1L, maxBasketSize: Int = 1000,
            roundTo: Int = 6): DataFrame = {
    Seq(basketCol, itemCol).foreach(c =>
      require(df.columns.contains(c), s"no such column '$c'"))
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(maxBasketSize >= 2, s"maxBasketSize must be >= 2")

    val items = df
      .filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .distinct()
    // the basket-size skew guard: dropping a degenerate basket is an
    // explicit, loud-in-docs decision, bounded per basket
    val sized = items
      .withColumn("__sz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("__b"))))
      .filter(col("__sz") <= maxBasketSize)
      .drop("__sz")
      // pair join + item counts both read this; one computation
      .localCheckpoint(eager = false)

    val nBaskets = sized.select(col("__b")).distinct().count()
    require(nBaskets > 0, "no baskets after filtering")

    val itemCounts = sized.groupBy(col("__i")).agg(count(lit(1)).as("__n"))

    val co = sized.select(col("__b"), col("__i").as("item_a"))
      .join(sized.select(col("__b"), col("__i").as("item_b")), "__b")
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("co_count"))
      .filter(col("co_count") >= minCount)

    // half-up rounding spelled as floor(x·10^s + 0.5)/10^s: identical
    // IEEE steps in ANY engine given identical inputs — Spark's
    // BigDecimal HALF_UP and DuckDB's native round() disagree on
    // doubles that sit exactly on a decimal tie (observed live on
    // lift at the sf0.01 gate); this form cannot. Metrics here are
    // all non-negative, so floor-half-up ≡ half-away-from-zero.
    val p10 = math.pow(10.0, roundTo)
    def r(c: org.apache.spark.sql.Column) = floor(c * p10 + 0.5) / p10

    co
      .join(broadcast(itemCounts.select(col("__i").as("item_a"),
        col("__n").as("__na"))), Seq("item_a"))
      .join(broadcast(itemCounts.select(col("__i").as("item_b"),
        col("__n").as("__nb"))), Seq("item_b"))
      .select(col("item_a"), col("item_b"), col("co_count"),
        r(col("co_count") / lit(nBaskets.toDouble)).as("support"),
        r(col("co_count") / col("__na").cast("double")).as("conf_a_to_b"),
        r(col("co_count") / col("__nb").cast("double")).as("conf_b_to_a"),
        r(col("co_count") * lit(nBaskets.toDouble) /
          (col("__na") * col("__nb")).cast("double")).as("lift"))
  }
}
