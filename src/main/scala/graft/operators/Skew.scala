package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation primitives for hot keys at scale.
  *
  * AQE's skew-join handling covers sort-merge joins at runtime; these
  * cover the two shapes AQE does not: aggregation over a hot key and
  * broadcast-salted joins planned ahead of time.
  */
object Skew {

  /** Two-stage salted aggregation: `groupBy(keys :+ salt)` partial →
    * `groupBy(keys)` final. A key with 1B rows becomes `salts` partial
    * groups computed in parallel, then `salts` rows in the final stage —
    * the hot reducer disappears at the cost of one extra (tiny) shuffle.
    *
    * `aggs` maps output column name → (partialExpr, finalExpr), e.g.
    * sum → (sum(c), sum(partial)); count → (count(c), sum(partial)).
    * Convenience wrappers below cover the common cases. */
  def saltedAgg(df: DataFrame, keys: Seq[String], salts: Int,
                aggs: Map[String, (Column, Column => Column)]): DataFrame = {
    val salted = df.withColumn("_salt", (rand(seed = 42) * salts).cast("int"))
    val partial = salted.groupBy((keys :+ "_salt").map(col): _*)
      .agg(aggs.head._2._1.as(aggs.head._1),
        aggs.tail.map { case (n, (p, _)) => p.as(n) }.toSeq: _*)
    partial.groupBy(keys.map(col): _*)
      .agg(aggs.head._2._2(col(aggs.head._1)).as(aggs.head._1),
        aggs.tail.map { case (n, (_, f)) => f(col(n)).as(n) }.toSeq: _*)
  }

  /** Salted sum + count (mean = sum/count downstream if needed). */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
                     salts: Int = 16): DataFrame =
    saltedAgg(df, keys, salts, Map(
      "sum_" + valueCol -> (sum(col(valueCol)), (c: Column) => sum(c)),
      "cnt" -> (count(lit(1)), (c: Column) => sum(c).cast("long"))))

  /** Salted broadcast join for a skewed LEFT side against a small right
    * side: the right side is exploded `salts`× (once per salt value),
    * the left side picks a random salt, and the join key becomes
    * (key, salt) — hot keys spread over `salts` tasks. Right side must
    * be broadcast-small (it is replicated `salts`×). */
  def saltedBroadcastJoin(left: DataFrame, right: DataFrame,
                          key: String, salts: Int = 16): DataFrame = {
    val saltedLeft = left.withColumn("_salt",
      (rand(seed = 42) * salts).cast("int"))
    val saltedRight = right.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(broadcast(saltedRight), Seq(key, "_salt")).drop("_salt")
  }
}
