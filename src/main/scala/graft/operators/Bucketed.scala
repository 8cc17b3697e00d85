package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed tables: pre-shuffle a fact table ONCE at write time so
  * every later equi-join / aggregation on the bucket keys runs with NO
  * exchange. This is the canonical 100 TB co-location strategy — a
  * nightly-written `lineitem` bucketed by `l_orderkey` turns every
  * downstream order join from a 100 TB shuffle into a local zip of
  * matching buckets.
  *
  * Spark-first: this is just `DataFrameWriter.bucketBy` +
  * `saveAsTable`, surfaced with the join-side conventions that make
  * the exchange actually disappear (same bucket count both sides, join
  * keys = bucket keys, merge-join hint so a small side doesn't
  * silently broadcast and hide the proof). The bucket count is a real
  * tuning knob: buckets ≈ cluster cores × small multiple; too few
  * buckets caps parallelism, too many makes small files. */
object Bucketed {

  /** Write `df` as a bucketed (and per-bucket sorted) catalog table.
    * Sorting by the keys makes later sort-merge joins skip their Sort
    * as well. Overwrites any previous table of that name. `path` makes
    * it an external table at that location (the warehouse dir is a
    * static conf — an explicit path keeps scratch tables out of it). */
  def write(df: DataFrame, table: String, keys: Seq[String],
            numBuckets: Int, path: Option[String] = None): Unit = {
    require(keys.nonEmpty, "bucketed write needs at least one key")
    require(numBuckets >= 1 && numBuckets <= 100000,
      s"numBuckets out of range: $numBuckets")
    // overwriting an external table needs the old entry gone first, or
    // saveAsTable refuses to change the location
    df.sparkSession.sql(s"DROP TABLE IF EXISTS `$table`")
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
    path.foldLeft(w)((w, p) => w.option("path", p)).saveAsTable(table)
  }

  /** Exchange-free equi-join of two tables bucketed on `keys` with the
    * same bucket count. The merge hint pins a sort-merge join so the
    * co-location is actually used (an auto-broadcast would also be
    * exchange-free on one side but proves nothing about bucketing). */
  def join(spark: SparkSession, leftTable: String, rightTable: String,
           keys: Seq[String], joinType: String = "inner"): DataFrame =
    spark.table(leftTable).hint("merge")
      .join(spark.table(rightTable).hint("merge"), keys, joinType)
}
