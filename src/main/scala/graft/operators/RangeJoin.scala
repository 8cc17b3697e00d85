package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampType, LongType, IntegerType}

/** Range (interval-containment) join: every fact row pairs with every
  * interval of the same key that contains its time — `start <= t < end`
  * (half-open). The reference engine has no joins at all; this is the
  * workhorse for "which maintenance window / session / promotion was
  * active when this event happened".
  *
  * Scale shape: the naive formulation — equi keys plus two inequality
  * predicates — gives Catalyst no usable equi-join key beyond `on`, so
  * a hot key degenerates into a per-key nested loop (and with no `on`
  * at all, a full BroadcastNestedLoop/Cartesian). This implementation
  * BUCKETIZES time: each interval replicates to the `granularity`-sized
  * buckets it covers, each fact lands in exactly ONE bucket, and the
  * join becomes a plain hash equi-join on (keys..., bucket) with the
  * containment test as a residual filter. Replication factor =
  * ceil(interval length / granularity) + 1, bounded by
  * `maxBucketsPerInterval` — an interval longer than the cap fails
  * LOUDLY (raise_error), because silently truncating would drop
  * matches. Each (fact, interval) pair meets exactly once (in the
  * fact's bucket), so no post-join dedup is needed.
  *
  * Pick `granularity` near the typical interval length: much smaller
  * multiplies the interval table; much larger packs unrelated rows
  * into shared buckets (the filter stays correct, just less
  * pre-pruning). Timestamps bucketize on microseconds; plain numeric
  * times on their own unit. */
object RangeJoin {

  private def q(c: String): Column = col("`" + c.replace("`", "``") + "`")

  /** @param facts      fact rows, one time column
    * @param intervals  interval rows: keys, start, end (+payload)
    * @param on         equi-key columns present on both sides
    * @param timeCol    fact time column (timestamp or numeric)
    * @param startCol   interval start (inclusive), same type as timeCol
    * @param endCol     interval end (exclusive), same type
    * @param granularity bucket width: microseconds for timestamps,
    *                    time units for numerics
    * @param joinType   "inner" (matched pairs) or "left" (facts with no
    *                   containing interval survive with null payload)
    * @param maxBucketsPerInterval loud upper bound on replication */
  def join(facts: DataFrame, intervals: DataFrame, on: Seq[String],
           timeCol: String, startCol: String, endCol: String,
           granularity: Long, joinType: String = "inner",
           maxBucketsPerInterval: Int = 10000): DataFrame = {
    require(granularity > 0, s"granularity must be positive, got $granularity")
    require(joinType == "inner" || joinType == "left",
      s"joinType must be inner|left, got '$joinType'")
    on.foreach { c =>
      require(facts.columns.contains(c), s"facts miss key column '$c'")
      require(intervals.columns.contains(c), s"intervals miss key column '$c'")
    }
    require(facts.columns.contains(timeCol), s"facts miss '$timeCol'")
    Seq(startCol, endCol).foreach(c => require(intervals.columns.contains(c),
      s"intervals miss '$c'"))
    val tType = facts.schema(timeCol).dataType
    require(tType == intervals.schema(startCol).dataType &&
      tType == intervals.schema(endCol).dataType,
      s"time columns must share one type; got $tType vs " +
        s"${intervals.schema(startCol).dataType}/${intervals.schema(endCol).dataType}")
    intervals.columns.filterNot(c => on.contains(c)).foreach(c =>
      require(!facts.columns.contains(c),
        s"interval column '$c' collides with a fact column — alias it first"))
    require(!facts.columns.contains("__bucket") &&
      !intervals.columns.contains("__bucket"), "'__bucket' is reserved")

    def ticks(c: Column): Column = tType match {
      case TimestampType => unix_micros(c)
      case LongType | IntegerType => c.cast("long")
      case other => throw new IllegalArgumentException(
        s"range join time columns must be timestamp or integral, got $other")
    }
    def bucket(c: Column): Column = floor(ticks(c) / lit(granularity))

    // half-open end: an interval ending exactly on a bucket boundary
    // does not reach into that bucket
    val endBucket = floor((ticks(q(endCol)) - 1) / lit(granularity))
    val nBuckets = endBucket - bucket(q(startCol)) + 1
    val guarded = intervals
      .filter(q(startCol).isNotNull && q(endCol).isNotNull &&
        q(startCol) < q(endCol))
      .withColumn("__bucket", explode(when(
        nBuckets > lit(maxBucketsPerInterval.toLong),
        raise_error(concat(lit(s"range join interval spans more than " +
          s"$maxBucketsPerInterval buckets at granularity $granularity " +
          s"(start="), q(startCol).cast("string"), lit(")"))).cast("array<bigint>"))
        .otherwise(sequence(bucket(q(startCol)), endBucket))))

    // explicit aliases: facts and intervals routinely share lineage
    // (intervals derived from the fact table), which would otherwise
    // trip ambiguous-self-join resolution
    def qa(a: String, c: String): Column =
      col(s"$a.`" + c.replace("`", "``") + "`")
    val fa = facts.withColumn("__bucket", bucket(q(timeCol))).alias("__rj_f")
    val ia = guarded.alias("__rj_i")
    val cond = (on.map(c => qa("__rj_f", c) === qa("__rj_i", c)) ++ Seq(
      qa("__rj_f", "__bucket") === qa("__rj_i", "__bucket"),
      qa("__rj_f", timeCol) >= qa("__rj_i", startCol),
      qa("__rj_f", timeCol) < qa("__rj_i", endCol))).reduce(_ && _)
    val ivPayload = intervals.columns.filterNot(on.contains).toSeq
    fa.join(ia, cond, joinType)
      .select(facts.columns.toSeq.map(qa("__rj_f", _)) ++
        ivPayload.map(qa("__rj_i", _)): _*)
  }
}
