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

  /** Interval OVERLAP join: every left interval pairs with every right
    * interval of the same key whose half-open span intersects it —
    * `lStart < rEnd AND rStart < lEnd`. The interval×interval sibling
    * of [[join]] (sessions × promotions, maintenance windows ×
    * incidents, shifts × outages).
    *
    * Scale shape: the naive spelling has no equi-key beyond `on`, so a
    * hot key degenerates into a per-key nested loop. Here BOTH sides
    * replicate to the `granularity`-sized grid buckets they cover and
    * the join becomes a hash equi-join on (keys..., bucket) with the
    * overlap test as a residual. An overlapping pair shares every
    * bucket between max(starts) and min(ends), so to meet exactly ONCE
    * the residual also pins the bucket to `bucket(max(lStart, rStart))`
    * — that bucket is provably covered by both sides (max(starts) <
    * min(ends) on overlap), and no post-join dedup is needed.
    *
    * `joinType` "inner" keeps matched pairs; "left" also keeps left
    * intervals with no overlapping partner (null right payload) — the
    * unmatched set is recovered with a null-safe LEFT ANTI on the full
    * left row (duplicates agree on matching, so multiplicity is
    * preserved), keeping the exploded inner join the only pairwise
    * step. Degenerate (empty/backwards) intervals drop on the side
    * being exploded, matching the half-open semantics. */
  def overlap(left: DataFrame, right: DataFrame, on: Seq[String],
              leftStartCol: String, leftEndCol: String,
              rightStartCol: String, rightEndCol: String,
              granularity: Long, joinType: String = "inner",
              maxBucketsPerInterval: Int = 10000): DataFrame = {
    require(granularity > 0, s"granularity must be positive, got $granularity")
    require(joinType == "inner" || joinType == "left",
      s"joinType must be inner|left, got '$joinType'")
    on.foreach { c =>
      require(left.columns.contains(c), s"left misses key column '$c'")
      require(right.columns.contains(c), s"right misses key column '$c'")
    }
    Seq(leftStartCol, leftEndCol).foreach(c =>
      require(left.columns.contains(c), s"left misses '$c'"))
    Seq(rightStartCol, rightEndCol).foreach(c =>
      require(right.columns.contains(c), s"right misses '$c'"))
    val tType = left.schema(leftStartCol).dataType
    Seq(left.schema(leftEndCol).dataType, right.schema(rightStartCol).dataType,
        right.schema(rightEndCol).dataType).foreach(dt =>
      require(dt == tType,
        s"interval columns must share one type; got $tType vs $dt"))
    right.columns.filterNot(on.contains).foreach(c =>
      require(!left.columns.contains(c),
        s"right column '$c' collides with a left column — alias it first"))
    require(!left.columns.contains("__bucket") &&
      !right.columns.contains("__bucket"), "'__bucket' is reserved")

    def ticks(c: Column): Column = tType match {
      case TimestampType => unix_micros(c)
      case LongType | IntegerType => c.cast("long")
      case other => throw new IllegalArgumentException(
        s"overlap join interval columns must be timestamp or integral, got $other")
    }
    def bucket(c: Column): Column = floor(ticks(c) / lit(granularity))
    def exploded(df: DataFrame, sCol: String, eCol: String): DataFrame = {
      val endBucket = floor((ticks(q(eCol)) - 1) / lit(granularity))
      val nBuckets = endBucket - bucket(q(sCol)) + 1
      df.filter(q(sCol).isNotNull && q(eCol).isNotNull && q(sCol) < q(eCol))
        .withColumn("__bucket", explode(when(
          nBuckets > lit(maxBucketsPerInterval.toLong),
          raise_error(concat(lit(s"overlap join interval spans more than " +
            s"$maxBucketsPerInterval buckets at granularity $granularity " +
            s"(start="), q(sCol).cast("string"), lit(")"))).cast("array<bigint>"))
          .otherwise(sequence(bucket(q(sCol)), endBucket))))
    }
    def qa(a: String, c: String): Column =
      col(s"$a.`" + c.replace("`", "``") + "`")
    val la = exploded(left, leftStartCol, leftEndCol).alias("__oj_l")
    val ra = exploded(right, rightStartCol, rightEndCol).alias("__oj_r")
    val meetBucket = floor((greatest(ticks(qa("__oj_l", leftStartCol)),
      ticks(qa("__oj_r", rightStartCol)))) / lit(granularity))
    val cond = (on.map(c => qa("__oj_l", c) === qa("__oj_r", c)) ++ Seq(
      qa("__oj_l", "__bucket") === qa("__oj_r", "__bucket"),
      qa("__oj_l", leftStartCol) < qa("__oj_r", rightEndCol),
      qa("__oj_r", rightStartCol) < qa("__oj_l", leftEndCol),
      qa("__oj_l", "__bucket") === meetBucket)).reduce(_ && _)
    val rPayload = right.columns.filterNot(on.contains).toSeq
    val inner = la.join(ra, cond, "inner")
      .select(left.columns.toSeq.map(qa("__oj_l", _)) ++
        rPayload.map(qa("__oj_r", _)): _*)
    if (joinType == "inner") inner
    else {
      // left rows with no partner: null-safe anti on the full left row
      // (value-identical duplicates match or miss together, so this
      // preserves multiplicity); right payload comes back as nulls
      val matched = inner.select(left.columns.toSeq.map(col): _*).distinct()
      val unmatched = left.join(matched,
        left.columns.toSeq.map(c => left(c) <=> matched(c)).reduce(_ && _),
        "left_anti")
      val withNulls = rPayload.foldLeft(unmatched)((df, c) =>
        df.withColumn(c, lit(null).cast(right.schema(c).dataType)))
      inner.unionByName(withNulls)
    }
  }
}
