package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.GraftBridge

/** Mergeable distinct-count sketches (KMV / bottom-k, Bar-Yossef et
  * al. 2002; mergeable form per "Mergeable Summaries") — the
  * incremental-maintenance answer to COUNT(DISTINCT) at warehouse
  * scale: store one tiny (≤ k longs) sketch per partition/day, merge
  * sketches for ANY later grouping (week, month, ad-hoc slice) without
  * ever rescanning history. Exact distinct counts don't compose —
  * |A ∪ B| ≠ |A| + |B| — which forces a full re-aggregation per
  * window; bottom-k sketches compose by construction (union = k
  * smallest of the concatenation).
  *
  * The hash is the engine-portable Knuth multiplicative hash over the
  * prime field (the [[graft.llm.Sampling]] portable-bucket family):
  * deliberately NOT xxhash64, so a SQL oracle can rebuild the exact
  * sketch and the estimate replays bit-for-bit on any engine —
  * estimates here are deterministic arithmetic, not a property of one
  * JVM.
  *
  * Estimator: with u_k = the k-th smallest of n ≥ k distinct hash
  * values scaled into (0, 1], E[distinct] = (k−1)/u_k; relative error
  * ~ 1/sqrt(k−2). Below k distinct hashes the sketch IS the distinct
  * hash set and the count is exact (the provable sub-case, same gate
  * pattern as Misra-Gries / simhash).
  *
  * Scale shape: the aggregate is k-bounded at EVERY stage — map-side
  * partials carry ≤ k longs before the shuffle, merges are sorted-set
  * unions trimmed to k, and a re-aggregation over stored sketches
  * (explode → same aggregate) gives rollups whose input is sketch
  * rows, never raw history. */
object DistinctSketch {

  /** Prime modulus / multiplier shared with the portable sampling
    * hash: h(v) = ((v mod P) · K) mod P, uniform enough on sequential
    * or hashed ids and expressible in any SQL dialect. */
  val P: Long = 1000000007L
  val K: Long = 2654435761L

  /** Engine-portable hash of an integral column into [0, P). */
  def portableHash(v: Column): Column =
    pmod(pmod(v.cast("long"), lit(P)) * lit(K), lit(P))

  /** Native bounded aggregate: the ≤ k smallest DISTINCT values of a
    * long column, as a sorted array — the KMV synopsis. Nulls are
    * ignored (SQL aggregate convention). */
  case class BottomKDistinct(
      child: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with UnaryLike[Expression] {

    require(k >= 2 && k <= 65536, s"k must be in [2, 65536], got $k")

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case LongType | IntegerType | ShortType | ByteType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bottom_k_distinct: value must be integral, got ${other.simpleString}")
    }
    override def dataType: DataType =
      ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false

    override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
      new java.util.TreeSet[java.lang.Long]()

    private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
      // reject early: full buffer and v beyond the current k-th
      if (buf.size() >= k && v >= buf.last()) return
      buf.add(v)
      if (buf.size() > k) buf.pollLast()
      ()
    }

    override def update(buf: java.util.TreeSet[java.lang.Long],
                        input: InternalRow): java.util.TreeSet[java.lang.Long] = {
      val v = child.eval(input)
      if (v != null) add(buf, v.asInstanceOf[Number].longValue())
      buf
    }

    override def merge(a: java.util.TreeSet[java.lang.Long],
                       b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
      val it = b.iterator()
      while (it.hasNext) add(a, it.next())
      a
    }

    override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
      val out = new Array[Any](buf.size())
      var i = 0
      val it = buf.iterator()
      while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
      new GenericArrayData(out)
    }

    override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.size())
      bb.putInt(buf.size())
      val it = buf.iterator()
      while (it.hasNext) bb.putLong(it.next().longValue())
      bb.array()
    }
    override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val n = bb.getInt()
      val buf = new java.util.TreeSet[java.lang.Long]()
      var i = 0
      while (i < n) { buf.add(bb.getLong()); i += 1 }
      buf
    }

    override def withNewMutableAggBufferOffset(o: Int): BottomKDistinct =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): BottomKDistinct =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression): BottomKDistinct =
      copy(child = c)
  }

  /** Aggregate column: KMV sketch (sorted array of ≤ k smallest
    * distinct portable hashes) of `value`. Store it next to the
    * partition's other rollups; it composes under [[mergeSketches]]. */
  def sketch(value: Column, k: Int): Column =
    GraftBridge.column(
      BottomKDistinct(GraftBridge.expression(portableHash(value)), k)
        .toAggregateExpression())

  /** Distinct-count estimate of a sketch column: exact size below k
    * (the sketch holds every distinct hash), else the KMV estimator
    * floor((k−1) · P / h_k) — plain arithmetic on the k-th smallest
    * hash, identical in any engine. */
  def estimate(sketchCol: Column, k: Int): Column =
    when(size(sketchCol) < k, size(sketchCol).cast("long"))
      .otherwise(floor(
        lit((k - 1).toDouble) * lit(P.toDouble) /
          element_at(sketchCol, k).cast("double")).cast("long"))

  /** Jaccard estimate between two KMV sketches — "how much do these
    * two audiences overlap?" WITHOUT touching raw data (the
    * theta-sketch set-operation pattern): restrict both sets to the
    * union's k smallest hashes U (a uniform sample of the union) and
    * count how many of U both sides contain. When both sketches hold
    * fewer than k hashes they ARE the distinct hash sets and the
    * Jaccard is exact. Deterministic arithmetic throughout — replays
    * in SQL. */
  def jaccardEstimate(a: Column, b: Column, k: Int): Column = {
    val merged = slice(array_sort(array_union(a, b)), 1, k)
    val interAll = array_intersect(a, b)
    val interInU = size(array_intersect(merged, interAll))
    interInU.cast("double") / size(merged).cast("double")
  }

  /** Intersection-cardinality estimate: Jaccard estimate × union
    * estimate (the union of two bottom-k sketches is itself a valid
    * bottom-k sketch of the set union), floored to a count. */
  def intersectionEstimate(a: Column, b: Column, k: Int): Column =
    floor(jaccardEstimate(a, b, k) *
      estimate(slice(array_sort(array_union(a, b)), 1, k), k)
        .cast("double")).cast("long")

  /** Roll stored sketches up to a coarser grouping: one explode of the
    * (≤ k)-long arrays, then the SAME bounded aggregate over the hash
    * values — input is sketch rows, never raw history. */
  def mergeSketches(df: DataFrame, groupCols: Seq[String],
                    sketchCol: String, k: Int): DataFrame = {
    require(df.columns.contains(sketchCol), s"no such column '$sketchCol'")
    val hashes = df.select(
      groupCols.map(col) :+ explode(col(sketchCol)).as("__h"): _*)
    val agg = GraftBridge.column(
      BottomKDistinct(GraftBridge.expression(col("__h")), k)
        .toAggregateExpression()).as(sketchCol)
    if (groupCols.isEmpty) hashes.agg(agg)
    else hashes.groupBy(groupCols.map(col): _*).agg(agg)
  }
}
