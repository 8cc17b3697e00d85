package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.GraftBridge

/** Grouped top-k as a native aggregate.
  *
  * The textbook Spark formulation — `row_number() OVER (PARTITION BY g
  * ORDER BY key) <= k` — shuffles EVERY row of every group and sorts
  * whole groups just to throw away all but k rows. At 100 TB with a hot
  * group (one language dominating a corpus) that window sort is the
  * bottleneck. This aggregate keeps a bounded (2k longs) buffer per
  * group at every stage, so the partial-aggregation map side already
  * reduces each (partition, group) to k rows before anything shuffles —
  * the shuffle carries at most `k × partitions` rows per group instead
  * of all of them, and there is no full sort anywhere.
  *
  * Total order: (key desc|asc, id asc) — ties on the key break by the
  * smaller id, so results are deterministic regardless of partitioning.
  * Output is array<struct<key,id>> already in rank order; null key or
  * id rows are ignored (SQL aggregate convention).
  */
object TopK {

  /** Flat interleaved (key, id) buffer, at most k pairs, UNSORTED until
    * eval; `worst` tracks the index of the current worst pair once the
    * buffer is full so the common no-op case (row worse than everything
    * kept) is a single comparison. */
  final class Buf(var arr: Array[Long], var n: Int)

  private def checkIntegral(fn: String, name: String,
                            dt: DataType): TypeCheckResult = dt match {
    case LongType | IntegerType | ShortType | ByteType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$fn: $name must be an integral column, got ${other.simpleString}")
  }

  /** Top-k (key, id) pairs per group by (key desc|asc, id asc).
    * Bounded buffer: per-group memory is 2k longs at every stage. */
  case class TopKLongs(
      key: Expression,
      id: Expression,
      k: Int,
      desc: Boolean,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Buf] with BinaryLike[Expression] {

    require(k >= 1 && k <= 4096, s"k must be in [1, 4096], got $k")

    override def left: Expression = key
    override def right: Expression = id

    override def checkInputDataTypes(): TypeCheckResult = {
      val l = checkIntegral("top_k_longs", "key", key.dataType)
      if (l != TypeCheckResult.TypeCheckSuccess) l
      else checkIntegral("top_k_longs", "id", id.dataType)
    }
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("key", LongType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)
    override def nullable: Boolean = false

    override def createAggregationBuffer(): Buf =
      new Buf(new Array[Long](math.min(2 * k, 32)), 0)

    /** true iff (k1,i1) ranks strictly better than (k2,i2). */
    @inline private def better(k1: Long, i1: Long, k2: Long, i2: Long): Boolean =
      if (k1 != k2) { if (desc) k1 > k2 else k1 < k2 } else i1 < i2

    private def add(buf: Buf, kv: Long, iv: Long): Buf = {
      if (buf.n < 2 * k) {
        if (buf.n == buf.arr.length)
          buf.arr = java.util.Arrays.copyOf(
            buf.arr, math.min(math.max(buf.arr.length * 2, 32), 2 * k))
        buf.arr(buf.n) = kv
        buf.arr(buf.n + 1) = iv
        buf.n += 2
      } else {
        // full: replace the worst kept pair if the new one beats it.
        // O(k) scan — k is small by contract; no heap allocation.
        var worst = 0
        var i = 2
        while (i < buf.n) {
          if (better(buf.arr(worst), buf.arr(worst + 1), buf.arr(i), buf.arr(i + 1)))
            worst = i
          i += 2
        }
        if (better(kv, iv, buf.arr(worst), buf.arr(worst + 1))) {
          buf.arr(worst) = kv
          buf.arr(worst + 1) = iv
        }
      }
      buf
    }

    override def update(buf: Buf, input: InternalRow): Buf = {
      val kv = key.eval(input)
      val iv = id.eval(input)
      if (kv != null && iv != null)
        add(buf, kv.asInstanceOf[Number].longValue, iv.asInstanceOf[Number].longValue)
      else buf
    }

    override def merge(a: Buf, b: Buf): Buf = {
      var i = 0
      while (i < b.n) { add(a, b.arr(i), b.arr(i + 1)); i += 2 }
      a
    }

    override def eval(buf: Buf): Any = {
      val m = buf.n / 2
      val idx = Array.range(0, m).sortWith { (x, y) =>
        better(buf.arr(2 * x), buf.arr(2 * x + 1), buf.arr(2 * y), buf.arr(2 * y + 1))
      }
      val rows = new Array[Any](m)
      var i = 0
      while (i < m) {
        rows(i) = InternalRow(buf.arr(2 * idx(i)), buf.arr(2 * idx(i) + 1))
        i += 1
      }
      new GenericArrayData(rows)
    }

    override def serialize(buf: Buf): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.n)
      bb.putInt(buf.n)
      var i = 0
      while (i < buf.n) { bb.putLong(buf.arr(i)); i += 1 }
      bb.array()
    }
    override def deserialize(bytes: Array[Byte]): Buf = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val arr = new Array[Long](math.max(n, 32))
      var i = 0
      while (i < n) { arr(i) = bb.getLong; i += 1 }
      new Buf(arr, n)
    }

    override def withNewMutableAggBufferOffset(o: Int): TopKLongs =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): TopKLongs =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): TopKLongs = copy(key = l, id = r)
  }

  /** Column surface: top-k (key, id) pairs per group, rank order. */
  def top_k_longs(key: Column, id: Column, k: Int,
                  desc: Boolean = true): Column =
    GraftBridge.column(TopKLongs(GraftBridge.expression(key),
      GraftBridge.expression(id), k, desc).toAggregateExpression())
}
