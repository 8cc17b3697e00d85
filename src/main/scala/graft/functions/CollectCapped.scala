package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.GraftBridge

/** Size-capped sorted collect aggregates for LSH bucket grouping.
  *
  * The candidate stage of every LSH dedup needs "all ids in this
  * bucket, unless the bucket is hot". Built-in pieces express that as a
  * count aggregate + filter join-back + self-join — three extra plan
  * stages and two extra shuffles of the keys table. A plain
  * `collect_list` collapses it to one shuffle but has the classic skew
  * hazard: one boilerplate mega-bucket balloons a single unbounded
  * aggregation buffer before any filter can drop it.
  *
  * These aggregates do the capped collect natively: the buffer appends
  * until `cap` then POISONS itself (overflow ⇒ drops its storage and
  * absorbs everything else), so per-group memory is bounded at
  * `cap` longs at every stage — partial maps, shuffle buffers, final
  * merge — no matter how hot the bucket. Overflowed groups evaluate to
  * NULL (the caller filters them out, same contract as the old
  * size-filter). Output is SORTED so positional pair expansion gets
  * id_a < id_b for free.
  */
object CollectCapped {

  /** Mutable flat buffer; `overflow` poisons the group. */
  final class LongsBuf(var arr: Array[Long], var n: Int, var overflow: Boolean)

  private def poison(buf: LongsBuf): LongsBuf = {
    buf.overflow = true
    buf.arr = Array.emptyLongArray
    buf.n = 0
    buf
  }

  /** Append `slots` longs at a time with doubling growth, capped at
    * `capSlots` total. */
  private def ensure(buf: LongsBuf, add: Int, capSlots: Int): Unit =
    if (buf.n + add > buf.arr.length) {
      val target = math.max(buf.n + add, math.min(
        math.max(buf.arr.length * 2, 16), capSlots))
      buf.arr = java.util.Arrays.copyOf(buf.arr, target)
    }

  private def serializeBuf(buf: LongsBuf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(1 + 4 + 8 * buf.n)
    bb.put(if (buf.overflow) 1.toByte else 0.toByte).putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.arr(i)); i += 1 }
    bb.array()
  }

  private def deserializeBuf(bytes: Array[Byte]): LongsBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val of = bb.get() == 1
    val n = bb.getInt
    val arr = new Array[Long](math.max(n, 16))
    var i = 0
    while (i < n) { arr(i) = bb.getLong; i += 1 }
    new LongsBuf(arr, n, of)
  }

  /** Integral ids of any width are accepted (widened per row); anything
    * else fails ANALYSIS loudly instead of a runtime ClassCastException. */
  private def checkIntegral(fn: String, name: String,
                            dt: DataType): TypeCheckResult = dt match {
    case LongType | IntegerType | ShortType | ByteType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$fn: $name must be an integral column, got ${other.simpleString}")
  }

  /** collect up to `cap` longs per group, sorted; over-cap ⇒ NULL. */
  case class CollectLongsCapped(
      child: Expression,
      cap: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[LongsBuf] with UnaryLike[Expression] {

    require(cap >= 1, s"cap must be >= 1, got $cap")

    override def checkInputDataTypes(): TypeCheckResult =
      checkIntegral("collect_longs_capped", "col", child.dataType)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true

    override def createAggregationBuffer(): LongsBuf =
      new LongsBuf(new Array[Long](16), 0, false)

    override def update(buf: LongsBuf, input: InternalRow): LongsBuf = {
      if (!buf.overflow) {
        val v = child.eval(input)
        if (v != null) {
          if (buf.n >= cap) poison(buf)
          else {
            ensure(buf, 1, cap)
            buf.arr(buf.n) = v.asInstanceOf[Number].longValue
            buf.n += 1
          }
        }
      }
      buf
    }

    override def merge(a: LongsBuf, b: LongsBuf): LongsBuf =
      if (a.overflow || b.overflow || a.n + b.n > cap) poison(a)
      else {
        ensure(a, b.n, cap)
        System.arraycopy(b.arr, 0, a.arr, a.n, b.n)
        a.n += b.n
        a
      }

    override def eval(buf: LongsBuf): Any =
      if (buf.overflow) null
      else {
        val out = java.util.Arrays.copyOf(buf.arr, buf.n)
        java.util.Arrays.sort(out)
        new GenericArrayData(out)
      }

    override def serialize(buf: LongsBuf): Array[Byte] = serializeBuf(buf)
    override def deserialize(bytes: Array[Byte]): LongsBuf = deserializeBuf(bytes)

    override def withNewMutableAggBufferOffset(o: Int): CollectLongsCapped =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): CollectLongsCapped =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression): CollectLongsCapped =
      copy(child = c)
  }

  /** collect up to `cap` (id, v) long pairs per group as
    * array<struct<id,v>> sorted by id; over-cap ⇒ NULL. Interleaved
    * flat-long buffer — no per-row allocation until eval. */
  case class CollectLongPairsCapped(
      left: Expression,
      right: Expression,
      cap: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[LongsBuf] with BinaryLike[Expression] {

    require(cap >= 1, s"cap must be >= 1, got $cap")

    override def checkInputDataTypes(): TypeCheckResult = {
      val l = checkIntegral("collect_long_pairs_capped", "id", left.dataType)
      if (l != TypeCheckResult.TypeCheckSuccess) l
      else checkIntegral("collect_long_pairs_capped", "v", right.dataType)
    }
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("v", LongType, nullable = false))), containsNull = false)
    override def nullable: Boolean = true

    override def createAggregationBuffer(): LongsBuf =
      new LongsBuf(new Array[Long](16), 0, false)

    override def update(buf: LongsBuf, input: InternalRow): LongsBuf = {
      if (!buf.overflow) {
        val id = left.eval(input)
        val v = right.eval(input)
        if (id != null && v != null) {
          if (buf.n >= 2 * cap) poison(buf)
          else {
            ensure(buf, 2, 2 * cap)
            buf.arr(buf.n) = id.asInstanceOf[Number].longValue
            buf.arr(buf.n + 1) = v.asInstanceOf[Number].longValue
            buf.n += 2
          }
        }
      }
      buf
    }

    override def merge(a: LongsBuf, b: LongsBuf): LongsBuf =
      if (a.overflow || b.overflow || a.n + b.n > 2 * cap) poison(a)
      else {
        ensure(a, b.n, 2 * cap)
        System.arraycopy(b.arr, 0, a.arr, a.n, b.n)
        a.n += b.n
        a
      }

    override def eval(buf: LongsBuf): Any =
      if (buf.overflow) null
      else {
        val m = buf.n / 2
        val idx = Array.range(0, m).sortBy(i => buf.arr(2 * i))
        val rows = new Array[Any](m)
        var i = 0
        while (i < m) {
          val j = idx(i)
          rows(i) = InternalRow(buf.arr(2 * j), buf.arr(2 * j + 1))
          i += 1
        }
        new GenericArrayData(rows)
      }

    override def serialize(buf: LongsBuf): Array[Byte] = serializeBuf(buf)
    override def deserialize(bytes: Array[Byte]): LongsBuf = deserializeBuf(bytes)

    override def withNewMutableAggBufferOffset(o: Int): CollectLongPairsCapped =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): CollectLongPairsCapped =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): CollectLongPairsCapped =
      copy(left = l, right = r)
  }

  // ------------------------- Column-level API ---------------------------

  def collect_longs_capped(c: Column, cap: Int): Column =
    GraftBridge.column(
      CollectLongsCapped(GraftBridge.expression(c), cap).toAggregateExpression())

  def collect_long_pairs_capped(id: Column, v: Column, cap: Int): Column =
    GraftBridge.column(CollectLongPairsCapped(
      GraftBridge.expression(id), GraftBridge.expression(v), cap)
      .toAggregateExpression())

  /** SQL names (the analyzer wraps a bare AggregateFunction from the
    * registry into an AggregateExpression); cap is a required foldable
    * literal — same loud-failure contract as SketchExprs.register. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "collect_longs_capped", {
        case Seq(c, cap) => CollectLongsCapped(c,
          SketchExprs.litInt("collect_longs_capped", "cap")(cap))
        case exprs => throw graft.core.GraftError.Configuration(
          s"collect_longs_capped expects (col, cap), got ${exprs.length} arguments")
      }, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "collect_long_pairs_capped", {
        case Seq(id, v, cap) => CollectLongPairsCapped(id, v,
          SketchExprs.litInt("collect_long_pairs_capped", "cap")(cap))
        case exprs => throw graft.core.GraftError.Configuration(
          s"collect_long_pairs_capped expects (id, v, cap), got ${exprs.length} arguments")
      }, "scala_udf")
  }
}
