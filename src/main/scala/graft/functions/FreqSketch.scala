package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.GraftBridge
import org.apache.spark.unsafe.types.UTF8String

/** Heavy hitters via the Misra–Gries frequent-items sketch (Misra &
  * Gries 1982; mergeable form per Agarwal et al. 2012, "Mergeable
  * Summaries") as a native aggregate.
  *
  * The exact formulation — `GROUP BY value ORDER BY count DESC LIMIT
  * k` — shuffles one row per DISTINCT value. On a 100 TB corpus with
  * ~billions of distinct URLs/tokens that distinct-key shuffle is the
  * job; the question "which domains dominate this crawl" doesn't need
  * it. This sketch keeps at most k counters per group AT EVERY STAGE:
  * map-side partials are k-bounded before the shuffle, merge is
  * counter addition followed by a (k+1)-th-largest subtraction, and
  * the output is k (value, count) pairs.
  *
  * Guarantees (n = group size): every item with true frequency
  * > n/(k+1) is present; reported counts are underestimates by at most
  * n/(k+1). When a group has ≤ k distinct values no decrement ever
  * fires and counts are EXACT — the provable sub-case the DuckDB
  * oracle gates (low-cardinality column, k above it), the same
  * pattern as the simhash family's exact sub-case gate.
  *
  * Output: array<struct<value string, cnt long>> ordered (cnt desc,
  * value asc) — deterministic regardless of partitioning ONLY in the
  * exact sub-case; under decrements, counts (not membership of
  * guaranteed items) may vary with merge order, as for any MG sketch.
  * Null inputs are ignored (SQL aggregate convention). */
object FreqSketch {

  case class MisraGries(
      child: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
    with UnaryLike[Expression] {

    require(k >= 1 && k <= 4096, s"k must be in [1, 4096], got $k")

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"misra_gries: value must be a string column, got ${other.simpleString}")
    }
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("value", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))), containsNull = false)
    override def nullable: Boolean = false

    override def createAggregationBuffer(): mutable.HashMap[String, Long] =
      mutable.HashMap.empty

    /** Classic MG step: new value with k counters full decrements all. */
    private def add(buf: mutable.HashMap[String, Long], v: String,
                    c: Long): Unit = {
      buf.get(v) match {
        case Some(old) => buf.update(v, old + c)
        case None =>
          if (buf.size < k) buf.update(v, c)
          else {
            // decrement every counter by min(c, smallest counter) —
            // batched form of c repeated decrement-all steps
            val d = math.min(c, buf.valuesIterator.min)
            val dead = mutable.ArrayBuffer.empty[String]
            buf.mapValuesInPlace((_, n) => n - d)
            buf.foreach { case (key, n) => if (n <= 0) dead += key }
            dead.foreach(buf.remove)
            if (c > d) add(buf, v, c - d) // room freed (or recurse decrement)
            ()
          }
      }
    }

    override def update(buf: mutable.HashMap[String, Long],
                        input: InternalRow): mutable.HashMap[String, Long] = {
      val v = child.eval(input)
      if (v != null) add(buf, v.asInstanceOf[UTF8String].toString, 1L)
      buf
    }

    /** Mergeable-summaries merge: add counters, then restore the k
      * bound by subtracting the (k+1)-th largest count from all. */
    override def merge(a: mutable.HashMap[String, Long],
                       b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
      b.foreach { case (v, c) =>
        a.update(v, a.getOrElse(v, 0L) + c)
      }
      if (a.size > k) {
        val counts = a.values.toArray.sorted(Ordering[Long].reverse)
        val d = counts(k) // (k+1)-th largest
        val dead = mutable.ArrayBuffer.empty[String]
        a.mapValuesInPlace((_, n) => n - d)
        a.foreach { case (key, n) => if (n <= 0) dead += key }
        dead.foreach(a.remove)
      }
      a
    }

    override def eval(buf: mutable.HashMap[String, Long]): Any = {
      val rows = buf.toArray.sortBy { case (v, c) => (-c, v) }.map {
        case (v, c) => InternalRow(UTF8String.fromString(v), c)
      }
      new GenericArrayData(rows.asInstanceOf[Array[Any]])
    }

    override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      out.writeInt(buf.size)
      buf.foreach { case (v, c) =>
        val bytes = v.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        out.writeInt(bytes.length)
        out.write(bytes)
        out.writeLong(c)
      }
      out.flush()
      bos.toByteArray
    }
    override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
      val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
      val n = in.readInt()
      val buf = mutable.HashMap.empty[String, Long]
      var i = 0
      while (i < n) {
        val len = in.readInt()
        val b = new Array[Byte](len)
        in.readFully(b)
        buf.update(new String(b, java.nio.charset.StandardCharsets.UTF_8),
          in.readLong())
        i += 1
      }
      buf
    }

    override def withNewMutableAggBufferOffset(o: Int): MisraGries =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): MisraGries =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression): MisraGries =
      copy(child = c)
  }

  /** Column surface: k-bounded frequent-items summary of a string
    * column, ordered (cnt desc, value asc). */
  def misra_gries(value: Column, k: Int): Column =
    GraftBridge.column(
      MisraGries(GraftBridge.expression(value), k).toAggregateExpression())
}
