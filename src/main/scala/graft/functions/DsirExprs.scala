package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expressions for DSIR-style importance weighting
  * ([[graft.llm.Dsir]]): hashed n-gram bucket features and the
  * per-document log importance weight, each ONE pass over the text.
  *
  * The hash is the engine-portable polynomial-31 fold mod 2^31-1 over
  * the gram string's codepoints — the SAME constant family as
  * [[graft.llm.FeatureHash.portableStringHash]] (the DuckDB oracle
  * hard-codes 2147483647; do not "unify" moduli) — computed
  * incrementally across the gram's tokens (token chars, then the
  * joining space) so no gram string is ever materialized. Tokens are
  * the sketch family's strict tokenizer (lowercase, split `\W+`,
  * empties dropped), so DSIR's feature space lines up with the
  * contamination/dedup gram space.
  */
object DsirExprs {

  private val P = 2147483647L

  /** Gram-occurrence bucket ids of `text` for every n in `ns`, in
    * (n, position) order. The portable hash keeps fold state < P so
    * `state·31 + cp` stays exact in a long. */
  private[functions] def bucketsOf(u: UTF8String, ns: Seq[Int],
                                   buckets: Int): Array[Int] = {
    val tokens = SketchExprs.strictTokens(u)
    var total = 0
    ns.foreach { n =>
      val c = tokens.length - (n - 1)
      if (c > 0) total += c
    }
    val out = new Array[Int](total)
    var o = 0
    ns.foreach { n =>
      val count = tokens.length - (n - 1)
      var i = 0
      while (i < count) {
        var h = 0L
        var j = 0
        while (j < n) {
          if (j > 0) h = (h * 31 + 32) % P // the joining space
          val t = tokens(i + j)
          var k = 0
          while (k < t.length) {
            val cp = t.codePointAt(k)
            h = (h * 31 + cp) % P
            k += Character.charCount(cp)
          }
          j += 1
        }
        out(o) = (h % buckets).toInt
        o += 1
        i += 1
      }
    }
    out
  }

  /** array<int> of hashed-gram bucket ids (one per gram OCCURRENCE) —
    * feeds the bounded corpus bucket-count aggregations. */
  case class GramBuckets(child: Expression, ns: Seq[Int], buckets: Int)
    extends UnaryExpression {

    require(ns.nonEmpty && ns.forall(_ >= 1), s"gram sizes must be >= 1: $ns")
    require(buckets >= 2 && buckets <= (1 << 26),
      s"buckets must be in [2, 2^26]: $buckets")

    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullable: Boolean = child.nullable

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      val ref = ctx.addReferenceObj("gramBuckets", this,
        classOf[GramBuckets].getName)
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.eval0($c);")
    }

    protected override def nullSafeEval(input: Any): Any =
      eval0(input.asInstanceOf[UTF8String])

    def eval0(u: UTF8String): ArrayData =
      new GenericArrayData(bucketsOf(u, ns, buckets))

    override protected def withNewChildInternal(c: Expression): GramBuckets =
      copy(child = c)
  }

  /** The per-document DSIR log importance weight in EXACT integer
    * micro-nats: Σ over gram occurrences of `lqMicro(bucket)` where
    * `lqMicro(b)` is the driver-computed
    * `floor(1e9·(ln p̂_target(b) − ln p̂_raw(b)) + 0.5)`. Integer
    * addition is order-independent, so the weight is bit-identical
    * under any partitioning AND replayable in SQL — the double-sum
    * formulation would drift in the low bits. One text pass, no
    * shuffle, no join; the ratio table is `buckets` longs riding the
    * plan (80 KB at the paper's 10k buckets). */
  case class DsirLogWeightMicro(child: Expression, lqMicro: Array[Long],
                                ns: Seq[Int], buckets: Int)
    extends UnaryExpression {

    require(lqMicro.length == buckets,
      s"ratio table length ${lqMicro.length} != buckets $buckets")
    require(ns.nonEmpty && ns.forall(_ >= 1), s"gram sizes must be >= 1: $ns")

    override def dataType: DataType = LongType
    override def nullable: Boolean = child.nullable

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      val ref = ctx.addReferenceObj("dsirWeight", this,
        classOf[DsirLogWeightMicro].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.weight($c);")
    }

    protected override def nullSafeEval(input: Any): Any =
      weight(input.asInstanceOf[UTF8String])

    def weight(u: UTF8String): Long = {
      val bs = bucketsOf(u, ns, buckets)
      var sum = 0L
      var i = 0
      while (i < bs.length) { sum += lqMicro(bs(i)); i += 1 }
      sum
    }

    override protected def withNewChildInternal(c: Expression): DsirLogWeightMicro =
      copy(child = c)
  }

  /** Column wrappers. */
  def gramBuckets(text: Column, ns: Seq[Int], buckets: Int): Column =
    GraftBridge.column(GramBuckets(GraftBridge.expression(text), ns, buckets))

  def dsirLogWeightMicro(text: Column, lqMicro: Array[Long], ns: Seq[Int],
                         buckets: Int): Column =
    GraftBridge.column(DsirLogWeightMicro(GraftBridge.expression(text),
      lqMicro, ns, buckets))
}
