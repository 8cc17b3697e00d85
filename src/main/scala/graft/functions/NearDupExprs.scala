package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Per-row near-duplicate probe against a BROADCAST reference index —
  * the streaming form of `Dedup.nearDupAgainstReference`: the batch
  * shape aggregates the reference's (band, bucket) posting lists and
  * meets candidates in joins, which has no bounded-state streaming
  * analog; for a BOUNDED reference snapshot the same index collects
  * driver-side once (loud caps) and every probe is one pure expression
  * — band-bucket lookups, candidate dedup, sorted-merge exact-jaccard
  * verify — so the stage runs inside a stream with NO state and NO
  * shuffle. The maps ride the serialized plan like the other
  * reference-object indexes (ADC tables, the decontamination probe
  * index): shipped once per stage broadcast. */
object NearDupExprs {

  /** True iff any reference doc shares a band bucket AND verifies at
    * exact jaccard >= `threshold`. `left` = the doc's sorted distinct
    * shingle hashes, `right` = its minhash band buckets (the SAME
    * expressions the batch path uses, so stream/batch verdicts agree
    * bit-for-bit). `buckets` keys are mix(band, bucket) — a key
    * collision only UNIONS two posting lists, which adds candidates
    * the jaccard verify rejects; it can never lose a true candidate. */
  case class NearDupRefProbe(
      left: Expression, right: Expression,
      buckets: java.util.HashMap[java.lang.Long, Array[Long]],
      refShingles: java.util.HashMap[java.lang.Long, Array[Long]],
      threshold: Double)
    extends BinaryExpression {

    require(threshold >= 0.0 && threshold <= 1.0,
      s"threshold must be in [0, 1]: $threshold")

    override def dataType: DataType = BooleanType
    override def nullable: Boolean = left.nullable || right.nullable
    override def prettyName: String = "near_dup_ref_probe"

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      val ref = ctx.addReferenceObj("nearDupProbe", this,
        classOf[NearDupRefProbe].getName)
      nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.probe($a, $b);")
    }

    def probe(sh: ArrayData, bd: ArrayData): Boolean = {
      val nb = bd.numElements()
      var seen: java.util.HashSet[java.lang.Long] = null
      var b = 0
      while (b < nb) {
        val rks = buckets.get(key(b, bd.getLong(b)))
        if (rks != null) {
          if (seen == null) seen = new java.util.HashSet[java.lang.Long]()
          var i = 0
          while (i < rks.length) {
            val rk = rks(i)
            if (seen.add(rk)) {
              val rs = refShingles.get(rk)
              if (rs != null && jaccard(sh, rs) >= threshold) return true
            }
            i += 1
          }
        }
        b += 1
      }
      false
    }

    private def jaccard(a: ArrayData, rs: Array[Long]): Double = {
      val na = a.numElements(); val nb = rs.length
      if (na == 0 && nb == 0) return 1.0d
      var i = 0; var j = 0; var inter = 0
      while (i < na && j < nb) {
        val x = a.getLong(i); val y = rs(j)
        if (x == y) { inter += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
      inter.toDouble / (na + nb - inter).toDouble
    }

    protected override def nullSafeEval(l: Any, r: Any): Any =
      probe(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): NearDupRefProbe =
      copy(left = l, right = r)
  }

  /** Composite (band, bucket) map key. Shared by the probe and the
    * index builder — MUST stay in sync. */
  def key(band: Int, bucket: Long): Long = bucket * 1000003L + band

  def nearDupRefProbe(shingles: Column, bandBuckets: Column,
                      buckets: java.util.HashMap[java.lang.Long, Array[Long]],
                      refShingles: java.util.HashMap[java.lang.Long, Array[Long]],
                      threshold: Double): Column =
    GraftBridge.column(NearDupRefProbe(GraftBridge.expression(shingles),
      GraftBridge.expression(bandBuckets), buckets, refShingles, threshold))
}
