package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.types._
import org.apache.spark.sql.GraftBridge
import org.apache.spark.unsafe.types.UTF8String

/** Compression-ratio quality signal: `deflate(text).length /
  * text.utf8Length` — the cheap entropy proxy web-curation pipelines
  * use alongside the gram-repetition stats. Highly repetitive
  * boilerplate compresses far below normal prose (ratio ≪ 0.4) and
  * random noise / encoded blobs barely compress at all (ratio ≈ 1);
  * natural text sits in a narrow band between, so both tails are drop
  * candidates.
  *
  * No SQL replay exists (no DEFLATE in DuckDB) so the driver's gate
  * records this query rows-only, but the signal IS fully oracle-checked:
  * `tools/oracle_check.py` replays the compressed length through
  * CPython's zlib — both sides wrap the same zlib algorithm, and the
  * stream parameters are pinned to keep them byte-identical: RAW
  * deflate (nowrap — no header/checksum), level 6, DEFAULT strategy
  * (verified byte-exact across all sf0.01 documents, OpenJDK 17 vs
  * CPython). Unit tests additionally pin engineered strings. Output is
  * deterministic for a given level (no timestamps or headers in the
  * raw stream).
  *
  * Scale shape: a pure projection inside whole-stage codegen — one
  * Deflater pass per document, no shuffle, nothing collected. The
  * Deflater is allocated per call and `end()`ed in a finally block:
  * native zlib memory does not wait for the GC. */
object CompressExprs {

  case class DeflateStats(
      child: org.apache.spark.sql.catalyst.expressions.Expression,
      level: Int)
    extends UnaryExpression {

    require(level >= 1 && level <= 9, s"zlib level must be in [1, 9]: $level")

    override def dataType: DataType = StructType(Seq(
      StructField("raw_bytes", LongType, nullable = false),
      StructField("deflate_bytes", LongType, nullable = false),
      StructField("ratio", DoubleType, nullable = false)))
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "deflate_stats"

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      val ref = ctx.addReferenceObj("defl", this, classOf[DeflateStats].getName)
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.stats($c);")
    }

    def stats(u: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
      val raw = u.getBytes
      var compressed = 0L
      if (raw.length > 0) {
        // raw deflate stream (nowrap): no zlib header/checksum noise in
        // the measurement
        val d = new java.util.zip.Deflater(level, true)
        try {
          d.setInput(raw)
          d.finish()
          val buf = new Array[Byte](8192)
          while (!d.finished()) compressed += d.deflate(buf)
        } finally d.end()
      }
      // empty text deflates to the empty-stream marker; define 1.0
      // (incompressible) so the filter never divides by zero
      val ratio =
        if (raw.length == 0) 1.0
        else compressed.toDouble / raw.length.toDouble
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](raw.length.toLong, compressed, ratio))
    }

    protected override def nullSafeEval(input: Any): Any =
      stats(input.asInstanceOf[UTF8String])

    override protected def withNewChildInternal(
        c: org.apache.spark.sql.catalyst.expressions.Expression): DeflateStats =
      copy(child = c)
  }

  /** `struct(raw_bytes, deflate_bytes, ratio)` of a text column at the
    * given zlib level (default 6, zlib's own default). */
  def deflateStats(c: Column, level: Int = 6): Column =
    GraftBridge.column(DeflateStats(GraftBridge.expression(c), level))
}
