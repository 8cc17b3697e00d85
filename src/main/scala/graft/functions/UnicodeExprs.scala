package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.types._
import org.apache.spark.sql.GraftBridge
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a native codegen'd expression. Spark has no
  * built-in normalizer, and a Scala UDF here would fall out of
  * whole-stage codegen on exactly the hot path (every document, before
  * hashing); this stays a one-call scalar inside the generated code.
  *
  * Why it exists: content-hash dedup treats `café` (NFC) and `café`
  * (e + combining acute, NFD) as DIFFERENT documents — normalizing
  * before hashing is the standard fix, and crawls mix both forms
  * freely. NFC is the web's canonical form (and DuckDB's
  * `nfc_normalize` replays it in the oracle); NFKC additionally folds
  * compatibility characters (ligatures, full-width forms) and is the
  * aggressive-cleaning option, unit-pinned. */
object UnicodeExprs {

  case class UnicodeNormalize(child: org.apache.spark.sql.catalyst.expressions.Expression,
                              form: String)
    extends UnaryExpression {

    private val normalizerForm = java.text.Normalizer.Form.valueOf(form)

    override def dataType: DataType = StringType
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "unicode_normalize"

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      val ref = ctx.addReferenceObj("norm", this, classOf[UnicodeNormalize].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.normalize($c);")
    }

    protected override def nullSafeEval(input: Any): Any =
      normalize(input.asInstanceOf[UTF8String])

    def normalize(s: UTF8String): UTF8String = {
      val str = s.toString
      // fast path: already-normalized text (the overwhelming majority)
      // skips the rebuild and returns the input buffer untouched
      if (java.text.Normalizer.isNormalized(str, normalizerForm)) s
      else UTF8String.fromString(
        java.text.Normalizer.normalize(str, normalizerForm))
    }

    override protected def withNewChildInternal(
        c: org.apache.spark.sql.catalyst.expressions.Expression): UnicodeNormalize =
      copy(child = c)
  }

  /** NFC (canonical composition — the web's standard form). */
  def nfc(c: Column): Column =
    GraftBridge.column(UnicodeNormalize(GraftBridge.expression(c), "NFC"))

  /** NFKC (compatibility composition — also folds ligatures and
    * full-width forms; more aggressive, not byte-preserving for
    * stylistic variants). */
  def nfkc(c: Column): Column =
    GraftBridge.column(UnicodeNormalize(GraftBridge.expression(c), "NFKC"))

  /** SQL surface: `unicode_normalize(text[, 'NFC'|'NFD'|'NFKC'|'NFKD'])`
    * (default NFC). The form must be a string literal — loud otherwise,
    * same contract as the sketch registrations. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "unicode_normalize", {
        case Seq(t) => UnicodeNormalize(t, "NFC")
        case Seq(t, f) =>
          val form = f match {
            case org.apache.spark.sql.catalyst.expressions.Literal(v, StringType)
                if v != null => v.toString.toUpperCase
            case other => throw graft.core.GraftError.Configuration(
              s"unicode_normalize form must be a string literal, got $other")
          }
          if (!Set("NFC", "NFD", "NFKC", "NFKD")(form))
            throw graft.core.GraftError.Configuration(
              s"unicode_normalize form must be NFC|NFD|NFKC|NFKD, got '$form'")
          UnicodeNormalize(t, form)
        case exprs => throw graft.core.GraftError.Configuration(
          s"unicode_normalize expects (text[, form]), got ${exprs.length} arguments")
      }, "scala_udf")
}
