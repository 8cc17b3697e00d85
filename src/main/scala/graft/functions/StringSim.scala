package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler string similarity as a native codegen'd expression —
  * the record-linkage scoring primitive (Winkler 1990, the US Census
  * string comparator). Spark has no built-in; a Scala UDF would fall
  * out of whole-stage codegen on the hot path (every candidate pair of
  * a blocked fuzzy join).
  *
  * Semantics are pinned to DuckDB's `jaro_winkler_similarity` so the
  * oracle can replay scores directly (probed live, unit-pinned):
  * UTF-8 BYTE-level comparison (probed: 'héllo' vs 'hèllo' scores as
  * 6-byte strings sharing the 0xC3 lead byte — DuckDB does not decode
  * codepoints here), either-empty → 0.0 (INCLUDING both empty), match
  * window max(max(l1,l2)/2 - 1, 0) so two 1-char strings only match in
  * place, transpositions halved, and the Winkler prefix boost (up to 4
  * bytes, weight 0.1) applied ONLY when the Jaro score exceeds 0.7.
  * Byte-level also means no decode cost on the hot path. */
object StringSim {

  /** UTF-8 byte-level Jaro-Winkler in [0, 1]. Static worker shared by
    * interpreted eval and generated code. */
  def jaroWinkler(s1: UTF8String, s2: UTF8String): Double = {
    val c1 = s1.getBytes
    val c2 = s2.getBytes
    val n1 = c1.length
    val n2 = c2.length
    if (n1 == 0 || n2 == 0) return 0.0
    val window = math.max(math.max(n1, n2) / 2 - 1, 0)
    val matched1 = new Array[Boolean](n1)
    val matched2 = new Array[Boolean](n2)
    var m = 0
    var i = 0
    while (i < n1) {
      val lo = math.max(0, i - window)
      val hi = math.min(i + window, n2 - 1)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!matched2(j) && c1(i) == c2(j)) {
          matched1(i) = true
          matched2(j) = true
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched chars compared in order; each out-of-place
    // pair counts once after halving
    var t = 0
    var k = 0
    i = 0
    while (i < n1) {
      if (matched1(i)) {
        while (!matched2(k)) k += 1
        if (c1(i) != c2(k)) t += 1
        k += 1
      }
      i += 1
    }
    val half = t / 2
    val jaro = (m.toDouble / n1 + m.toDouble / n2 +
      (m - half).toDouble / m) / 3.0
    if (jaro <= 0.7) jaro
    else {
      var prefix = 0
      while (prefix < 4 && prefix < n1 && prefix < n2 &&
        c1(prefix) == c2(prefix)) prefix += 1
      jaro + prefix * 0.1 * (1.0 - jaro)
    }
  }

  case class JaroWinklerSim(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = DoubleType
    override def prettyName: String = "jaro_winkler"

    override protected def nullSafeEval(l: Any, r: Any): Any =
      jaroWinkler(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      defineCodeGen(ctx, ev, (l, r) =>
        s"graft.functions.StringSim.jaroWinkler($l, $r)")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): JaroWinklerSim =
      copy(left = newLeft, right = newRight)
  }

  /** Column API: `jaro_winkler(a, b)` in [0, 1]. */
  def jaro_winkler(a: Column, b: Column): Column =
    GraftBridge.column(JaroWinklerSim(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** SQL surface: `jaro_winkler(a, b)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaro_winkler", {
        case Seq(a, b) => JaroWinklerSim(a, b)
        case other => throw graft.core.GraftError.Configuration(
          s"jaro_winkler takes exactly 2 arguments, got ${other.size}")
      }, "scala_udf")
}
