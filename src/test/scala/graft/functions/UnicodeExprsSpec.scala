package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UnicodeExprsSpec extends SparkSpec {
  import spark.implicits._

  // decomposed inputs built from explicit code points
  private val nfdCafe = "cafe\u0301"          // e + combining acute
  private val nfcCafe = "caf\u00E9"           // é precomposed
  private val nfdUml = "Zu\u0308rich"
  private val nfcUml = "Z\u00FCrich"

  test("nfc/nfkc: composition, compatibility folding, null and fast paths") {
    val d = Seq(
      (1L, nfdCafe),
      (2L, nfcCafe),                           // already NFC → untouched
      (3L, s"$nfdUml \uFB01ne \uFF21BC"),    // fi-ligature + full-width A
      (4L, null.asInstanceOf[String]),
      (5L, "plain ascii")
    ).toDF("id", "t")
    val out = d.select($"id", UnicodeExprs.nfc($"t").as("nfc"),
        UnicodeExprs.nfkc($"t").as("nfkc"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(out(1L)._1 == nfcCafe && out(1L)._2 == nfcCafe)
    assert(out(2L)._1 == nfcCafe)
    // NFC composes the umlaut but PRESERVES compatibility chars;
    // NFKC additionally folds the ligature and full-width letter
    assert(out(3L)._1 == s"$nfcUml \uFB01ne \uFF21BC")
    assert(out(3L)._2 == s"$nfcUml fine ABC")
    assert(out(4L) == ((null, null)))
    assert(out(5L)._1 == "plain ascii")

    // interpreted eval agrees with the codegen path (same expression
    // evaluated directly vs through the generated projection)
    val expr = UnicodeExprs.UnicodeNormalize(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(nfdCafe)), "NFC")
    assert(expr.eval(null).toString == nfcCafe)
  }

  test("sql registration: unicode_normalize(text[, form]) with loud misuse") {
    UnicodeExprs.register(spark)
    Seq((1L, nfdCafe)).toDF("id", "t").createOrReplaceTempView("uni_sql")
    val got = spark.sql(
      "SELECT unicode_normalize(t) AS a, unicode_normalize(t, 'NFKC') AS b FROM uni_sql")
      .head
    assert(got.getString(0) == nfcCafe && got.getString(1) == nfcCafe)
    intercept[graft.core.GraftError.Configuration](
      spark.sql("SELECT unicode_normalize(t, 'NFX') FROM uni_sql").collect())
    intercept[graft.core.GraftError.Configuration](
      spark.sql("SELECT unicode_normalize(t, t) FROM uni_sql").collect())
  }
}
