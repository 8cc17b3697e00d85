package graft.operators

import graft.SparkSpec

class SurvivorshipSpec extends SparkSpec {
  import spark.implicits._

  private def rows = Seq(
    // key 1: A(p3) has name but null phone; B(p2) has both
    (1L, 3L, Some("ANN"), None, Some(30.0)),
    (1L, 2L, Some("ann"), Some("555"), Some(20.0)),
    (1L, 1L, None, Some("111"), Some(10.0)),
    // key 2: only the lowest-priority source has anything
    (2L, 1L, Some("bob"), None, None),
    // key 3: every source null for phone
    (3L, 2L, Some("cat"), None, Some(5.0)),
    (3L, 1L, Some("CAT"), None, None))
    .map { case (k, p, n, ph, b) =>
      (k, p, n.orNull, ph.orNull, b.map(Double.box).orNull)
    }

  test("each field survives from the highest-priority non-null source") {
    val got = Survivorship.goldenRecords(
        rows.toDF("k", "p", "name", "phone", "bal"),
        Seq("k"), "p", Seq("name", "phone", "bal"))
      .collect().map(r => r.getLong(0) -> r).toMap

    val r1 = got(1L)
    assert(r1.getString(1) == "ANN")   // p3 wins name
    assert(r1.getString(2) == "555")   // p3 null phone -> p2 survives
    assert(r1.getDouble(3) == 30.0)
    assert(r1.getLong(4) == 3L && r1.getLong(5) == 3L)

    val r2 = got(2L)
    assert(r2.getString(1) == "bob" && r2.isNullAt(2) && r2.isNullAt(3))
    assert(r2.getLong(4) == 1L && r2.getLong(5) == 1L)

    val r3 = got(3L)
    assert(r3.getString(1) == "cat" && r3.isNullAt(2))
    assert(r3.getDouble(3) == 5.0)
  }

  test("a tie on (key, priority) fails fast inside the one aggregation") {
    val tied = Seq((1L, 2L, "a"), (1L, 2L, "b")).toDF("k", "p", "name")
    val e = intercept[Exception](
      Survivorship.goldenRecords(tied, Seq("k"), "p", Seq("name")).collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("duplicate (key, priority)")), e)
  }

  test("guards: missing columns, empty field list") {
    val df = Seq((1L, 1L, "a")).toDF("k", "p", "name")
    intercept[IllegalArgumentException](
      Survivorship.goldenRecords(df, Seq("k"), "p", Seq("nope")))
    intercept[IllegalArgumentException](
      Survivorship.goldenRecords(df, Seq("k"), "p", Seq.empty))
  }
}
