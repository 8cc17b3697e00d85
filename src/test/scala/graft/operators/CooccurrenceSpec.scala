package graft.operators

import graft.SparkSpec

class CooccurrenceSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed support/confidence/lift on a small basket set") {
    // baskets: {a,b,c} {a,b} {a,c} {b} — N=4
    val rows = Seq(
      (1L, "a"), (1L, "b"), (1L, "c"),
      (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "c"),
      (4L, "b"))
    val got = Cooccurrence.pairs(rows.toDF("b", "i"), "b", "i")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6)))).toMap
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    // counts: a=3, b=3, c=2; co(a,b)=2, co(a,c)=2, co(b,c)=1
    assert(got(("a", "b")) ==
      ((2L, 0.5, r6(2.0 / 3), r6(2.0 / 3), r6(2 * 4.0 / 9))))
    assert(got(("a", "c")) == ((2L, 0.5, r6(2.0 / 3), 1.0, r6(2 * 4.0 / 6))))
    assert(got(("b", "c"))._1 == 1L)
    assert(got(("b", "c"))._5 == r6(4.0 / 6))
  }

  test("duplicate items in a basket count once; minCount filters") {
    val rows = Seq((1L, "x"), (1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"))
    val all = Cooccurrence.pairs(rows.toDF("b", "i"), "b", "i")
      .collect()
    assert(all.length == 1 && all.head.getLong(2) == 2L)
    val filtered = Cooccurrence.pairs(rows.toDF("b", "i"), "b", "i",
      minCount = 3)
    assert(filtered.count() == 0)
  }

  test("a degenerate mega-basket is dropped by the skew cap") {
    val mega = (1 to 50).map(i => (99L, s"i$i"))
    val rows = Seq((1L, "i1"), (1L, "i2"), (2L, "i1"), (2L, "i2")) ++ mega
    val got = Cooccurrence.pairs(rows.toDF("b", "i"), "b", "i",
        maxBasketSize = 10)
      .collect()
    // only the two small baskets pair; the 50-item basket contributes
    // nothing (and its items don't inflate the denominators)
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(2) == 2L && r.getDouble(4) == 1.0)
  }

  test("guards") {
    val df = Seq((1L, "a")).toDF("b", "i")
    intercept[IllegalArgumentException](Cooccurrence.pairs(df, "b", "nope"))
    intercept[IllegalArgumentException](
      Cooccurrence.pairs(df, "b", "i", minCount = 0))
    intercept[IllegalArgumentException](
      Cooccurrence.pairs(df, "b", "i", maxBasketSize = 1))
  }
}
