package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class MarkovSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  test("transition counts and probabilities match a hand trace") {
    // user 1: a -> b -> a -> c ; user 2: a -> b
    val rows = Seq(
      (1L, ts(0), 0L, "a"), (1L, ts(1), 1L, "b"),
      (1L, ts(2), 2L, "a"), (1L, ts(3), 3L, "c"),
      (2L, ts(0), 4L, "a"), (2L, ts(1), 5L, "b"))
    val got = Markov.transitions(rows.toDF("u", "ts", "id", "st"),
        Seq("u"), "ts", "st", tieCols = Seq("id"))
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // from a: a->b twice, a->c once; from b: b->a once
    assert(got(("a", "b")) == ((2L, 2.0 / 3)))
    assert(got(("a", "c")) == ((1L, 1.0 / 3)))
    assert(got(("b", "a")) == ((1L, 1.0)))
    assert(got.size == 3)
  }

  test("cross-user boundaries never form transitions; ties use tieCols") {
    // same timestamp, order decided by the id tiebreak
    val rows = Seq(
      (1L, ts(0), 2L, "second"), (1L, ts(0), 1L, "first"),
      (2L, ts(5), 3L, "x"))
    val got = Markov.transitions(rows.toDF("u", "ts", "id", "st"),
        Seq("u"), "ts", "st", tieCols = Seq("id"))
      .as[(String, String, Long, Double)].collect()
    assert(got.toSeq == Seq(("first", "second", 1L, 1.0)))
  }

  test("null states and null timestamps drop; singleton keys contribute nothing") {
    val rows = Seq(
      (1L, Some(ts(0)), 0L, Some("a")), (1L, Some(ts(1)), 1L, None),
      (1L, Some(ts(2)), 2L, Some("b")), (1L, None, 3L, Some("c")),
      (3L, Some(ts(0)), 4L, Some("solo")))
      .map { case (u, t, i, s) => (u, t.orNull, i, s.orNull) }
    val got = Markov.transitions(rows.toDF("u", "ts", "id", "st"),
        Seq("u"), "ts", "st", tieCols = Seq("id"))
      .as[(String, String, Long, Double)].collect()
    // the null state row is removed BEFORE pairing, so a->b bridges it
    assert(got.toSeq == Seq(("a", "b", 1L, 1.0)))
  }

  test("guards: missing columns, empty keys") {
    val df = Seq((1L, ts(0), "a")).toDF("u", "ts", "st")
    intercept[IllegalArgumentException](
      Markov.transitions(df, Seq("u"), "nope", "st"))
    intercept[IllegalArgumentException](
      Markov.transitions(df, Seq.empty, "ts", "st"))
  }
}
