package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.Exchange

class PrefixJoinSpec extends SparkSpec {
  import spark.implicits._

  // dim over an 8-bit key space: three generations, deliberately
  // leaving some of the space uncovered
  private val dimRows = Seq(
    (2, 0L, "a"), (2, 1L, "b"),          // top-2-bit prefixes 00, 01
    (4, 1L, "c"), (4, 9L, "d"),          // refine 0001, 1001
    (7, 77L, "e"))                       // a /7 pinpoint
  private def dim = dimRows.toDF("len", "prefix", "geo")

  private def naiveLpm(key: Long): (Option[Int], Option[String]) =
    dimRows.filter { case (l, p, _) => (key >> (8 - l)) == p }
      .sortBy(-_._1).headOption
      .map(r => (Some(r._1), Some(r._3))).getOrElse((None, None))

  test("every key in the space matches the naive longest-prefix scan") {
    val facts = (0L until 256L).toDF("ip")
    val got = PrefixJoin.lpmJoin(facts, dim, "ip", "len", "prefix",
        Seq("geo"), keyBits = 8)
      .select("ip", "matched_len", "geo")
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getInt(1))),
          Option(r.getString(2)))).toMap
    (0L until 256L).foreach { k =>
      assert(got(k) == naiveLpm(k), s"key $k")
    }
    // the fixture genuinely exercises specificity and the no-match path
    assert(got(0x10L)._1.contains(4))  // 0001... beats len-2 "a"
    assert(got(0x9AL)._1.contains(7))  // 1001101x hits the /7
    assert(got(0xF0L)._1.isEmpty)      // 11... uncovered
  }

  test("null payload on the winning prefix stays null (no fallthrough)") {
    val d = Seq((2, 0L, "short"), (4, 1L, null.asInstanceOf[String]))
      .toDF("len", "prefix", "geo")
    val got = PrefixJoin.lpmJoin(Seq(0x10L).toDF("ip"), d, "ip", "len",
        "prefix", Seq("geo"), keyBits = 8)
      .select("matched_len", "geo").collect().head
    assert(got.getInt(0) == 4 && got.isNullAt(1))
  }

  test("facts never shuffle: the plan contains no Exchange") {
    val facts = (0L until 64L).toDF("ip")
    val plan = PrefixJoin.lpmJoin(facts, dim, "ip", "len", "prefix",
      Seq("geo"), keyBits = 8).queryExecution.executedPlan
    def hasExchange(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      p.isInstanceOf[Exchange] || p.children.exists(hasExchange) ||
        p.subqueries.exists(hasExchange)
    assert(!hasExchange(plan), plan.toString)
  }

  test("guards: duplicate (len, prefix), bad lengths, payload clash") {
    val facts = Seq(1L).toDF("ip")
    val dup = Seq((2, 0L, "a"), (2, 0L, "b")).toDF("len", "prefix", "geo")
    intercept[IllegalArgumentException](
      PrefixJoin.lpmJoin(facts, dup, "ip", "len", "prefix", Seq("geo"), 8))
    val tooLong = Seq((9, 0L, "a")).toDF("len", "prefix", "geo")
    intercept[IllegalArgumentException](
      PrefixJoin.lpmJoin(facts, tooLong, "ip", "len", "prefix", Seq("geo"), 8))
    val clash = Seq((1L, "x")).toDF("ip", "geo")
    intercept[IllegalArgumentException](
      PrefixJoin.lpmJoin(clash, dim, "ip", "len", "prefix", Seq("geo"), 8))
  }
}
