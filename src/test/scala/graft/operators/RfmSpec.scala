package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RfmSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")

  test("rfm: hand quintiles, recency inversion, segment code") {
    // 5 users, one event each except u5 (two events, big spend);
    // asOf 2024-02-01: recency spreads 1..30 days
    val ev = Seq(
      ("u1", ts(1), 10.0),                      // stale, cheap
      ("u2", ts(8), 20.0),
      ("u3", ts(15), 30.0),
      ("u4", ts(22), 40.0),
      ("u5", ts(29), 50.0), ("u5", ts(30), 60.0) // fresh, frequent, rich
    ).toDF("user", "t", "amount")
    val out = Rfm.score(ev, "user", "t", "amount",
        java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))
      .collect().map(r => r.getString(0) -> r).toMap
    // u5: freshest (r=5), most frequent (f=5), highest spend (m=5)
    val u5 = out("u5")
    assert(u5.getAs[Long]("frequency") == 2L &&
      u5.getAs[Double]("monetary") == 110.0)
    assert(u5.getAs[String]("segment") == "555")
    // u1: stalest, tied-lowest frequency, lowest spend -> "111"
    assert(out("u1").getAs[String]("segment") == "111")
    assert(out("u1").getAs[Long]("recency_days") == 30L)
    // 5 entities -> each quintile holds exactly one r rank
    assert(out.values.map(_.getAs[Int]("r")).toSeq.sorted == Seq(1, 2, 3, 4, 5))
    // frequency ties (four users at 1) break by entity id: u1<u2<u3<u4
    assert(out("u1").getAs[Int]("f") == 1 &&
      out("u4").getAs[Int]("f") == 4)
    // events after asOf are excluded entirely
    val cut = Rfm.score(ev, "user", "t", "amount",
      java.sql.Timestamp.valueOf("2024-01-10 00:00:00"))
    assert(cut.count() == 2) // only u1, u2 have events by then
    intercept[IllegalArgumentException](
      Rfm.score(ev, "nope", "t", "amount", ts(1)))
  }
}
