package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RecognitionSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)

  test("hand-checked spread: day weights, exact cent reconciliation") {
    // 2024-01-15 .. 2024-03-10: Jan 17d, Feb 29d (leap), Mar 10d = 56d
    // value 100.00 → 10000 cents: floors 3035/5178/1785 (Σ 9998),
    // remainders 40/32/40 → rem-desc-then-month order gives the 2
    // leftover cents to Jan and Mar
    val df = Seq((1L, d("2024-01-15"), d("2024-03-10"), 100.0))
      .toDF("id", "s", "e", "v")
    val out = Recognition.byMonth(df, "id", "s", "e", "v")
      .orderBy($"month_start")
      .select($"month_start".cast("string"), $"days", $"recognized")
      .as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(("2024-01-01", 17L, 3036L),
      ("2024-02-01", 29L, 5178L), ("2024-03-01", 10L, 1786L)))
    assert(out.map(_._3).sum == 10000L)
  }

  test("single-month span recognizes everything at once") {
    val df = Seq((7L, d("2024-05-03"), d("2024-05-28"), 42.37))
      .toDF("id", "s", "e", "v")
    val out = Recognition.byMonth(df, "id", "s", "e", "v").collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("days") == 26L &&
      out(0).getAs[Long]("recognized") == 4237L)
  }

  test("cent totals reconcile exactly across many random-ish spans") {
    val rows = (1L to 50L).map { i =>
      (i, d(f"2024-0${(i % 6 + 1)}%d-0${(i % 9 + 1)}%d"),
        d(f"2024-0${math.min(9, i % 6 + 3)}%d-1${i % 9}%d"),
        i * 13.17 + 0.01 * (i % 7))
    }
    val df = rows.toDF("id", "s", "e", "v")
    val sums = Recognition.byMonth(df, "id", "s", "e", "v")
      .groupBy($"id").agg(sum($"recognized").as("cents"))
      .as[(Long, Long)].collect().toMap
    rows.foreach { case (i, _, _, v) =>
      assert(sums(i) == math.floor(v * 100.0 + 0.5).toLong,
        s"id $i: ${sums(i)} cents vs value $v")
    }
    // end < start is a loud data bug
    val bad = Seq((9L, d("2024-05-10"), d("2024-05-01"), 1.0))
      .toDF("id", "s", "e", "v")
    val ex = intercept[Exception](
      Recognition.byMonth(bad, "id", "s", "e", "v").collect())
    assert(ex.getMessage.contains("end before start") ||
      Option(ex.getCause).exists(_.getMessage.contains("end before start")))
  }
}
