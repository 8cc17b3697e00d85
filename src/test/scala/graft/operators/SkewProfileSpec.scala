package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewProfileSpec extends SparkSpec {
  import spark.implicits._

  test("hand-checked profile: hot key, shares, entropy, salt") {
    // 8 rows: a×5, b×2, c×1 — max 5, avg 8/3, skew 15/8
    val df = (Seq.fill(5)("a") ++ Seq.fill(2)("b") ++ Seq("c")).toDF("k")
    val r = SkewProfile.profile(df, "k").collect()(0)
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(r.getAs[Long]("n_rows") == 8L && r.getAs[Long]("n_keys") == 3L)
    assert(r.getAs[String]("hot_key") == "a" &&
      r.getAs[Long]("max_count") == 5L)
    assert(r.getAs[Double]("avg_count") == r6(8.0 / 3))
    assert(r.getAs[Double]("skew_factor") == r6(15.0 / 8))
    assert(r.getAs[Double]("top10_share") == 1.0) // only 3 keys
    val h = math.log(8.0) +
      (-5 * math.log(5.0) - 2 * math.log(2.0) - 0.0) / 8.0
    assert(r.getAs[Double]("entropy_ratio") == r6(h / math.log(3.0)))
    assert(r.getAs[Int]("suggested_salt") == 2) // ceil(15/8)
  }

  test("uniform keys: skew 1, entropy 1, salt 1; single key: ratio 1") {
    val uni = (1 to 4).flatMap(k => Seq.fill(3)(s"k$k")).toDF("k")
    val r = SkewProfile.profile(uni, "k").collect()(0)
    assert(r.getAs[Double]("skew_factor") == 1.0 &&
      r.getAs[Double]("entropy_ratio") == 1.0 &&
      r.getAs[Int]("suggested_salt") == 1)
    val one = Seq.fill(5)("only").toDF("k")
    val r1 = SkewProfile.profile(one, "k").collect()(0)
    assert(r1.getAs[Double]("entropy_ratio") == 1.0 &&
      r1.getAs[String]("hot_key") == "only")
  }

  test("salt caps at maxSalt; hottest-key tie takes the smallest key") {
    // one key with 1000 rows + 999 singletons: skew ≈ 500 → capped
    val df = (Seq.fill(1000)("hot") ++ (1 to 999).map(i => s"s$i"))
      .toDF("k")
    val r = SkewProfile.profile(df, "k", maxSalt = 16).collect()(0)
    assert(r.getAs[Int]("suggested_salt") == 16)
    val tie = Seq("b", "b", "a", "a").toDF("k")
    assert(SkewProfile.profile(tie, "k").collect()(0)
      .getAs[String]("hot_key") == "a")
    intercept[IllegalArgumentException](
      SkewProfile.profile(df, "k", maxSalt = 0))
  }
}
