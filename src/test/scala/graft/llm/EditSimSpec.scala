package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EditSimSpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("matches the brute-force join on a random vocab with planted typos") {
    val rnd = new scala.util.Random(5)
    val base = Seq.fill(60)(Seq.fill(4 + rnd.nextInt(6))(
      ('a' + rnd.nextInt(6)).toChar).mkString).distinct
    // planted: substitution, deletion, insertion, exact dup rows
    val typos = base.take(10).map(s => "z" + s.drop(1)) ++
      base.slice(10, 20).map(_.drop(1)) ++
      base.slice(20, 30).map(s => s.take(2) + "q" + s.drop(2))
    val corpus = (base ++ typos ++ base.take(5)).toDF("s") // dup rows too
    val got = EditSim.vocabPairs(corpus, "s")
      .as[(String, String, Int)].collect().toSet
    val vocab = (base ++ typos).distinct
    val want = (for {
      i <- vocab.indices; j <- vocab.indices if vocab(i) < vocab(j)
      d = lev(vocab(i), vocab(j)) if d <= 1
    } yield (vocab(i), vocab(j), d)).toSet
    assert(got == want)
  }

  test("single-char strings pair with each other (empty-string variant)") {
    val got = EditSim.vocabPairs(Seq("a", "b", "ab").toDF("s"), "s")
      .as[(String, String, Int)].collect().toSet
    assert(got == Set(("a", "b", 1), ("a", "ab", 1), ("ab", "b", 1)))
  }

  test("hot variant buckets drop at the cap (skew guard)") {
    // 50 strings all sharing the deletion variant "x" (two-char "x?"
    // strings): cap 10 poisons that bucket; pairs among them that meet
    // ONLY in the hot bucket vanish, distance-1 pairs that also meet
    // in a cold bucket survive
    val hot = (0 until 50).map(i => s"x${('a' + i % 26).toChar}").distinct
    val out = EditSim.vocabPairs(hot.toDF("s"), "s", maxBucketSize = 10)
      .as[(String, String, Int)].collect()
    val full = EditSim.vocabPairs(hot.toDF("s"), "s")
      .as[(String, String, Int)].collect()
    assert(out.length < full.length && full.nonEmpty)
  }

  test("maxDist other than 1 is rejected loudly") {
    intercept[IllegalArgumentException] {
      EditSim.vocabPairs(Seq("a").toDF("s"), "s", maxDist = 2)
    }
  }
}
