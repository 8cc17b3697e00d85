package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FeatureHashSpec extends SparkSpec {
  import spark.implicits._

  private val P = 2147483647L
  private def polyHash(s: String): Long =
    s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % P)

  test("portable hash matches the driver-side fold; buckets and signs") {
    val words = Seq("alpha", "beta", "gamma", "a", "zz")
    val got = words.toDF("w")
      .select($"w", FeatureHash.portableStringHash($"w").as("h"))
      .as[(String, Long)].collect().toMap
    words.foreach(w => assert(got(w) == polyHash(w), s"hash($w)"))

    val docs = Seq((1L, "alpha beta alpha"), (2L, "Gamma")).toDF("id", "t")
    val out = FeatureHash.vectorize(docs, "id", "t", nBuckets = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def sign(w: String) =
      if ((polyHash(w) / 64) % 2 == 0) 1L else -1L
    val expAlphaBeta = Map(
      polyHash("alpha") % 64 -> 2 * sign("alpha"),
      polyHash("beta") % 64 -> sign("beta"))
    out.filter(_._1 == 1L).foreach { case (_, b, w) =>
      assert(expAlphaBeta(b) == w, s"doc 1 bucket $b") }
    // tokenization lowercases: "Gamma" hashes as "gamma"
    val g = out.filter(_._1 == 2L)
    assert(g.toSeq == Seq((2L, polyHash("gamma") % 64, sign("gamma"))))
  }

  test("signed cancellation keeps zero rows; unsigned counts plain tf") {
    // force a collision at tiny nBuckets: every token lands somewhere
    // in [0,2); opposite signs may cancel — the zero row must SURVIVE
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta"))
      .toDF("id", "t")
    val signed = FeatureHash.vectorize(docs, "id", "t", nBuckets = 2)
      .collect()
    assert(signed.nonEmpty && signed.forall(_.getLong(0) == 1L))
    val unsigned = FeatureHash.vectorize(docs, "id", "t", nBuckets = 2,
        signed = false)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(unsigned.values.sum == 6L, "unsigned weights are token counts")
    intercept[IllegalArgumentException](
      FeatureHash.vectorize(docs, "id", "t", nBuckets = 1))
  }
}
