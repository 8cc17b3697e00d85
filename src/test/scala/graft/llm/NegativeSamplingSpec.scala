package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NegativeSamplingSpec extends SparkSpec {
  import spark.implicits._

  private val P = 1000000007L // Sampling.portableBucket's modulus
  private val K = 2654435761L
  private def target(q: Long, j: Long, seed: Long, n: Long): Long =
    ((q * 31 + j + seed) % P) * K % P % 1000000L % n

  test("negatives follow the portable-hash schedule; collisions drop") {
    val cands = (0L until 20L).toDF("doc_id")
    val pos = Seq((5L, 6L), (10L, 11L)).toDF("q_id", "pos_id")
    val out = NegativeSampling.negatives(pos, cands, "q_id", "pos_id",
        "doc_id", k = 3, seed = 7L)
      .collect().map(r => ((r.getLong(0), r.getInt(2)), r.getLong(3)))
      .toMap
    for (q <- Seq(5L, 10L); j <- 1 to 3) {
      val t = target(q, j, 7L, 20L) // rank == id here (dense 0..19)
      if (t != q && t != q + 1)
        assert(out((q, j)) == t, s"q=$q j=$j")
      else assert(!out.contains((q, j)), s"collision must drop q=$q j=$j")
    }
  }

  test("rank is id-ORDER rank, not the id value; determinism; guards") {
    // sparse ids: rank r maps to the r-th smallest id
    val cands = Seq(100L, 5L, 70L, 42L).toDF("doc_id")
    val sorted = Seq(5L, 42L, 70L, 100L)
    val pos = Seq((3L, 9L)).toDF("q_id", "pos_id")
    val out = NegativeSampling.negatives(pos, cands, "q_id", "pos_id",
        "doc_id", k = 4, seed = 1L)
      .collect().map(r => r.getInt(2) -> r.getLong(3)).toMap
    (1 to 4).foreach { j =>
      val exp = sorted(target(3L, j, 1L, 4L).toInt)
      assert(out(j) == exp, s"j=$j")
    }
    // same inputs, same draw — any partitioning
    val again = NegativeSampling.negatives(
        pos.repartition(7), cands.repartition(3), "q_id", "pos_id",
        "doc_id", k = 4, seed = 1L)
      .collect().map(r => r.getInt(2) -> r.getLong(3)).toMap
    assert(again == out)
    intercept[IllegalArgumentException](NegativeSampling.negatives(
      pos, cands, "q_id", "pos_id", "doc_id", k = 0))
    intercept[IllegalArgumentException](NegativeSampling.negatives(
      pos, Seq(1L).toDF("doc_id"), "q_id", "pos_id", "doc_id", k = 2))
  }
}
