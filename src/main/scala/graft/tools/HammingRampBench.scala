package graft.tools

import org.apache.spark.sql.{SparkSession, functions => F}

/** Scale ramp for the multi-index-Hamming pair engine
  * ([[graft.llm.Dedup.signaturePairs]]) at bucket occupancies that
  * actually exercise the perturbed keys — the r13 finding was that the
  * old 4-bit banding silently returned ZERO pairs past ~16·cap items,
  * and the gate fixtures (hundreds of images) could never see it.
  *
  * Corpus shape per n: `n / 10` clusters of 10 signatures — a base
  * pattern plus 9 members at exactly 1–2 planted bit flips (so every
  * intra-cluster pair sits at Hamming <= 4, well inside maxHamming =
  * 10) — which models a near-dup corpus (re-encodes/edits of shared
  * originals) rather than adversarially-uniform noise. Reported:
  * wall seconds (median of `reps`), pairs found, and planted-pair
  * recall (base→member pairs that MUST surface; any miss is a recall
  * bug, printed loudly and exit 1).
  *
  * Usage: runMain graft.tools.HammingRampBench [n] [reps] [cap]
  */
object HammingRampBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val reps = if (args.length > 1) args(1).toInt else 2
    val cap = if (args.length > 2) args(2).toInt else 100000
    require(n % 10 == 0, s"n must be a multiple of 10: $n")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val clusters = n / 10
    // deterministic signatures: base = splitmix-style mix of the
    // cluster id; member j flips bit (j*7+c)%64 and, for j >= 5, also
    // bit (j*13+c+31)%64 — intra-cluster distances 1..2 from base
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val sigs = spark.range(n.toLong).select(
      F.col("id"),
      (F.col("id") / 10).cast("long").as("c"),
      F.pmod(F.col("id"), F.lit(10)).as("j"))
      .as[(Long, Long, Long)]
      .map { case (id, c, j) =>
        val base = mix(c)
        val sig =
          if (j == 0) base
          else {
            val s1 = base ^ (1L << ((j * 7 + c) % 64).toInt)
            if (j >= 5) s1 ^ (1L << ((j * 13 + c + 31) % 64).toInt)
            else s1
          }
        (id, sig)
      }.toDF("id", "sig").localCheckpoint(true)

    def run(): (Double, Long) = {
      val t0 = System.nanoTime()
      val cnt = graft.llm.Dedup.signaturePairs(sigs, "id", "sig",
        maxHamming = 10, bands = 4, maxBucketSize = cap).count()
      ((System.nanoTime() - t0) / 1e9, cnt)
    }
    val runs = (1 to reps).map { i =>
      val (s, c) = run()
      println(f"[hamming-ramp] n=$n rep$i: $s%.2fs pairs=$c")
      (s, c)
    }
    val med = runs.map(_._1).sorted.apply(runs.size / 2)
    // recall audit: every base(c) -> member(c, j) pair is planted at
    // d <= 2 (and member-member pairs at d <= 4); check the base-member
    // set exhaustively
    val found = graft.llm.Dedup.signaturePairs(sigs, "id", "sig",
        maxHamming = 10, bands = 4, maxBucketSize = cap)
      .select(F.col("id_a"), F.col("id_b"))
      .filter(F.col("id_b") - F.col("id_a") < 10 &&
        (F.col("id_a") / 10).cast("long") === (F.col("id_b") / 10).cast("long"))
      .count()
    val expected = clusters.toLong * (10L * 9 / 2) // all intra-cluster pairs
    println(f"[hamming-ramp] n=$n median=$med%.2fs intra-cluster " +
      s"pairs found=$found expected=$expected " +
      (if (found == expected) "RECALL-OK" else "RECALL-MISS"))
    spark.stop()
    if (found != expected) sys.exit(1)
  }
}
