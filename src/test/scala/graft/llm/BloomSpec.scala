package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.BloomExprs

/** Portable Bloom filter: no false negatives, sized FP rate, build
  * partition-invariance, sharded path parity, loud misuse guards. */
class BloomSpec extends SparkSpec {

  import BloomExprs.P

  /** Scala replay of the documented hash family — the spec the oracle
    * SQL and the expressions must BOTH match. */
  private def positions(key: String, mBits: Int, k: Int): Seq[Long] = {
    var h1 = 0L; var h2 = 0L
    var i = 0
    while (i < key.length) {
      val cp = key.codePointAt(i)
      i += Character.charCount(cp)
      h1 = (h1 * 31 + cp) % P
      h2 = (h2 * 37 + cp) % P
    }
    (0 until k).map(j => (h1 + j * h2) % mBits)
  }

  test("expression positions equal the documented hash family, " +
      "codepoints not UTF-16 units (astral plane pinned)") {
    import spark.implicits._
    val keys = Seq("", "a", "hello world", "naïve café", "高性能", "x😀y")
    val got = keys.toDF("key")
      .select(col("key"), BloomExprs.keyPositions(col("key"), 8192, 4).as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    keys.foreach { key =>
      assert(got(key) == positions(key, 8192, 4), s"key '$key'")
    }
  }

  test("no false negatives: every built key tests true; build is " +
      "partition-count invariant (merge = OR)") {
    import spark.implicits._
    val keys = (0 until 500).map(i => s"document body number $i")
    val df = keys.toDF("key")
    val b1 = Bloom.build(df.repartition(7), col("key"), 16384, 5)
      .head.getAs[Array[Byte]]("bloom")
    val b2 = Bloom.build(df.coalesce(1), col("key"), 16384, 5)
      .head.getAs[Array[Byte]]("bloom")
    assert(b1.toSeq == b2.toSeq, "merge must equal single-partition build")
    val flagged = Bloom.probe(df, Bloom.build(df, col("key"), 16384, 5),
      col("key"), 16384, 5).filter(col("might_seen")).count()
    assert(flagged == 500)
  }

  test("sizeFor FP rate holds within 3x at the sized m/k; empty-ish " +
      "bloom rejects everything it never saw") {
    import spark.implicits._
    val n = 2000
    val (m, k) = Bloom.sizeFor(n, 0.01)
    val ref = (0 until n).map(i => s"seen key $i").toDF("key")
    val bloomDf = Bloom.build(ref, col("key"), m, k)
    val probes = (0 until 4000).map(i => s"NEVER seen probe $i").toDF("key")
    val fps = Bloom.probe(probes, bloomDf, col("key"), m, k)
      .filter(col("might_seen")).count()
    assert(fps <= 4000 * 0.03, s"FP count $fps exceeds 3x the 1% sizing")
  }

  test("sharded build+probe: parity with per-shard membership, empty " +
      "shards probe false, corpus columns survive") {
    import spark.implicits._
    val ref = (0 until 300).map(i => (i.toLong, s"ref text $i")).toDF("id", "key")
    val blooms = Bloom.buildSharded(ref, col("key"), shards = 8,
      mBitsPerShard = 8192, k = 4)
    assert(blooms.count() <= 8)
    val batch = ((0 until 300).map(i => (i.toLong, s"ref text $i")) ++
      (1000 until 1300).map(i => (i.toLong, s"novel text $i")))
      .toDF("id", "key")
    val out = Bloom.probeSharded(batch, blooms, col("key"),
      shards = 8, mBitsPerShard = 8192, k = 4)
    assert(out.columns.toSet == Set("id", "key", "might_seen"))
    val seen = out.filter(col("might_seen")).select("id")
      .collect().map(_.getLong(0)).toSet
    assert((0L until 300L).forall(seen), "no false negatives across shards")
    val fpAmongNovel = seen.count(_ >= 1000)
    assert(fpAmongNovel <= 30, s"$fpAmongNovel FPs among 300 novel keys")
  }

  test("guards are loud: bad mBits, bad k, bad sizeFor, " +
      "mismatched probe/filter sizing") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      BloomExprs.keyPositions(col("x"), 32, 3) } // < 64 bits
    intercept[IllegalArgumentException] {
      BloomExprs.keyPositions(col("x"), 4096, 0) }
    intercept[IllegalArgumentException] { Bloom.sizeFor(0, 0.01) }
    intercept[IllegalArgumentException] { Bloom.sizeFor(100, 1.5) }
    // sizeFor past the single-blob cap names the sharded path
    val e = intercept[IllegalArgumentException] {
      Bloom.sizeFor(10_000_000_000L, 0.01) }
    assert(e.getMessage.contains("buildSharded"))
    // probing a 4096-bit filter with 8192-bit positions is LOUD, not
    // silent wrong answers ("zzzz" hashes to position 6232 at m=8192 —
    // past the 4096-bit filter, so the range check must fire)
    val df = Seq("zzzz").toDF("key")
    val bloomDf = Bloom.build(df, col("key"), 4096, 3)
    val ex = intercept[Exception] {
      Bloom.probe(df, bloomDf, col("key"), 8192, 3).collect() }
    val msg = ex.getMessage +
      Option(ex.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("sized differently") || msg.contains("outside"),
      s"got: $msg")
  }

  test("probe plan: a pure projection — the blob rides as a literal; " +
      "NO join and NO exchange anywhere (a joined blob column copies " +
      "m/8 bytes into every probed row)") {
    import spark.implicits._
    // a parquet scan, not a LocalRelation — ConvertToLocalRelation
    // folds pure projections away and hides the plan shape under test
    val scratch = tmpDir("bloom_plan_pin")
    (0 until 100).map(i => s"key $i").toDF("key")
      .write.mode("overwrite").parquet(scratch)
    val df = spark.read.parquet(scratch)
    val bloomDf = Bloom.build(df, col("key"), 4096, 3)
    val plan = Bloom.probe(df, bloomDf, col("key"), 4096, 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Exchange"), plan)
    assert(plan.toLowerCase.contains("bloom_test"), plan)
    // sharded probe: same contract — per-row expression, no join
    val blooms = Bloom.buildSharded(df, col("key"), 4, 4096, 3)
    val planS = Bloom.probeSharded(df, blooms, col("key"), 4, 4096, 3)
      .queryExecution.executedPlan.toString
    assert(!planS.contains("Join") && !planS.contains("Exchange"), planS)
    assert(planS.toLowerCase.contains("bloom_test_sharded"), planS)
  }
}
