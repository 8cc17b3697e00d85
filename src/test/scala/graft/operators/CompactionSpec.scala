package graft.operators

import graft.SparkSpec

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def parquetFiles(dir: String): Seq[java.io.File] =
    new java.io.File(dir).listFiles().toSeq
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))

  test("targetPartitions: ceil division, floor 1") {
    assert(Compaction.targetPartitions(0L, 128L << 20) == 1)
    assert(Compaction.targetPartitions(1L, 128L << 20) == 1)
    assert(Compaction.targetPartitions(128L << 20, 128L << 20) == 1)
    assert(Compaction.targetPartitions((128L << 20) + 1, 128L << 20) == 2)
    assert(Compaction.targetPartitions(10L << 30, 1L << 30) == 10)
    intercept[IllegalArgumentException](Compaction.targetPartitions(1L, 0L))
  }

  test("coalesce mode: many small files become few, content identical") {
    val dir = tmpDir("compact_in")
    val df = (1L to 2000L).map(i => (i, s"row_$i")).toDF("id", "s")
    df.repartition(40).write.parquet(s"$dir/frag")
    assert(parquetFiles(s"$dir/frag").size == 40)

    val before = Compaction.dirStats(spark, s"$dir/frag")
    assert(before.files == 40 && before.smallFiles == 40 && before.bytes > 0)

    val out = Compaction.compact(spark.read.parquet(s"$dir/frag"), 2)
    assert(out.rdd.getNumPartitions == 2)
    out.write.parquet(s"$dir/compacted")
    assert(parquetFiles(s"$dir/compacted").size == 2)
    val got = spark.read.parquet(s"$dir/compacted")
      .as[(Long, String)].collect().sortBy(_._1)
    assert(got.toSeq == (1L to 2000L).map(i => (i, s"row_$i")))
    // coalesce is shuffle-free: no Exchange in the physical plan
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("cluster mode: range partitions are key-disjoint and sorted") {
    val dir = tmpDir("compact_cluster")
    val rnd = new scala.util.Random(3)
    (1 to 5000).map(_ => (rnd.nextInt(100000).toLong, rnd.nextInt(10)))
      .toDF("k", "v").repartition(20).write.parquet(s"$dir/in")

    val out = Compaction.compact(
      spark.read.parquet(s"$dir/in"), 4, clusterBy = Seq("k"))
    out.write.parquet(s"$dir/out")
    val files = parquetFiles(s"$dir/out")
    assert(files.size == 4)
    // per-file min/max ranges must not overlap (that IS the skipping
    // property), and rows inside each file are sorted by k
    val ranges = files.map { f =>
      val ks = spark.read.parquet(f.getAbsolutePath)
        .select("k").as[Long].collect()
      assert(ks.sameElements(ks.sorted), s"unsorted file ${f.getName}")
      (ks.min, ks.max)
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) => assert(hi <= lo2)
      case _ => ()
    }
  }

  test("guards: bad partition count, unknown cluster column") {
    val df = Seq((1L, "a")).toDF("id", "s")
    intercept[IllegalArgumentException](Compaction.compact(df, 0))
    intercept[IllegalArgumentException](
      Compaction.compact(df, 1, clusterBy = Seq("nope")))
  }
}
