package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** WebDataset tar shards: byte round trip, adjacency sample grouping,
  * GNU-tar interop in BOTH directions, checksum/truncation/duplicate
  * loudness, ustar field limits. */
class TarSpec extends SparkSpec {

  private def entries(n: Int) = {
    import spark.implicits._
    (0 until n).flatMap { i =>
      val k = f"sample$i%04d"
      Seq((k, "txt", s"text body $i"), (k, "json", s"""{"i":$i}"""))
    }.toDF("k", "e", "c")
  }

  test("round trip: write → read preserves names, bytes, and sizes; " +
      "readSamples groups by adjacency with both exts per sample") {
    val out = tmpDir("tar_rt")
    val written = TarSource.write(entries(20), out, "k", "e", "c")
    assert(written == 40)
    val back = TarSource.read(spark, out)
    assert(back.count() == 40)
    val row = back.filter(col("key") === "sample0003" && col("ext") === "txt")
      .head
    assert(new String(row.getAs[Array[Byte]]("content"), "UTF-8") ==
      "text body 3")
    assert(row.getLong(4) == "text body 3".length.toLong)
    val samples = TarSource.readSamples(spark, out)
    assert(samples.count() == 20)
    val s3 = samples.filter(col("key") === "sample0003").head
    val m = s3.getMap[String, Array[Byte]](2)
    assert(m.keys.toSet == Set("txt", "json"))
    assert(new String(m("json"), "UTF-8") == """{"i":3}""")
  }

  test("gzip shards round trip; key rule splits at the FIRST dot (a " +
      "multi-dot ext like seg.json survives whole)") {
    import spark.implicits._
    val out = tmpDir("tar_gz_rt")
    TarSource.write(Seq(("k1", "seg.json", "segmented"))
      .toDF("k", "e", "c"), out, "k", "e", "c", gzip = true)
    val back = TarSource.read(spark, out).head
    assert(back.getString(1) == "k1" && back.getString(2) == "seg.json")
  }

  test("GNU tar interop: our shards extract with /usr/bin/tar " +
      "byte-exactly, and a GNU-tar-created archive (with directory " +
      "entries) reads back, dirs skipped") {
    assume(Files.exists(Paths.get("/usr/bin/tar")), "no system tar")
    val out = tmpDir("tar_interop")
    TarSource.write(entries(3).coalesce(1), out, "k", "e", "c")
    val shard = Files.list(Paths.get(out)).toArray.map(_.toString)
      .filter(_.endsWith(".tar")).head
    val ex = tmpDir("tar_extract")
    val p1 = new ProcessBuilder("/usr/bin/tar", "-xf", shard, "-C", ex)
      .redirectErrorStream(true).start()
    assert(p1.waitFor() == 0, "GNU tar refused our shard")
    assert(new String(Files.readAllBytes(Paths.get(ex, "sample0001.txt")),
      "UTF-8") == "text body 1")
    // reverse: GNU tar creates (including a directory entry)
    val src = tmpDir("tar_src")
    Files.createDirectories(Paths.get(src, "d"))
    Files.write(Paths.get(src, "d", "a.txt"), "alpha".getBytes("UTF-8"))
    Files.write(Paths.get(src, "d", "a.json"), """{"x":1}""".getBytes("UTF-8"))
    val gnuTar = Paths.get(tmpDir("tar_gnu"), "gnu.tar").toString
    val p2 = new ProcessBuilder("/usr/bin/tar", "-cf", gnuTar, "-C", src, "d")
      .redirectErrorStream(true).start()
    assert(p2.waitFor() == 0)
    val back = TarSource.read(spark, gnuTar)
      .collect().map(r => (r.getString(1), r.getString(2),
        new String(r.getAs[Array[Byte]]("content"), "UTF-8"))).toSet
    assert(back == Set(("d/a", "txt", "alpha"), ("d/a", "json", """{"x":1}""")),
      s"got $back")
  }

  test("URI dispatch: .tar routes through Connectors; '#samples' " +
      "selects the adjacency-grouped shape") {
    val out = tmpDir("tar_dispatch")
    TarSource.write(entries(4), out, "k", "e", "c")
    val shard = Files.list(Paths.get(out)).toArray.map(_.toString)
      .filter(_.endsWith(".tar")).head
    assert(Connectors.read(spark, shard).columns.toSeq ==
      Seq("file", "key", "ext", "content", "size"))
    assert(Connectors.read(spark, s"$shard#samples").columns.toSeq ==
      Seq("file", "key", "exts"))
  }

  test("corruption is loud: flipped checksum byte, truncated content, " +
      "non-adjacent duplicate key, oversize entry name") {
    import spark.implicits._
    val dir = tmpDir("tar_bad")
    // hand-build a shard with A.txt, B.txt, A.json — a non-adjacent key
    val bad = Paths.get(dir, "split.tar")
    val bytes = TarSource.entryBytes("A.txt", "a".getBytes) ++
      TarSource.entryBytes("B.txt", "b".getBytes) ++
      TarSource.entryBytes("A.json", "{}".getBytes) ++
      new Array[Byte](1024)
    Files.write(bad, bytes)
    assert(TarSource.read(spark, bad.toString).count() == 3,
      "per-entry read is order-agnostic")
    val e1 = intercept[Exception] {
      TarSource.readSamples(spark, bad.toString).count() }
    assert((e1.getMessage + Option(e1.getCause).map(_.getMessage).mkString)
      .contains("adjacen"), e1.getMessage)
    // checksum flip
    val corrupt = bytes.clone(); corrupt(0) = 'Z'.toByte
    val badCk = Paths.get(dir, "badck.tar"); Files.write(badCk, corrupt)
    val e2 = intercept[Exception] {
      TarSource.read(spark, badCk.toString).count() }
    assert((e2.getMessage + Option(e2.getCause).map(_.getMessage).mkString)
      .contains("checksum"), e2.getMessage)
    // truncation: cut mid-content
    val trunc = Paths.get(dir, "trunc.tar")
    Files.write(trunc, TarSource.entryBytes("A.txt",
      ("x" * 700).getBytes).take(512 + 100))
    val e3 = intercept[Exception] {
      TarSource.read(spark, trunc.toString).count() }
    assert((e3.getMessage + Option(e3.getCause).map(_.getMessage).mkString)
      .contains("cut short"), e3.getMessage)
    // oversize name
    val e4 = intercept[Exception] {
      TarSource.write(Seq(("k" * 120, "txt", "x")).toDF("k", "e", "c"),
        tmpDir("tar_long"), "k", "e", "c") }
    assert((e4.getMessage + Option(e4.getCause).map(_.getMessage).mkString)
      .contains("100-byte"), e4.getMessage)
  }
}
