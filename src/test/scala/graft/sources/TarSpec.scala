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

  test("pax/GNU long names are HONORED: /usr/bin/tar archives with " +
      ">100-byte paths read back under their FULL keys in both " +
      "--format=gnu (typeflag L) and --format=pax (typeflag x)") {
    assume(Files.exists(Paths.get("/usr/bin/tar")), "no system tar")
    // a path comfortably past ustar's 100-byte name field
    val deep = ("verylongdirectoryname-" + ("x" * 40)) + "/" +
      ("anotherverylongsegment-" + ("y" * 40))
    val src = tmpDir("tar_long_src")
    Files.createDirectories(Paths.get(src, deep))
    Files.write(Paths.get(src, deep, "sample0.txt"), "long body".getBytes("UTF-8"))
    Files.write(Paths.get(src, deep, "sample0.json"), """{"k":0}""".getBytes("UTF-8"))
    for (fmt <- Seq("gnu", "pax")) {
      val ar = Paths.get(tmpDir(s"tar_long_$fmt"), s"$fmt.tar").toString
      val p = new ProcessBuilder("/usr/bin/tar", s"--format=$fmt", "-cf", ar,
        "-C", src, deep).redirectErrorStream(true).start()
      assert(p.waitFor() == 0, s"tar --format=$fmt failed")
      val back = TarSource.read(spark, ar)
        .collect().map(r => (r.getString(1), r.getString(2),
          new String(r.getAs[Array[Byte]]("content"), "UTF-8"))).toSet
      val fullKey = s"$deep/sample0"
      assert(fullKey.length > 100, s"fixture too short: ${fullKey.length}")
      assert(back == Set((fullKey, "txt", "long body"),
        (fullKey, "json", """{"k":0}""")), s"[$fmt] got $back")
      // adjacency grouping sees ONE sample under the full key
      val samples = TarSource.readSamples(spark, ar).collect()
      assert(samples.length == 1 && samples.head.getString(1) == fullKey)
    }
  }

  test("a dangling GNU long-name record at end-of-archive is LOUD, " +
      "and a malformed pax record is LOUD") {
    val dir = tmpDir("tar_dangle")
    // entryBytes builds a regular-file header; patch the typeflag to
    // 'L' so the archive ends on a name-carrying record with no friend
    val lRec = TarSource.entryBytes("././@LongLink", "somename.txt\u0000".getBytes)
    patchTypeflag(lRec, 'L')
    val dangling = Paths.get(dir, "dangling.tar")
    Files.write(dangling, lRec ++ new Array[Byte](1024))
    val e1 = intercept[Exception] {
      TarSource.read(spark, dangling.toString).count() }
    assert((e1.getMessage + Option(e1.getCause).map(_.getMessage).mkString)
      .contains("dangling"), e1.getMessage)
    // malformed pax framing: record length lies
    val paxBody = "999 path=short\n".getBytes("UTF-8")
    val xRec = TarSource.entryBytes("pax_header", paxBody)
    patchTypeflag(xRec, 'x')
    val follower = TarSource.entryBytes("fallback.txt", "b".getBytes)
    val badPax = Paths.get(dir, "badpax.tar")
    Files.write(badPax, xRec ++ follower ++ new Array[Byte](1024))
    val e2 = intercept[Exception] {
      TarSource.read(spark, badPax.toString).count() }
    assert((e2.getMessage + Option(e2.getCause).map(_.getMessage).mkString)
      .contains("pax record"), e2.getMessage)
  }

  test("hand-built extension records: GNU L renames the next entry; " +
      "pax x path= wins over the header name; a skipped directory " +
      "consumes its own override instead of leaking it") {
    val dir = tmpDir("tar_ext")
    val longName = ("d" * 60) + "/" + ("e" * 60) + "/key42.txt"
    // [L rec naming longName][placeholder entry] → reads as longName
    val lRec = TarSource.entryBytes("././@LongLink",
      (longName + "\u0000").getBytes("UTF-8"))
    patchTypeflag(lRec, 'L')
    val placeholder = TarSource.entryBytes(longName.take(100), "v".getBytes)
    // pax x: "<len> path=<name>\n" with the length self-inclusive
    val paxName = ("p" * 70) + "/" + ("q" * 70) + "/key7.json"
    val paxRecord = {
      val kv = s" path=$paxName\n"
      // len = digits + kv; two-pass because len includes its own width
      var len = kv.length + 2
      if ((len.toString.length + kv.length) != len) len = kv.length + 3
      s"$len$kv".getBytes("UTF-8")
    }
    val xRec = TarSource.entryBytes("PaxHeaders.0/key7", paxRecord)
    patchTypeflag(xRec, 'x')
    val paxFollower = TarSource.entryBytes(paxName.take(100), "w".getBytes)
    // a directory whose own name came from an L record: the override
    // must die with the directory, not leak onto the next file
    val dirL = TarSource.entryBytes("././@LongLink",
      (("z" * 120) + "/\u0000").getBytes("UTF-8"))
    patchTypeflag(dirL, 'L')
    val dirEntry = TarSource.entryBytes(("z" * 99) + "/", Array.emptyByteArray)
    patchTypeflag(dirEntry, '5')
    val plain = TarSource.entryBytes("plain.txt", "p".getBytes)
    val ar = Paths.get(dir, "ext.tar")
    Files.write(ar, lRec ++ placeholder ++ xRec ++ paxFollower ++
      dirL ++ dirEntry ++ plain ++ new Array[Byte](1024))
    val back = TarSource.read(spark, ar.toString).collect()
      .map(r => (r.getString(1), r.getString(2))).toSet
    assert(back == Set(
      (longName.stripSuffix(".txt"), "txt"),
      (paxName.stripSuffix(".json"), "json"),
      ("plain", "txt")), s"got $back")
  }

  /** Re-stamps an entryBytes header with a new typeflag and fixes the
    * checksum (entryBytes always writes '0'). */
  private def patchTypeflag(block: Array[Byte], tf: Char): Unit = {
    block(156) = tf.toByte
    java.util.Arrays.fill(block, 148, 156, ' '.toByte)
    var sum = 0L
    (0 until 512).foreach(i => sum += block(i) & 0xff)
    val cs = java.lang.Long.toOctalString(sum)
    val padded = ("0" * (6 - cs.length)) + cs
    System.arraycopy(padded.getBytes("US-ASCII"), 0, block, 148, 6)
    block(154) = 0; block(155) = ' '.toByte
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
