package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** CDX byte-range index: SURT key transform (Scala and Column forms
  * agree), sidecar write/read round trip, point-fetch correctness,
  * loud malformed lines. */
class CdxSpec extends SparkSpec {

  test("surtKey: reversed host, www/port/scheme/userinfo/fragment " +
      "handling, lowercase, non-URL fallthrough") {
    assert(CdxIndex.surtKey("http://www.Example.COM/Path?Q=1") ==
      "com,example)/path?q=1")
    assert(CdxIndex.surtKey("https://example.com:443/a") ==
      "com,example)/a")
    assert(CdxIndex.surtKey("http://example.com:8080/a") ==
      "com,example:8080)/a")
    assert(CdxIndex.surtKey("http://user:pw@sub.example.com/x#frag") ==
      "com,example,sub)/x")
    assert(CdxIndex.surtKey("http://example.com") == "com,example)/")
    assert(CdxIndex.surtKey("not a url") == "not a url")
    assert(CdxIndex.surtKey(null) == "")
  }

  test("malformed pseudo-URLs key identically in surtKey and surtCol: " +
      "a '://' without a valid scheme falls through to lowercasing in " +
      "BOTH spellings (no host reversal)") {
    import spark.implicits._
    val weird = Seq(
      "not a url://x.test/path", // space in 'scheme' → not a scheme
      "://no-scheme.test/a",     // empty scheme
      "1http://digit-head.test/a", // scheme must start with a letter
      "ht~tp://bad-char.test/a",
      "HTTPS://ok.test/A")       // valid scheme, mixed case → reverses
    val viaCol = weird.toDF("uri")
      .select(col("uri"), CdxIndex.surtCol(col("uri")).as("s"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    weird.foreach { u =>
      assert(viaCol(u) == CdxIndex.surtKey(u),
        s"divergence for '$u': col=${viaCol(u)} key=${CdxIndex.surtKey(u)}")
    }
    assert(CdxIndex.surtKey("not a url://x.test/path") ==
      "not a url://x.test/path")
    assert(CdxIndex.surtKey("HTTPS://ok.test/A") == "test,ok)/a")
  }

  test("surtCol (the SQL-replayable spelling) agrees with surtKey on " +
      "a varied frame") {
    import spark.implicits._
    val uris = Seq(
      "http://www.Example.COM/Path?Q=1",
      "https://example.com:443/a",
      "http://example.com:8080/a",
      "http://user:pw@sub.example.com/x#frag",
      "http://example.com",
      "http://a.b.c.test/deep/path/x.html")
    val got = uris.toDF("uri")
      .select(col("uri"), CdxIndex.surtCol(col("uri")).as("s"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    uris.foreach(u => assert(got(u) == CdxIndex.surtKey(u),
      s"mismatch for $u: col=${got(u)} key=${CdxIndex.surtKey(u)}"))
  }

  test("write(cdxIndex) emits SURT-sorted sidecars whose offsets " +
      "point-fetch the exact records; lookup joins a URI set") {
    import spark.implicits._
    val dir = tmpDir("cdx_rt")
    val rows = (0 until 30).map(i =>
      (s"http://h${i % 3}.test/p/$i", s"body number $i"))
    val n = WarcSource.write(rows.toDF("uri", "payload").repartition(3),
      dir, "uri", "payload", cdxIndex = true)
    assert(n == 30)
    val sidecars = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".cdx"))
    assert(sidecars.nonEmpty)
    // sidecar lines are SURT-sorted within each shard
    sidecars.foreach { f =>
      val keys = Files.readAllLines(Paths.get(f)).toArray
        .map(_.toString.split('\t')(0)).toSeq
      assert(keys == keys.sorted, s"$f not SURT-sorted")
    }
    val cdx = CdxIndex.read(spark, dir)
    assert(cdx.count() == 30)
    // every record point-fetches to its own uri + body
    val fetched = CdxIndex.fetch(cdx)
      .select(col("target_uri"), decode(col("http_body"), "UTF-8"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(fetched == rows.toMap)
    // lookup: a 10-uri subset returns exactly those
    val wanted = rows.take(10).map(_._1).toDF("uri")
    val got = CdxIndex.lookup(spark, dir, wanted)
      .select("target_uri").collect().map(_.getString(0)).toSet
    assert(got == rows.take(10).map(_._1).toSet)
  }

  test("lookupHost fetches exactly one host's records from a " +
      "multi-host archive (the SURT-adjacency scan); the closing " +
      "paren excludes prefix-lookalike hosts; lookupPrefix catches " +
      "subdomains under the reversed-domain form") {
    import spark.implicits._
    val dir = tmpDir("cdx_host")
    // three hosts + a lookalike (h1x.test shares h1's reversed prefix
    // text) + a subdomain of h1
    val rows =
      (0 until 12).map(i => (s"http://h${i % 3}.test/p/$i", s"b$i")) ++
        Seq(("http://h1x.test/p/90", "lookalike"),
          ("http://sub.h1.test/p/91", "subdomain"))
    WarcSource.write(rows.toDF("uri", "payload").repartition(3),
      dir, "uri", "payload", cdxIndex = true)
    val hostGot = CdxIndex.lookupHost(spark, dir, "h1.test")
      .select("target_uri").collect().map(_.getString(0)).toSet
    assert(hostGot == (0 until 12).filter(_ % 3 == 1)
      .map(i => s"http://h1.test/p/$i").toSet, s"got $hostGot")
    // domain-wide: reversed-domain prefix also sweeps the subdomain
    // (and, documented, would sweep lookalikes whose reversed form
    // extends the text — h1x.test does: 'test,h1x' starts 'test,h1')
    val domGot = CdxIndex.lookupPrefix(spark, dir, "test,h1,")
      .select("target_uri").collect().map(_.getString(0)).toSet
    assert(domGot == Set("http://sub.h1.test/p/91"), s"got $domGot")
    // www. drop mirrors the writer
    val viaWww = CdxIndex.lookupHost(spark, dir, "www.h1.test").count()
    assert(viaWww == 4)
  }

  test("boundsMayContain: the prefix block [P, P∞) intersects a " +
      "sidecar's [first, last] key range exactly when last is not " +
      "before the block and first is not past it") {
    // clear hit: prefix falls inside the range
    assert(CdxIndex.boundsMayContain("test,a)/x", "test,m)/y", "test,h"))
    // last sorts before every prefix-headed key → skip
    assert(!CdxIndex.boundsMayContain("test,a)/x", "test,g)/y", "test,h"))
    // first sorts after every prefix-headed key → skip
    assert(!CdxIndex.boundsMayContain("test,i)/x", "test,m)/y", "test,h"))
    // first EXTENDS the prefix: inside the block, must keep
    assert(CdxIndex.boundsMayContain("test,h1)/p", "test,z)/x", "test,h"))
    // boundary: last itself is a prefix-headed key
    assert(CdxIndex.boundsMayContain("test,a)/x", "test,h)/", "test,h)"))
    // degenerate single-key sidecar
    assert(CdxIndex.boundsMayContain("test,h)/p", "test,h)/p", "test,h"))
    assert(!CdxIndex.boundsMayContain("test,hh)/p", "test,hh)/p", "test,h)"))
  }

  test("lookupPrefix skips non-intersecting sidecars UNOPENED: after " +
      "corrupting every sidecar outside the host's bounds, the host " +
      "lookup stays green — and the full (unpruned) scan of the same " +
      "directory is loud, proving the corruption would bite if opened") {
    import spark.implicits._
    val dir = tmpDir("cdx_bounds_prune")
    // heavy a/z tails around a small m block, range-partitioned by uri
    // so shards own contiguous SURT runs (the 100 TB layout a bounds
    // index exists for)
    val rows =
      (0 until 30).map(i => (f"http://a.test/p/$i%02d", s"a$i")) ++
        (0 until 10).map(i => (f"http://m.test/p/$i%02d", s"m$i")) ++
        (0 until 30).map(i => (f"http://z.test/p/$i%02d", s"z$i"))
    WarcSource.write(
      rows.toDF("uri", "payload").repartitionByRange(3, col("uri")),
      dir, "uri", "payload", cdxIndex = true)
    val prefix = "test,m)"
    val bounds = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".cdx.bounds")).sorted
    assert(bounds.length == 3, s"expected 3 shards, got ${bounds.toSeq}")
    val prunable = bounds.filter { b =>
      val Array(first, last) = new String(
        Files.readAllBytes(Paths.get(b)), "UTF-8").trim.split('\t')
      !CdxIndex.boundsMayContain(first, last, prefix)
    }
    assert(prunable.nonEmpty,
      s"fixture must leave >= 1 non-intersecting sidecar: ${bounds.toSeq}")
    prunable.foreach { b =>
      val cdx = Paths.get(b.stripSuffix(".bounds"))
      Files.write(cdx,
        "CORRUPTED opening this sidecar means pruning failed\n"
          .getBytes("UTF-8"))
      // drop the Hadoop local-FS checksum sidecar so the control scan
      // reaches the CDX parser (a ChecksumException would be loud too,
      // but the assertion pins the parser's own error)
      Files.deleteIfExists(cdx.resolveSibling("." + cdx.getFileName + ".crc"))
    }
    val got = CdxIndex.lookupHost(spark, dir, "m.test")
      .select("target_uri").collect().map(_.getString(0)).toSet
    assert(got == (0 until 10).map(i => f"http://m.test/p/$i%02d").toSet,
      s"got $got")
    // control: without pruning the corrupted sidecars ARE opened
    val e = intercept[Exception] { CdxIndex.read(spark, dir).count() }
    assert((e.getMessage + Option(e.getCause).map(_.getMessage).mkString)
      .contains("malformed CDX"), e.getMessage)
  }

  test("a sidecar WITHOUT a bounds file (pre-bounds archive) still " +
      "scans under lookupPrefix; a malformed bounds line is loud") {
    import spark.implicits._
    val dir = tmpDir("cdx_bounds_legacy")
    WarcSource.write(
      Seq(("http://legacy.test/p/1", "old")).toDF("uri", "payload")
        .repartition(1),
      dir, "uri", "payload", cdxIndex = true)
    // simulate a pre-bounds archive: delete the bounds files
    Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".cdx.bounds"))
      .foreach(b => Files.delete(Paths.get(b)))
    val got = CdxIndex.lookupHost(spark, dir, "legacy.test").count()
    assert(got == 1)
    // malformed bounds: loud, not silently scanned or skipped
    Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".cdx")).foreach { f =>
        Files.write(Paths.get(f + ".bounds"), "one-field\n".getBytes("UTF-8"))
      }
    val e = intercept[Exception] {
      CdxIndex.lookupHost(spark, dir, "legacy.test").count() }
    assert((e.getMessage + Option(e.getCause).map(_.getMessage).mkString)
      .contains("bounds"), e.getMessage)
  }

  test("malformed CDX lines and missing sidecars are loud; indexed " +
      "URIs may not contain tabs") {
    import spark.implicits._
    val dir = tmpDir("cdx_bad")
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, "part-00000.cdx"),
      "only two\tfields\n".getBytes("UTF-8"))
    val e = intercept[Exception] { CdxIndex.read(spark, dir).count() }
    assert((e.getMessage + Option(e.getCause).map(_.getMessage).mkString)
      .contains("malformed CDX"), e.getMessage)
    val e2 = intercept[Exception] {
      CdxIndex.read(spark, tmpDir("cdx_none")).count() }
    assert(e2.getMessage.contains(".cdx"), e2.getMessage)
    val e3 = intercept[Exception] {
      WarcSource.write(Seq(("http://x.test/a\tb", "p")).toDF("uri", "payload"),
        tmpDir("cdx_tab"), "uri", "payload", cdxIndex = true)
    }
    assert((e3.getMessage + Option(e3.getCause).map(_.getMessage).mkString)
      .contains("CDX-indexed"), e3.getMessage)
  }
}
