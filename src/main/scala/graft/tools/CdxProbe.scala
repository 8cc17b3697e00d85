package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.{CdxIndex, WarcSource}

/** CDX same-JVM rep diagnosis (round-16): the full `q_cdx_lookup` gate
  * showed warm reps SLOWER than cold (12 s → 38 s at 100×) on both the
  * r15 and r16 trees, while `q_cdx_host` (same archive write, prefix
  * fetch instead of broadcast-join lookup) holds steady. This probe
  * separates the legs: one archive write, then N timed iterations of
  * (a) the CDX sidecar scan alone, (b) the broadcast-join lookup, and
  * (c) the prefix fetch — whichever leg degrades across same-JVM reps
  * is the one carrying the accumulated state.
  *
  * Usage: runMain graft.tools.CdxProbe [sfDir] [reps]
  */
object CdxProbe {
  def main(args: Array[String]): Unit = {
    graft.core.Logs.derbyHomeToScratch()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = "/root/repo/target/tmp/queries/cdx_probe"
    def t[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[cdx-probe] $what%-14s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet").select(
      concat(lit("http://corpus.test/doc/"), col("doc_id")).as("uri"),
      col("text"))
    t("write")(WarcSource.write(docs.repartition(col("uri")), out,
      "uri", "text", cdxIndex = true))
    val wanted = spark.read.parquet(s"$dir/documents.parquet")
      .filter(pmod(col("doc_id"), lit(5)) === 2)
      .select(concat(lit("http://corpus.test/doc/"), col("doc_id"))
        .as("uri"))
    (1 to reps).foreach { i =>
      t(s"scan#$i")(CdxIndex.read(spark, out).count())
      t(s"lookup#$i")(CdxIndex.lookup(spark, out, wanted).count())
      t(s"fetchall#$i")(CdxIndex.fetch(CdxIndex.read(spark, out)
        .filter(col("surt").startsWith("test,corpus)"))).count())
    }

    // --- revisit-resolve leg (round-18): the r17 verdict flagged the
    // forced hint broadcasts as the one 100×-unsafe shape; the guard
    // now falls back to shuffled equi-joins above the row bound. This
    // leg resolves EVERY archived record as a revisit (hints ≈ the
    // whole crawl — the realistic re-crawl ratio) on BOTH paths: the
    // default bound (broadcast at probe scale) and bound=0 (the
    // shuffled shape a crawl-scale hint volume takes). Counts must
    // match; the timings show the shuffled path is the same order,
    // not a cliff.
    val allRecs = WarcSource.read(spark, out)
      .filter(col("warc_type") === "response")
    val hints = allRecs.select(
      concat(lit("<urn:uuid:rev-"), col("record_id")).as("record_id"),
      col("target_uri"), lit("2026-01-08T00:00:00Z").as("warc_date"),
      col("record_id").as("refers_to"),
      lit("sha1:PROBE").as("payload_digest"))
    val nb = (1 to reps).map { i =>
      t(s"resolve-bcast#$i")(
        CdxIndex.resolveRevisits(spark, out, hints).count())
    }
    spark.conf.set("graft.cdx.broadcastRowBound", "0")
    val ns = (1 to reps).map { i =>
      t(s"resolve-shuffle#$i")(
        CdxIndex.resolveRevisits(spark, out, hints).count())
    }
    spark.conf.unset("graft.cdx.broadcastRowBound")
    require(nb.toSet == ns.toSet && nb.head > 0,
      s"broadcast vs shuffled resolve disagree: $nb vs $ns")

    // --- bounds-pruning leg (round-17): a MANY-HOST archive whose
    // shards own contiguous SURT runs (repartitionByRange — the layout
    // a production crawl writer produces when it clusters by URL), so
    // a host lookup intersects ~1–2 of the 256 sidecars. Timed with
    // the .cdx.bounds files present (pruned: non-intersecting sidecars
    // never open) vs deleted (legacy: every sidecar parses). The fetch
    // work is identical in both modes — the delta IS the index-scan
    // cost the bounds remove. `mult` multiplies the corpus (distinct
    // ids/uris) to push shard counts toward the CC shape.
    val mult = if (args.length > 2) args(2).toInt else 10
    val hostsOut = out + "_hosts"
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .crossJoin(spark.range(mult).select(col("id").as("rep")))
      .select((col("doc_id") * mult + col("rep")).as("id"), col("text"))
    val hostDocs = base.select(
      concat(lit("http://host"), pmod(col("id"), lit(1009)),
        lit(".test/doc/"), col("id")).as("uri"),
      col("text"))
    t("hosts-write")(WarcSource.write(
      hostDocs.repartitionByRange(256, col("uri")), hostsOut,
      "uri", "text", cdxIndex = true))
    (1 to reps).foreach { i =>
      t(s"host-pruned#$i")(
        CdxIndex.lookupHost(spark, hostsOut, "host500.test").count())
    }
    // strip the bounds → the legacy full-sidecar scan
    val fs = org.apache.hadoop.fs.FileSystem.get(
      java.net.URI.create(hostsOut), spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(hostsOut)).toSeq
      .map(_.getPath).filter(_.getName.endsWith(".cdx.bounds"))
      .foreach(p => fs.delete(p, false))
    (1 to reps).foreach { i =>
      t(s"host-legacy#$i")(
        CdxIndex.lookupHost(spark, hostsOut, "host500.test").count())
    }
    spark.stop()
  }
}
