package graft.sources

import java.io.BufferedInputStream
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.GraftError

/** ZIP container source/sink (PKWARE APPNOTE / the JDK's
  * `java.util.zip`) — how code corpora actually arrive (GitHub
  * archive exports, Kaggle dumps, vendor deliveries are zips, not
  * tars). Mirrors [[TarSource]]'s row shape so downstream code is
  * container-agnostic: (file, key, ext, content, size) with the
  * WebDataset key rule (split at the FIRST dot past the last '/').
  *
  * Read semantics: a streaming `ZipInputStream` walk over the local
  * headers — the central directory is NOT consulted, so truncated
  * archives fail loudly mid-stream instead of silently serving a
  * partial listing; directory entries skip; each entry inflates as it
  * streams (memory = one entry). A >2 GiB entry is a loud error.
  *
  * Write semantics: one `.zip` per partition, entries sorted by
  * (key, ext) within the partition, fixed entry timestamps so re-runs
  * are byte-stable, task-attempt temp + rename commit like the other
  * container sinks. Interop pinned both directions against
  * `/usr/bin/zip` / `unzip` in `ZipSpec`.
  *
  * Scale design: file-granular parallelism (one task streams one
  * archive); zips, like member-gzip WARCs, are not byte-splittable
  * without the central directory, and a corpus delivery is many
  * archives — fan out on file count, re-balance rows afterwards. */
object ZipSource {

  private val MaxEntryBytes = Int.MaxValue - 8L

  // ----------------------------- read ---------------------------------

  /** Every file entry under `path` (a `.zip` or a directory of them). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val fs = FileSystem.get(java.net.URI.create(path), new Configuration())
    val p = new Path(path)
    val files: Seq[String] =
      if (fs.getFileStatus(p).isFile) Seq(path)
      else fs.listStatus(p).toSeq.filter(_.isFile)
        .filterNot(_.getPath.getName.startsWith("_tmp-"))
        .map(_.getPath.toString).filter(_.endsWith(".zip")).sorted
    if (files.isEmpty)
      throw GraftError.Configuration(s"no .zip archives under $path")
    val rdd = spark.sparkContext.parallelize(files, files.size)
      .flatMap(entryIterator)
    spark.createDataset(rdd)(
      Encoders.product[TarSource.TarEntry]).toDF()
  }

  private def entryIterator(file: String): Iterator[TarSource.TarEntry] = {
    val fs = FileSystem.get(java.net.URI.create(file), new Configuration())
    val zin = new ZipInputStream(
      new BufferedInputStream(fs.open(new Path(file))))
    // EOF closes on the happy path below; the task-end listener covers
    // a parse error / killed task abandoning the iterator mid-archive
    TarSource.closeOnTaskEnd(() => zin)
    new Iterator[TarSource.TarEntry] {
      private var nextE: TarSource.TarEntry = advance()
      private def advance(): TarSource.TarEntry = {
        var e = zin.getNextEntry
        while (e != null && e.isDirectory) e = zin.getNextEntry
        if (e == null) { zin.close(); return null }
        if (e.getSize > MaxEntryBytes)
          throw GraftError.DataTransfer(
            s"$file entry '${e.getName}': ${e.getSize} bytes exceeds " +
              "the 2 GiB single-entry bound")
        val out = new java.io.ByteArrayOutputStream(
          math.max(64, e.getSize.toInt.max(0)))
        val buf = new Array[Byte](8192)
        var n = zin.read(buf)
        while (n >= 0) {
          if (out.size().toLong + n > MaxEntryBytes)
            throw GraftError.DataTransfer(
              s"$file entry '${e.getName}': inflates past the 2 GiB " +
                "single-entry bound")
          out.write(buf, 0, n)
          n = zin.read(buf)
        }
        val content = out.toByteArray
        val name = e.getName
        val base = name.lastIndexOf('/') + 1
        val dot = name.indexOf('.', base)
        val (key, ext) =
          if (dot < 0) (name, "")
          else (name.substring(0, dot), name.substring(dot + 1))
        TarSource.TarEntry(file, key, ext, content, content.length.toLong)
      }
      override def hasNext: Boolean = nextE != null
      override def next(): TarSource.TarEntry = {
        val r = nextE; nextE = advance(); r
      }
    }
  }

  // ----------------------------- write --------------------------------

  /** Writes (keyCol, extCol, contentCol) rows as one `.zip` per
    * partition, sorted by (key, ext) within each — the TarSource
    * contract, zip-shaped. Returns entries written. */
  def write(df: DataFrame, path: String, keyCol: String, extCol: String,
            contentCol: String, overwrite: Boolean = true,
            repartitionByKey: Boolean = true): Long = {
    val fs = FileSystem.get(java.net.URI.create(path), new Configuration())
    val out = new Path(path)
    if (overwrite && fs.exists(out)) fs.delete(out, true)
    fs.mkdirs(out)
    val isBinary = df.schema(contentCol).dataType ==
      org.apache.spark.sql.types.BinaryType
    val slim0 = df.select(
      col(keyCol).cast("string").as("key"),
      col(extCol).cast("string").as("ext"),
      (if (isBinary) col(contentCol)
       else encode(col(contentCol).cast("string"), "UTF-8")).as("content"))
    val slim = (if (repartitionByKey) slim0.repartition(col("key"))
                else slim0)
      .sortWithinPartitions("key", "ext")
    val counter = df.sparkSession.sparkContext.longAccumulator("zip_entries")
    slim.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      if (rows.nonEmpty) {
        val idx = org.apache.spark.TaskContext.getPartitionId()
        val pfs = FileSystem.get(java.net.URI.create(path), new Configuration())
        val target = new Path(path, f"part-$idx%05d.zip")
        val tmp = new Path(path,
          f"_tmp-part-$idx%05d-attempt-${TarSource.taskAttemptId()}.zip")
        val zout = new ZipOutputStream(pfs.create(tmp, true))
        var n = 0L
        try {
          rows.foreach { r =>
            val name = r.getString(0) +
              (if (r.getString(1).isEmpty) "" else "." + r.getString(1))
            val entry = new ZipEntry(name)
            // fixed timestamp: deterministic archives, byte-stable
            // re-runs (ZipEntry otherwise stamps wall-clock time)
            entry.setTime(0L)
            zout.putNextEntry(entry)
            zout.write(r.getAs[Array[Byte]](2))
            zout.closeEntry()
            n += 1
          }
        } finally zout.close()
        TarSource.commitTemp(pfs, tmp, target)
        counter.add(n)
      }
    }
    counter.value
  }
}
