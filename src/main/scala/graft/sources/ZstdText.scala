package graft.sources

import java.io.{BufferedInputStream, BufferedReader, InputStream,
  InputStreamReader}
import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.GraftError

/** zstd/gzip-compressed text dumps — the shape big public corpora
  * actually ship in (The Pile and its descendants are `.jsonl.zst`;
  * many crawls export `.jsonl.gz`). Spark's own codec path needs the
  * native Hadoop library for zstd, which plenty of deployments (this
  * one included) don't load — so `.jsonl.zst` is otherwise simply
  * unreadable. zstd-jni ships on Spark's classpath; this source reads
  * through it directly.
  *
  * Read semantics: [[readLines]] yields (file, line) per non-empty
  * line, decompressing by extension (`.zst` via ZstdInputStream in
  * continuous mode — frame-per-record files read as one stream —
  * `.gz` via the JDK, plain otherwise); [[readJsonl]] parses the lines
  * as JSON with Spark's reader (schema inferred, malformed rows
  * surface under Spark's columnNameOfCorruptRecord contract rather
  * than dying). Writers emit one file per partition with the same
  * compression choices and task-attempt temp + rename commit.
  *
  * Scale design: file-granular parallelism (zstd/gzip streams are not
  * byte-splittable without an index); a corpus delivery is many
  * ~100 MB–1 GiB files. Memory per task = one line. */
object ZstdText {

  final case class TextLine(file: String, line: String)

  private val Extensions = Seq(
    ".jsonl.zst", ".jsonl.gz", ".jsonl",
    ".txt.zst", ".txt.gz", ".txt")

  // ----------------------------- read ---------------------------------

  /** Every non-empty line under `path` (one file or a directory of
    * dumps) as (file, line). */
  def readLines(spark: SparkSession, path: String): DataFrame = {
    val fs = FileSystem.get(java.net.URI.create(path), new Configuration())
    val p = new Path(path)
    val files: Seq[String] =
      if (fs.getFileStatus(p).isFile) Seq(path)
      else fs.listStatus(p).toSeq.filter(_.isFile)
        .filterNot(_.getPath.getName.startsWith("_tmp-"))
        .map(_.getPath.toString)
        .filter(f => Extensions.exists(f.endsWith)).sorted
    if (files.isEmpty)
      throw GraftError.Configuration(
        s"no ${Extensions.mkString("/")} files under $path")
    val rdd = spark.sparkContext.parallelize(files, files.size)
      .flatMap { f =>
        val ffs = FileSystem.get(java.net.URI.create(f), new Configuration())
        val raw: InputStream =
          new BufferedInputStream(ffs.open(new Path(f)))
        val in: InputStream =
          if (f.endsWith(".zst")) {
            val z = new com.github.luben.zstd.ZstdInputStream(raw)
            z.setContinuous(true)
            z
          } else if (f.endsWith(".gz")) new GZIPInputStream(raw)
          else raw
        val reader = new BufferedReader(
          new InputStreamReader(in, StandardCharsets.UTF_8))
        // EOF closes on the happy path; the task-end listener covers a
        // decode error / killed task abandoning the iterator mid-dump
        TarSource.closeOnTaskEnd(() => reader)
        new Iterator[TextLine] {
          private var nextL: String = advance()
          private def advance(): String = {
            var l = reader.readLine()
            while (l != null && l.isEmpty) l = reader.readLine()
            if (l == null) reader.close()
            l
          }
          override def hasNext: Boolean = nextL != null
          override def next(): TextLine = {
            val r = TextLine(f, nextL); nextL = advance(); r
          }
        }
      }
    spark.createDataset(rdd)(Encoders.product[TextLine]).toDF()
  }

  /** JSONL parse of [[readLines]]: Spark's JSON reader over the
    * decompressed lines (inferred schema; the standard
    * _corrupt_record contract for malformed rows). */
  def readJsonl(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.json(readLines(spark, path).select("line").as[String])
  }

  // ----------------------------- write --------------------------------

  /** Writes every row as one JSON line (`to_json` of the full struct),
    * one `part-N.jsonl[.zst|.gz]` per partition. `compression` is
    * "zstd" (default — the Pile shape), "gzip", or "none". Returns
    * rows written. */
  def writeJsonl(df: DataFrame, path: String,
                 compression: String = "zstd",
                 overwrite: Boolean = true): Long = {
    val suffix = compression match {
      case "zstd" => ".jsonl.zst"
      case "gzip" => ".jsonl.gz"
      case "none" => ".jsonl"
      case other => throw GraftError.Configuration(
        s"jsonl compression must be zstd|gzip|none, got '$other'")
    }
    val fs = FileSystem.get(java.net.URI.create(path), new Configuration())
    val out = new Path(path)
    if (overwrite && fs.exists(out)) fs.delete(out, true)
    fs.mkdirs(out)
    val slim = df.select(to_json(struct(df.columns.map(col)
      .toIndexedSeq: _*)).as("j"))
    val counter = df.sparkSession.sparkContext.longAccumulator("jsonl_rows")
    slim.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      if (rows.nonEmpty) {
        val idx = org.apache.spark.TaskContext.getPartitionId()
        val pfs = FileSystem.get(java.net.URI.create(path), new Configuration())
        val target = new Path(path, f"part-$idx%05d$suffix")
        val tmp = new Path(path,
          f"_tmp-part-$idx%05d-attempt-${TarSource.taskAttemptId()}$suffix")
        val base = pfs.create(tmp, true)
        val stream: java.io.OutputStream = suffix match {
          case s if s.endsWith(".zst") =>
            new com.github.luben.zstd.ZstdOutputStream(base)
          case s if s.endsWith(".gz") => new GZIPOutputStream(base)
          case _ => base
        }
        var n = 0L
        try rows.foreach { r =>
          stream.write(r.getString(0).getBytes(StandardCharsets.UTF_8))
          stream.write('\n')
          n += 1
        } finally stream.close()
        TarSource.commitTemp(pfs, tmp, target)
        counter.add(n)
      }
    }
    counter.value
  }
}
