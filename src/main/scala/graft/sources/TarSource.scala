package graft.sources

import java.io.{BufferedInputStream, InputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.GraftError

/** WebDataset tar shards (ustar, POSIX.1-1988) — the container
  * multimodal training runs stream from: a `.tar` of files named
  * `<key>.<ext>` where every file sharing a key is one SAMPLE
  * (`000001.jpg` + `000001.txt` + `000001.json`), samples stored
  * ADJACENTLY so a reader needs no index and no shuffle (Webdataset's
  * core design point — sequential I/O at rotational/S3 throughput).
  * Beyond-reference, next to [[WarcSource]]: WARC is the crawl INPUT
  * container, WebDataset the training OUTPUT container.
  *
  * Read semantics:
  *  - `read`: every regular tar entry as (file, key, ext, content,
  *    size) — key = entry name up to the FIRST dot past any directory
  *    prefix, ext = the rest (so `a/b/000001.seg.json` → key
  *    `a/b/000001`, ext `seg.json`, the WebDataset rule);
  *  - `readSamples`: adjacency-grouped inside the stream parse — one
  *    row per sample with an ext→content map, NO shuffle anywhere; a
  *    key that REAPPEARS non-adjacently fails LOUDLY (a shard that
  *    scattered its samples would silently split them — the exact
  *    failure WebDataset's layout contract exists to prevent);
  *  - header checksums are VERIFIED (loud mismatch with file + entry
  *    index), truncated entries and a missing end-of-archive are loud,
  *    non-file entries (directories, links) are skipped — they carry
  *    no sample bytes;
  *  - pax (`x`/`g`, POSIX.1-2001) and GNU (`L`/`K`) extension records
  *    are HONORED, not skipped: they carry the real (>100-byte) name
  *    of the entry that follows, so third-party shards written by
  *    GNU/pax tar read back under their FULL keys (r14 verdict: the
  *    old skip silently truncated them — the silent-wrong-key class).
  *    A pax `size=` override is honored too (large-entry headers); a
  *    dangling extension record at end-of-archive is loud;
  *  - `.tar` and `.tar.gz` both parse (JDK GZIPInputStream reads
  *    concatenated members, so member-per-sample gzip also works).
  *
  * Write semantics: one `.tar` per partition; rows are (key, ext,
  * content) and the writer sorts WITHIN each partition by (key, ext)
  * so samples land adjacent — repartition by key first if a key's
  * files are scattered across partitions (the writer then rejects the
  * cross-partition duplicate loudly on read-back rather than silently
  * splitting a sample). Entry names must fit ustar's 100-byte name
  * field (WebDataset keys are short by construction; loud otherwise).
  *
  * Scale design: FILE-granular parallelism like WARC — a training
  * corpus is many ~1 GiB shards, one task stream-parses one shard
  * with memory bounded by the largest single entry (its size header),
  * never the shard. */
object TarSource {

  final case class TarEntry(file: String, key: String, ext: String,
                            content: Array[Byte], size: Long)

  /** One WebDataset sample: every co-keyed entry's content by ext. */
  final case class TarSample(file: String, key: String,
                             exts: Map[String, Array[Byte]])

  private val Block = 512

  // ----------------------------- read ---------------------------------

  /** Every regular entry under `path` (a directory of shards or one
    * file) as one row. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val files = shardFiles(path)
    val rdd = spark.sparkContext.parallelize(files, files.size)
      .flatMap(f => entryIterator(f))
    spark.createDataset(rdd)(Encoders.product[TarEntry]).toDF()
  }

  /** One row per SAMPLE: (file, key, exts: map<ext, content>) —
    * grouped by adjacency inside the stream parse, no shuffle. */
  def readSamples(spark: SparkSession, path: String): DataFrame = {
    val files = shardFiles(path)
    val rdd = spark.sparkContext.parallelize(files, files.size)
      .flatMap { f =>
        val it = entryIterator(f)
        new Iterator[TarSample] {
          private val seen = scala.collection.mutable.HashSet.empty[String]
          private var cur: TarEntry = if (it.hasNext) it.next() else null
          override def hasNext: Boolean = cur != null
          override def next(): TarSample = {
            val key = cur.key
            if (!seen.add(key))
              throw GraftError.DataTransfer(
                s"$f: sample key '$key' reappears non-adjacently — the " +
                  "shard violates WebDataset's adjacency contract and " +
                  "this sample would silently split; re-shard with " +
                  "TarSource.write (which sorts within partitions)")
            var exts = Map.empty[String, Array[Byte]]
            while (cur != null && cur.key == key) {
              exts += (cur.ext -> cur.content)
              cur = if (it.hasNext) it.next() else null
            }
            TarSample(f, key, exts)
          }
        }
      }
    spark.createDataset(rdd)(Encoders.product[TarSample]).toDF()
  }

  private def shardFiles(path: String): Seq[String] = {
    val fs = FileSystem.get(java.net.URI.create(path), new Configuration())
    val p = new Path(path)
    val files: Seq[String] =
      if (fs.getFileStatus(p).isFile) Seq(path)
      else fs.listStatus(p).toSeq.filter(_.isFile)
        .filterNot(_.getPath.getName.startsWith("_tmp-")) // dead attempts
        .map(_.getPath.toString)
        .filter(f => f.endsWith(".tar") || f.endsWith(".tar.gz")).sorted
    if (files.isEmpty)
      throw GraftError.Configuration(s"no .tar/.tar.gz shards under $path")
    files
  }

  /** One raw header+content block, extension records included. */
  private final case class Raw(name: String, typeflag: Char,
                               content: Array[Byte], size: Long)

  /** Stream-parses one shard; holds at most one entry's content.
    * Extension-record state machine: a GNU `L` record or a pax `x`
    * `path=` key overrides the NEXT entry's name (whatever its type —
    * a skipped directory/link consumes its own override); a pax `g`
    * `path=` sets the global default; a pax `size=` overrides the next
    * entry's size field (headers whose octal field can't carry it).
    * GNU `K` (long LINK name) is consumed without effect — it renames
    * a link target, and links carry no sample bytes, so it must NOT
    * touch the name override. A dangling override at end-of-archive
    * is loud. */
  private def entryIterator(file: String): Iterator[TarEntry] = {
    val fs = FileSystem.get(java.net.URI.create(file), new Configuration())
    val raw = fs.open(new Path(file))
    val in: InputStream =
      if (file.endsWith(".gz")) new GZIPInputStream(new BufferedInputStream(raw))
      else new BufferedInputStream(raw)
    // EOF closes on the happy path; the task-end listener covers a
    // damaged header / killed task abandoning the iterator mid-shard
    closeOnTaskEnd(() => in)
    new Iterator[TarEntry] {
      private var idx = 0
      private var nameOverride: String = null // from 'L' or pax 'x' path=
      private var sizeOverride: Long = -1L    // from pax 'x' size=
      private var globalName: String = null   // from pax 'g' path= (rare)
      private var nextE: TarEntry = advance()
      private def advance(): TarEntry = {
        while (true) {
          val e = readRaw(in, file, idx, sizeOverride)
          idx += 1
          if (e == null) {
            if (nameOverride != null)
              throw GraftError.DataTransfer(
                s"$file: dangling pax/GNU long-name record at " +
                  "end-of-archive — the entry it names is missing")
            in.close()
            return null
          }
          e.typeflag match {
            case 'L' => // GNU longname: content IS the next entry's name
              nameOverride = nulTrimmed(e.content, file, idx - 1)
            case 'K' => // GNU longlink: renames a link target; consumed
              ()
            case 'x' => // pax per-entry: path= / size= keys
              val kv = paxRecords(e.content, file, idx - 1)
              kv.get("path").foreach(nameOverride = _)
              kv.get("size").foreach(s => sizeOverride = s.toLong)
            case 'g' => // pax global default
              paxRecords(e.content, file, idx - 1).get("path")
                .foreach(globalName = _)
            case '0' | '\u0000' =>
              val name =
                if (nameOverride != null) nameOverride
                else if (globalName != null) globalName
                else e.name
              nameOverride = null; sizeOverride = -1L
              // WebDataset key rule: split at the FIRST dot after the
              // last '/'
              val base = name.lastIndexOf('/') + 1
              val dot = name.indexOf('.', base)
              val (key, ext) =
                if (dot < 0) (name, "")
                else (name.substring(0, dot), name.substring(dot + 1))
              return TarEntry(file, key, ext, e.content, e.size)
            case _ => // dir/link/fifo/…: consumes its own override
              nameOverride = null; sizeOverride = -1L
          }
        }
        null // unreachable
      }
      override def hasNext: Boolean = nextE != null
      override def next(): TarEntry = { val r = nextE; nextE = advance(); r }
    }
  }

  /** The content of a GNU 'L'/'K' record: a NUL-terminated name. */
  private def nulTrimmed(b: Array[Byte], file: String, idx: Int): String = {
    var end = b.length
    while (end > 0 && b(end - 1) == 0) end -= 1
    if (end == 0)
      throw GraftError.DataTransfer(
        s"$file entry $idx: empty GNU long-name record")
    new String(b, 0, end, StandardCharsets.UTF_8)
  }

  /** Parses pax extended-header records: each is
    * `"<len> <key>=<value>\n"` where `<len>` is the DECIMAL byte
    * length of the whole record including itself, the space, and the
    * trailing newline (POSIX.1-2001 pax(1)). Malformed framing is
    * loud — a mis-framed record would silently shift every following
    * key. */
  private def paxRecords(b: Array[Byte], file: String,
                         idx: Int): Map[String, String] = {
    var off = 0
    var out = Map.empty[String, String]
    while (off < b.length) {
      var i = off
      var len = 0L
      while (i < b.length && b(i) >= '0' && b(i) <= '9') {
        len = len * 10 + (b(i) - '0'); i += 1
      }
      if (i == off || i >= b.length || b(i) != ' ' || len <= 0 ||
          off + len > b.length || b((off + len - 1).toInt) != '\n')
        throw GraftError.DataTransfer(
          s"$file entry $idx: malformed pax record framing at byte $off")
      val rec = new String(b, i + 1, (off + len - 1 - (i + 1)).toInt,
        StandardCharsets.UTF_8)
      val eq = rec.indexOf('=')
      if (eq < 0)
        throw GraftError.DataTransfer(
          s"$file entry $idx: pax record without '=' at byte $off")
      out += (rec.substring(0, eq) -> rec.substring(eq + 1))
      off += len.toInt
    }
    out
  }

  /** Reads one header+content; null at end-of-archive. `sizeOverride`
    * (>= 0) replaces the header's octal size field — the pax `size=`
    * path for entries whose size outgrows the 12-byte octal field. */
  private def readRaw(in: InputStream, file: String, idx: Int,
                      sizeOverride: Long): Raw = {
    val hdr = new Array[Byte](Block)
    val got = readFully(in, hdr)
    if (got == 0) return null // EOF with no terminator: tolerate (gnu tar does)
    if (got < Block)
      throw GraftError.DataTransfer(
        s"$file entry $idx: truncated tar header ($got of $Block bytes)")
    if (hdr.forall(_ == 0)) { // end-of-archive zero block
      return null
    }
    val stored = octal(hdr, 148, 8, file, idx, "chksum")
    var sum = 0L
    var i = 0
    while (i < Block) {
      sum += (if (i >= 148 && i < 156) ' '.toInt else hdr(i) & 0xff)
      i += 1
    }
    if (sum != stored)
      throw GraftError.DataTransfer(
        s"$file entry $idx: tar header checksum mismatch " +
          s"(computed $sum, stored $stored) — corrupt shard")
    val rawName = cstr(hdr, 0, 100)
    val prefix = cstr(hdr, 345, 155)
    val name = if (prefix.isEmpty) rawName else s"$prefix/$rawName"
    val typeflag = hdr(156).toChar
    // an extension record's own size is always in ITS header; the pax
    // size= override applies to the entry that FOLLOWS it
    val isExt = typeflag == 'x' || typeflag == 'g' || typeflag == 'L' ||
      typeflag == 'K'
    val size =
      if (sizeOverride >= 0 && !isExt) sizeOverride
      else octal(hdr, 124, 12, file, idx, "size")
    if (size > Int.MaxValue - 8) // mirror WarcSource's single-record bound
      throw GraftError.DataTransfer(
        s"$file entry $idx ('$name'): entry size $size exceeds the " +
          "2 GiB single-entry bound — split the sample")
    val content = new Array[Byte](size.toInt)
    if (readFully(in, content) < size)
      throw GraftError.DataTransfer(
        s"$file entry $idx ('$name'): content cut short of $size bytes")
    val pad = ((Block - (size % Block)) % Block).toInt
    if (pad > 0 && readFully(in, new Array[Byte](pad)) < pad)
      throw GraftError.DataTransfer(
        s"$file entry $idx ('$name'): missing content padding")
    Raw(name, typeflag, content, size)
  }

  private def readFully(in: InputStream, buf: Array[Byte]): Int = {
    var off = 0
    while (off < buf.length) {
      val n = in.read(buf, off, buf.length - off)
      if (n < 0) return off
      off += n
    }
    off
  }

  private def cstr(b: Array[Byte], off: Int, len: Int): String = {
    var end = off
    val max = off + len
    while (end < max && b(end) != 0) end += 1
    new String(b, off, end - off, StandardCharsets.UTF_8)
  }

  private def octal(b: Array[Byte], off: Int, len: Int,
                    file: String, idx: Int, field: String): Long = {
    var v = 0L; var i = off; val max = off + len; var any = false
    while (i < max && (b(i) == ' ' || b(i) == 0)) i += 1
    while (i < max && b(i) >= '0' && b(i) <= '7') {
      v = v * 8 + (b(i) - '0'); i += 1; any = true
    }
    if (!any)
      throw GraftError.DataTransfer(
        s"$file entry $idx: unparseable octal '$field' header field")
    v
  }

  // ----------------------------- write --------------------------------

  /** Writes (keyCol, extCol, contentCol) rows as one `.tar` (or
    * `.tar.gz` when `gzip`) per partition, sorted within each
    * partition by (key, ext) so samples are adjacent. By DEFAULT the
    * rows are first repartitioned BY KEY — a key whose files sit in
    * different partitions would otherwise land in different shards,
    * silently splitting the sample (the adjacency reader can only
    * police splits WITHIN a shard; the gate caught exactly this on a
    * union-built frame). Pass `repartitionByKey = false` only when
    * the frame is already key-partitioned and the extra exchange
    * matters. Content may be binary or string (UTF-8). Returns
    * entries written — narrowed to rows whose ext equals `countExt`
    * when set (how [[writeDocuments]] reports documents rather than
    * txt+json entry totals). */
  def write(df: DataFrame, path: String, keyCol: String, extCol: String,
            contentCol: String, gzip: Boolean = false,
            overwrite: Boolean = true,
            repartitionByKey: Boolean = true,
            countExt: String = null): Long = {
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
    val suffix = if (gzip) ".tar.gz" else ".tar"
    // foreachPartition, not .rdd: a DataFrame ACTION runs under a SQL
    // execution id, so upstream `observe` nodes (the curation stage
    // counts) fire — an .rdd sink would leave Observation.get blocked
    // forever. Entry counts ride an accumulator (exactly-once per
    // successful task for actions).
    val counter = df.sparkSession.sparkContext.longAccumulator("tar_entries")
    slim.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      if (rows.nonEmpty) {
        val idx = org.apache.spark.TaskContext.getPartitionId()
        val pfs = FileSystem.get(java.net.URI.create(path), new Configuration())
        // task-attempt temp + rename commit: a speculative or retried
        // attempt writing the FINAL name concurrently would interleave
        // into a corrupt shard — each attempt owns a unique temp file
        // and the first rename wins (the loser sees the target exists
        // and discards its temp)
        val target = new Path(path, f"part-$idx%05d$suffix")
        val tmp = new Path(path,
          f"_tmp-part-$idx%05d-attempt-${taskAttemptId()}$suffix")
        val base = pfs.create(tmp, true)
        val stream: java.io.OutputStream =
          if (gzip) new GZIPOutputStream(base) else base
        var n = 0L
        try {
          rows.foreach { r =>
            val name = r.getString(0) +
              (if (r.getString(1).isEmpty) "" else "." + r.getString(1))
            stream.write(entryBytes(name, r.getAs[Array[Byte]](2)))
            // countExt narrows the RETURNED count to one ext (the
            // writeDocuments document-count hook: a doc is one txt
            // entry plus an optional json sidecar — "Kept N rows" must
            // report documents, not entries); everything still writes
            if (countExt == null || r.getString(1) == countExt) n += 1
          }
          stream.write(new Array[Byte](Block * 2)) // end-of-archive
        } finally stream.close()
        commitTemp(pfs, tmp, target)
        counter.add(n)
      }
    }
    counter.value
  }

  /** Document-frame convenience over [[write]] — the curated-corpus →
    * training-shards composition (`curation:` jobs with a `.tar`
    * target): each row becomes one WebDataset sample keyed by `idCol`,
    * with `<key>.txt` holding the text and — when the frame carries
    * any OTHER columns — `<key>.json` holding them as one JSON object,
    * so weights/stage columns ride along instead of silently dropping.
    * Keys are the id rendered as a string; numeric ids are zero-padded
    * to 12 so lexicographic shard order == id order. Returns the
    * DOCUMENT count (txt entries only — a doc with extra columns
    * writes two entries, and "Kept N rows" must mean documents). */
  def writeDocuments(df: DataFrame, path: String, idCol: String,
                     textCol: String, gzip: Boolean = false,
                     overwrite: Boolean = true): Long = {
    val numericId = df.schema(idCol).dataType.isInstanceOf[
      org.apache.spark.sql.types.NumericType]
    val key =
      if (numericId) lpad(col(idCol).cast("string"), 12, "0")
      else col(idCol).cast("string")
    val rest = df.columns.filterNot(c => c == idCol || c == textCol)
    val txt = df.select(key.as("k"), lit("txt").as("e"),
      col(textCol).cast("string").as("c"))
    val entries =
      if (rest.isEmpty) txt
      else txt.union(df.select(key.as("k"), lit("json").as("e"),
        to_json(struct(rest.map(col).toIndexedSeq: _*)).as("c")))
    write(entries, path, "k", "e", "c", gzip = gzip,
      overwrite = overwrite, countExt = "txt")
  }

  /** Rename-commit shared by the tar and WARC sinks: first attempt to
    * land `target` wins; a losing (speculative/retried) attempt
    * deletes its temp and moves on. */
  private[sources] def commitTemp(fs: FileSystem, tmp: Path,
                                  target: Path): Unit = {
    if (!fs.rename(tmp, target)) {
      fs.delete(tmp, false)
      if (!fs.exists(target))
        throw GraftError.DataTransfer(
          s"could not commit $tmp to $target (rename failed and no " +
            "winner exists)")
    }
  }

  /** Unique per task ATTEMPT (not per partition) — distinguishes a
    * retry from the original; 0 outside a task (driver-side tests). */
  private[sources] def taskAttemptId(): Long =
    Option(org.apache.spark.TaskContext.get()).map(_.taskAttemptId())
      .getOrElse(0L)

  /** Closes `resource` when the task ends — the safety net every
    * streaming container iterator needs: the happy path closes at EOF,
    * but a parse error or a killed/aborted task abandons the iterator
    * mid-stream and would otherwise leak the file handle for the
    * executor's lifetime. `resource` is a thunk (not a captured value)
    * so iterators that SWAP streams as they advance (CdxIndex.fetch
    * walks file handles) close whatever is current at task end; close
    * is idempotent on Hadoop/JDK streams, so the EOF path double-close
    * is harmless. No-op outside a task (driver-side unit tests). */
  private[sources] def closeOnTaskEnd(resource: () => java.io.Closeable): Unit =
    Option(org.apache.spark.TaskContext.get()).foreach(
      _.addTaskCompletionListener[Unit] { _ =>
        val r = resource()
        if (r != null) try r.close() catch { case _: java.io.IOException => }
      })

  /** One ustar header + padded content. */
  private[sources] def entryBytes(name: String, content: Array[Byte]): Array[Byte] = {
    val nameBytes = name.getBytes(StandardCharsets.UTF_8)
    if (nameBytes.length > 100)
      throw GraftError.Configuration(
        s"tar entry name exceeds ustar's 100-byte field: '$name' — " +
          "WebDataset keys are short by construction; shorten the key")
    val hdr = new Array[Byte](Block)
    System.arraycopy(nameBytes, 0, hdr, 0, nameBytes.length)
    def oct(v: Long, off: Int, len: Int): Unit = {
      val s = java.lang.Long.toOctalString(v)
      val padded = ("0" * (len - 1 - s.length)) + s
      System.arraycopy(padded.getBytes(StandardCharsets.US_ASCII), 0,
        hdr, off, len - 1)
      // terminating NUL already zero
    }
    oct(420, 100, 8) // mode 0644
    oct(0, 108, 8); oct(0, 116, 8) // uid, gid
    oct(content.length.toLong, 124, 12)
    oct(0, 136, 12) // mtime 0: deterministic shards, byte-stable re-runs
    hdr(156) = '0' // regular file
    System.arraycopy("ustar".getBytes(StandardCharsets.US_ASCII), 0, hdr, 257, 5)
    hdr(263) = '0'; hdr(264) = '0' // version "00"
    java.util.Arrays.fill(hdr, 148, 156, ' '.toByte)
    var sum = 0L
    var i = 0
    while (i < Block) { sum += hdr(i) & 0xff; i += 1 }
    val cs = java.lang.Long.toOctalString(sum)
    val csPadded = ("0" * (6 - cs.length)) + cs
    System.arraycopy(csPadded.getBytes(StandardCharsets.US_ASCII), 0, hdr, 148, 6)
    hdr(154) = 0; hdr(155) = ' '
    val pad = (Block - (content.length % Block)) % Block
    val outBytes = new Array[Byte](Block + content.length + pad)
    System.arraycopy(hdr, 0, outBytes, 0, Block)
    System.arraycopy(content, 0, outBytes, Block, content.length)
    outBytes
  }
}
