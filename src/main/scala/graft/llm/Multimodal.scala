package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, plus a feature-extraction stage
  * (north-star surface from BASELINE.json).
  *
  * The decode seam ([[MediaDecoder]]) parses real IMAGE, AUDIO, and
  * VIDEO headers on the pure JVM — PNG IHDR / JPEG SOF / GIF screen
  * descriptor via [[ImageHeaders]], WAV/RIFF fmt+data chunks via
  * [[AudioHeaders]], ISO-BMFF (MP4/MOV) mvhd/tkhd boxes via
  * [[VideoHeaders]]; no codec libs needed for dimensions/shape. IMAGE
  * PIXELS are real too: [[PixelDecode]]/[[pixelStats]]/[[resize]] run
  * genuine `javax.imageio` decodes (PNG/GIF/BMP/baseline JPEG ship in
  * every JDK). VIDEO FRAMES are real for self-contained-frame codecs:
  * [[frameStats]] composes the [[Mp4Samples]] sample-table extraction
  * with the same `javax.imageio` decode, which covers MJPEG (each
  * sample is a complete JPEG). Only inter-frame codec decode
  * (H.264/VP9) remains a clearly-labeled stub — this container has no
  * video codecs.
  * Everything Spark-side is real and tested: the schema contract, the
  * per-partition batched execution (`mapPartitions`, the Scala analog
  * of `mapInPandas` batch shape), the partition sizing guidance, and
  * the output plumbing.
  *
  * Scale design: media blobs dominate bytes. The decode stage is a
  * narrow per-partition map — no shuffle — so throughput scales with
  * executors; `spark.sql.files.maxPartitionBytes` (and blob-size-aware
  * repartitioning, see [[repartitionBySize]]) keeps a partition's blobs
  * within executor memory.
  */
object Multimodal {

  /** Schema contract for a media table: id + opaque payload + metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StringType, nullable = true)          // JSON sidecar
  ))

  /** Extracted features appended by the decode stage. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("byte_len", LongType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("content_hash", LongType, nullable = false)
  ))

  /** The decode seam. A real deployment plugs a codec here; the stub is
    * DETERMINISTIC (derived from the payload bytes) so tests and oracles
    * are stable. */
  trait MediaDecoder extends Serializable {
    def decode(mediaType: String, payload: Array[Byte]): (Int, Int, Int)
  }

  /** STUB decoder — no codec libs in this container. Fakes dimensions
    * from the payload deterministically; replace with a real codec in
    * production. */
  object StubDecoder extends MediaDecoder {
    def decode(mediaType: String, payload: Array[Byte]): (Int, Int, Int) = {
      val b0 = if (payload.nonEmpty) payload(0) & 0xff else 0
      val b1 = if (payload.length > 1) payload(1) & 0xff else 0
      mediaType match {
        case "image" => (64 + b0 * 8, 64 + b1 * 8, 3)
        case "audio" => (payload.length, 1, 1)        // samples × mono
        case _       => (320, 240, 3)
      }
    }
  }

  /** Pure-JVM image header parsing — the real part of the decode seam
    * this container CAN run (no codec libs needed to read dimensions):
    * PNG IHDR, JPEG SOF0-15 marker scan, GIF logical screen descriptor.
    * Returns (width, height, channels) or None when the bytes are not a
    * recognized image format. */
  object ImageHeaders {

    def parse(b: Array[Byte]): Option[(Int, Int, Int)] =
      png(b).orElse(jpeg(b)).orElse(gif(b))

    private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
    private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
    private def be32(b: Array[Byte], i: Int): Long =
      (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
    private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)

    /** PNG: 8-byte signature, then the IHDR chunk (always first):
      * length(4) "IHDR" width(4) height(4) bitdepth(1) colortype(1).
      * Channels from the color type: 0 gray, 2 RGB, 3 palette (one
      * index channel), 4 gray+alpha, 6 RGBA. */
    private def png(b: Array[Byte]): Option[(Int, Int, Int)] = {
      val Sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      if (b.length < 26 || !Sig.indices.forall(i => u8(b, i) == Sig(i))) None
      else if (!(u8(b, 12) == 'I' && u8(b, 13) == 'H' &&
                 u8(b, 14) == 'D' && u8(b, 15) == 'R')) None
      else {
        val w = be32(b, 16); val h = be32(b, 20)
        val channels = u8(b, 25) match {
          case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
          case _ => return None
        }
        if (w < 1 || h < 1 || w > Int.MaxValue || h > Int.MaxValue) None
        else Some((w.toInt, h.toInt, channels))
      }
    }

    /** JPEG: FF D8, then a marker walk. Frame headers (SOF0-15 minus
      * the non-frame C4/C8/CC) carry length(2) precision(1) height(2)
      * width(2) components(1). Fill bytes (FF FF …) and standalone
      * markers (D0-D7, 01) are skipped; the walk stops at SOS (DA) /
      * EOI (D9) / corrupt structure. */
    private def jpeg(b: Array[Byte]): Option[(Int, Int, Int)] = {
      if (b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return None
      var i = 2
      while (i + 3 < b.length) {
        if (u8(b, i) != 0xff) return None // lost sync
        var j = i
        while (j < b.length && u8(b, j) == 0xff) j += 1 // fill bytes
        if (j >= b.length) return None
        val marker = u8(b, j)
        if (marker == 0xd9 || marker == 0xda) return None // EOI / SOS first
        else if ((marker >= 0xd0 && marker <= 0xd7) || marker == 0x01)
          i = j + 1 // standalone, no segment
        else {
          if (j + 2 >= b.length) return None
          val len = be16(b, j + 1)
          if (len < 2) return None
          val isSof = marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc
          if (isSof) {
            if (j + 8 >= b.length || len < 8) return None
            val h = be16(b, j + 4); val w = be16(b, j + 6)
            val channels = u8(b, j + 8)
            return if (w < 1 || h < 1 || channels < 1) None
                   else Some((w, h, channels))
          }
          i = j + 1 + len
        }
      }
      None
    }

    /** GIF87a/GIF89a: 6-byte signature then the logical screen
      * descriptor's little-endian width(2) height(2); GIF is always
      * palette-indexed → rendered RGB (3 channels). */
    private def gif(b: Array[Byte]): Option[(Int, Int, Int)] = {
      if (b.length < 10) return None
      val sig = new String(b, 0, 6, java.nio.charset.StandardCharsets.US_ASCII)
      if (sig != "GIF87a" && sig != "GIF89a") None
      else {
        val w = le16(b, 6); val h = le16(b, 8)
        if (w < 1 || h < 1) None else Some((w, h, 3))
      }
    }
  }

  /** Pure-JVM audio header parsing — WAV/RIFF: 12-byte RIFF/WAVE
    * preamble, then a chunk walk (chunks are `id(4) size(4,LE) body`,
    * word-aligned) reading the `fmt ` chunk's channels / sample rate /
    * block align and the `data` chunk's byte length. Returns
    * (sampleRate, frames, channels) — frames = data bytes / block
    * align, so duration in seconds is frames / sampleRate — or None
    * when the bytes are not a well-formed PCM-style WAV. */
  object AudioHeaders {

    private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
    private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
    private def le32(b: Array[Byte], i: Int): Long =
      u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
        (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
    private def tag(b: Array[Byte], i: Int): String =
      new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

    def parseWav(b: Array[Byte]): Option[(Int, Int, Int)] = {
      if (b.length < 12 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return None
      var i = 12
      var fmt: Option[(Int, Int, Int)] = None // (channels, sampleRate, blockAlign)
      var dataBytes = -1L
      while (i + 8 <= b.length && (fmt.isEmpty || dataBytes < 0)) {
        val id = tag(b, i)
        val size = le32(b, i + 4)
        if (size < 0 || i + 8 + size > b.length) return None
        if (id == "fmt " && size >= 16) {
          val channels = le16(b, i + 10)
          val rate = le32(b, i + 12)
          val blockAlign = le16(b, i + 20)
          if (channels < 1 || rate < 1 || rate > Int.MaxValue || blockAlign < 1)
            return None
          fmt = Some((channels, rate.toInt, blockAlign))
        } else if (id == "data") dataBytes = size
        i += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
      }
      fmt.flatMap { case (channels, rate, blockAlign) =>
        if (dataBytes < 0) None
        else {
          val frames = dataBytes / blockAlign
          if (frames > Int.MaxValue) None
          else Some((rate, frames.toInt, channels))
        }
      }
    }

    /** Full-fidelity chunk walk for the SAMPLE-statistics path:
      * (audioFormat, channels, sampleRate, bitsPerSample, dataOffset,
      * dataDeclaredBytes). Unlike [[parseWav]] this keeps the data
      * chunk's POSITION and does NOT reject a data chunk whose declared
      * size overruns the payload — a truncated download has intact
      * tables and a cut-short body, and [[Multimodal.audioStats]]
      * surfaces that as `decoded = false` rather than a vanished row
      * (the same lenient contract as [[Mp4Samples.parse]]'s
      * keepPrefix). Returns None only for structural non-WAV bytes. */
    def parsePcm(b: Array[Byte]): Option[(Int, Int, Int, Int, Long, Long)] = {
      if (b.length < 12 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return None
      var i = 12L
      var fmt: Option[(Int, Int, Int, Int)] = None // (format, ch, rate, bits)
      var dataOff = -1L
      var dataLen = -1L
      var walking = true
      while (walking && i + 8 <= b.length && (fmt.isEmpty || dataOff < 0)) {
        val ii = i.toInt
        val id = tag(b, ii)
        val size = le32(b, ii + 4) // unsigned u32 as Long — never negative
        if (id == "fmt ") {
          if (size < 16 || i + 8 + size > b.length) return None
          val format = le16(b, ii + 8)
          val channels = le16(b, ii + 10)
          val rate = le32(b, ii + 12)
          val bits = le16(b, ii + 22)
          if (channels < 1 || rate < 1 || rate > Int.MaxValue || bits < 1)
            return None
          fmt = Some((format, channels, rate.toInt, bits))
        } else if (id == "data") { dataOff = i + 8; dataLen = size }
        // cursor advances in LONG arithmetic (a hostile u32 size in
        // [2^31, 2^32) would wrap an Int cursor and spin the walk
        // forever); a chunk extending past the payload is the
        // truncated-tail case — nothing beyond it is walkable, so stop
        // and return whatever was found (audioStats turns a truncated
        // data chunk into a decoded=false row)
        val next = i + 8 + size + (size & 1L)
        if (next > b.length) walking = false else i = next
      }
      for ((format, ch, rate, bits) <- fmt; if dataOff >= 0)
        yield (format, ch, rate, bits, dataOff, dataLen)
    }
  }

  /** ISO-BMFF (MP4/MOV/M4V) header parse — pure JVM, no codec libs.
    * Boxes are [size:u32be][type:4cc][payload]; size 1 means a u64
    * largesize follows, size 0 means "to end of file". The walk
    * demands `ftyp` as the FIRST box (the container signature), then
    * descends `moov` → `mvhd` (movie timescale + duration) and
    * `moov` → `trak` → `tkhd` (16.16 fixed-point presentation width/
    * height; audio tracks carry 0×0, so the first SIZED track is the
    * video track). Returns (width, height, durationSeconds) or None
    * for anything malformed — truncated boxes, a duration without a
    * sized track (audio-only MP4), or non-BMFF bytes — so the caller
    * falls back to the stub exactly like the image/audio paths. */
  object VideoHeaders {

    private def u8(b: Array[Byte], i: Int): Long = (b(i) & 0xff).toLong
    private def be32(b: Array[Byte], i: Int): Long =
      (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
    private def be64(b: Array[Byte], i: Int): Long =
      (be32(b, i) << 32) | be32(b, i + 4)
    private def tag(b: Array[Byte], i: Int): String =
      new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

    def parseMp4(b: Array[Byte]): Option[(Int, Int, Int)] = {
      if (b.length < 12 || be32(b, 0) < 8 || tag(b, 4) != "ftyp") return None
      var durationSec = -1L
      var width = -1
      var height = -1
      // walk the children of [start, end); descend only the container
      // boxes on the moov → trak path
      def walk(start: Long, end: Long, depth: Int): Boolean = {
        var i = start
        while (i + 8 <= end) {
          val size0 = be32(b, i.toInt)
          val (payload, boxEnd) =
            if (size0 == 0L) (i + 8, end) // last box: runs to the end
            else if (size0 == 1L) {
              if (i + 16 > end) return false
              (i + 16, i + be64(b, i.toInt + 8))
            } else (i + 8, i + size0)
          if (boxEnd > end || boxEnd <= i || payload > boxEnd) return false
          val id = tag(b, i.toInt + 4)
          id match {
            case "moov" | "trak" if depth < 2 =>
              if (!walk(payload, boxEnd, depth + 1)) return false
            case "mvhd" if payload + 4 <= boxEnd =>
              val p = payload.toInt
              val v = b(p) & 0xff
              if (v == 0 && payload + 20 <= boxEnd) {
                val ts = be32(b, p + 12)
                if (ts > 0) durationSec = be32(b, p + 16) / ts
              } else if (v == 1 && payload + 32 <= boxEnd) {
                val ts = be32(b, p + 20)
                if (ts > 0) durationSec = be64(b, p + 24) / ts
              }
            case "tkhd" if width < 0 =>
              val p = payload.toInt
              val v = b(p) & 0xff
              val off = if (v == 1) 88 else 76 // v1: 64-bit times+duration
              if (payload + off + 8 <= boxEnd) {
                val w = (be32(b, p + off) >> 16).toInt     // 16.16 fixed
                val h = (be32(b, p + off + 4) >> 16).toInt
                if (w > 0 && h > 0) { width = w; height = h }
              }
            case _ => ()
          }
          i = boxEnd
        }
        true
      }
      if (!walk(0L, b.length.toLong, 0)) return None
      if (durationSec < 0 || durationSec > Int.MaxValue ||
        width <= 0 || height <= 0) None
      else Some((width, height, durationSec.toInt))
    }
  }

  /** ISO-BMFF sample-table parse: per-sample (absolute byte offset,
    * size) for the FIRST track whose `mdia`→`hdlr` handler is `vide`,
    * assembled from the public ISO/IEC 14496-12 sample-table boxes —
    * `stsz` (per-sample or uniform sizes), `stsc` (sample-to-chunk
    * runs), `stco`/`co64` (chunk offsets). This is the codec-free half
    * of video frame extraction: samples are located and sliced exactly,
    * while DECODING a sample's bitstream stays out of scope (no codec
    * libs here). Returns None for anything inconsistent — missing
    * boxes, a sample count the chunk map can't place, or a sample
    * extending past the payload — so the caller falls back to the stub
    * path exactly like the header parsers do. */
  object Mp4Samples {

    private def u8(b: Array[Byte], i: Long): Long = (b(i.toInt) & 0xff).toLong
    private def be32(b: Array[Byte], i: Long): Long =
      (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
    private def be64(b: Array[Byte], i: Long): Long =
      (be32(b, i) << 32) | be32(b, i + 4)
    private def tag(b: Array[Byte], i: Long): String =
      new String(b, i.toInt, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** Direct children (type, payloadStart, boxEnd) of [start, end);
      * Nil on any malformed size so callers treat it as no-match.
      * `keepPrefix` (the lenient TOP-LEVEL walk only) instead returns
      * the boxes parsed BEFORE the malformed/overrunning one — the
      * truncated-download shape, where an intact moov precedes a
      * cut-short mdat; nested walks stay strict. */
    private def boxes(b: Array[Byte], start: Long, end: Long,
                      keepPrefix: Boolean = false)
        : List[(String, Long, Long)] = {
      var i = start
      val out = List.newBuilder[(String, Long, Long)]
      while (i + 8 <= end) {
        val size0 = be32(b, i)
        val (payload, boxEnd) =
          if (size0 == 0L) (i + 8, end)
          else if (size0 == 1L) {
            if (i + 16 > end)
              return if (keepPrefix) out.result() else Nil
            (i + 16, i + be64(b, i + 8))
          } else (i + 8, i + size0)
        if (boxEnd > end || boxEnd <= i || payload > boxEnd)
          return if (keepPrefix) out.result() else Nil
        out += ((tag(b, i + 4), payload, boxEnd))
        i = boxEnd
      }
      out.result()
    }

    private def child(cs: List[(String, Long, Long)], id: String) =
      cs.find(_._1 == id)

    // hostile-input allocation guard: a 32 MiB payload cannot hold a
    // million real samples anyway, and the cap bounds the size array
    private val MaxSamples = 1 << 20

    /** @param lenient keep samples whose byte range extends PAST the
      *   payload end (a truncated mdat under intact sample tables)
      *   instead of rejecting the whole parse — [[frameStats]] uses
      *   this to surface truncation as per-frame `decoded = false`
      *   rows; structurally corrupt tables (negative sizes/offsets,
      *   counts the chunk map can't place) still return None. */
    def parse(b: Array[Byte],
              lenient: Boolean = false): Option[Vector[(Long, Int)]] = {
      if (b == null || b.length < 12 || be32(b, 0) < 8 || tag(b, 4) != "ftyp")
        return None
      val top = boxes(b, 0, b.length.toLong, keepPrefix = lenient)
      val stblBounds = for {
        (_, ms2, me2) <- child(top, "moov").toList
        trak @ (_, ts, te) <- boxes(b, ms2, me2) if trak._1 == "trak"
        (_, ds, de) <- child(boxes(b, ts, te), "mdia").toList
        mcs = boxes(b, ds, de)
        (_, hs, he) <- child(mcs, "hdlr").toList
        if hs + 12 <= he && tag(b, hs + 8) == "vide"
        (_, ns, ne) <- child(mcs, "minf").toList
        (_, ss, se) <- child(boxes(b, ns, ne), "stbl").toList
      } yield (ss, se)
      stblBounds.headOption.flatMap { case (ss, se) =>
        val scs = boxes(b, ss, se)
        for {
          sizes <- child(scs, "stsz").flatMap { case (_, p, e) =>
            if (p + 12 > e) None
            else {
              val uniform = be32(b, p + 4)
              val count = be32(b, p + 8)
              if (count < 0 || count > MaxSamples) None
              else if (uniform != 0L) {
                if (uniform > Int.MaxValue) None
                else Some(Array.fill(count.toInt)(uniform.toInt))
              } else if (p + 12 + 4 * count > e) None
              // a u32 size above Int.MaxValue wraps negative here and
              // assemble() rejects it with the bounds check
              else Some(Array.tabulate(count.toInt)(k =>
                be32(b, p + 12 + 4L * k).toInt))
            }
          }
          runs <- child(scs, "stsc").flatMap { case (_, p, e) =>
            if (p + 8 > e) None
            else {
              val count = be32(b, p + 4)
              if (count < 0 || p + 8 + 12 * count > e) None
              else Some(Vector.tabulate(count.toInt) { k =>
                (be32(b, p + 8 + 12L * k), be32(b, p + 8 + 12L * k + 4))
              })
            }
          }
          offsets <- child(scs, "stco").flatMap { case (_, p, e) =>
            val count = if (p + 8 <= e) be32(b, p + 4) else -1L
            if (count < 0 || count > MaxSamples || p + 8 + 4 * count > e) None
            else Some(Vector.tabulate(count.toInt)(k => be32(b, p + 8 + 4L * k)))
          }.orElse(child(scs, "co64").flatMap { case (_, p, e) =>
            val count = if (p + 8 <= e) be32(b, p + 4) else -1L
            if (count < 0 || count > MaxSamples || p + 8 + 8 * count > e) None
            else Some(Vector.tabulate(count.toInt)(k => be64(b, p + 8 + 8L * k)))
          })
          samples <- assemble(b.length.toLong, sizes, runs, offsets, lenient)
        } yield samples
      }
    }

    /** Walk chunks in order, carving each chunk's samples from its
      * offset by the stsc run covering it; None if the table places a
      * different number of samples than stsz declares or (unless
      * `lenient`) any sample falls outside the payload. Negative
      * sizes/offsets reject in both modes — that's table corruption,
      * not truncation. */
    private def assemble(payloadLen: Long, sizes: Array[Int],
                         runs: Vector[(Long, Long)],
                         offsets: Vector[Long],
                         lenient: Boolean): Option[Vector[(Long, Int)]] = {
      if (runs.isEmpty || runs.head._1 != 1L) return None
      val out = Vector.newBuilder[(Long, Int)]
      var sample = 0
      var c = 1
      while (c <= offsets.length && sample < sizes.length) {
        val spc = runs.takeWhile(_._1 <= c).lastOption.map(_._2).getOrElse(0L)
        var off = offsets(c - 1)
        var k = 0L
        while (k < spc && sample < sizes.length) {
          val len = sizes(sample)
          if (len < 0 || off < 0 || (!lenient && off + len > payloadLen))
            return None
          out += ((off, len))
          off += len
          sample += 1
          k += 1
        }
        c += 1
      }
      if (sample != sizes.length) None else Some(out.result())
    }
  }

  /** The DEFAULT decoder: real header parsing on the pure JVM — image
    * dimensions via [[ImageHeaders]] (PNG/JPEG/GIF), audio shape via
    * [[AudioHeaders]] (WAV/RIFF: the triple reads as sampleRate ×
    * frames × channels), video shape via [[VideoHeaders]] (ISO-BMFF
    * MP4/MOV: the triple reads as width × height × durationSeconds) —
    * falling back to [[StubDecoder]]'s deterministic fake for pixel/
    * frame decode and unrecognized bytes, which keeps synthetic
    * text-byte fixtures and their oracles stable.
    *
    * Default-change note (r6): [[extractFeatures]]' default moved from
    * [[StubDecoder]] to this decoder. A payload whose bytes HAPPEN to
    * open with a real signature ("GIF87a"/"GIF89a" is the one
    * reachable from plain ASCII; "RIFF…WAVE" needs binary-shaped
    * bytes) now yields parsed header values instead of the stub
    * formula — a fixture relying on the stub for such bytes must pass
    * `decoder = StubDecoder` explicitly. */
  object HeaderDecoder extends MediaDecoder {
    def decode(mediaType: String, payload: Array[Byte]): (Int, Int, Int) =
      mediaType match {
        case "image" =>
          ImageHeaders.parse(payload)
            .getOrElse(StubDecoder.decode(mediaType, payload))
        case "audio" =>
          AudioHeaders.parseWav(payload)
            .getOrElse(StubDecoder.decode(mediaType, payload))
        case "video" =>
          VideoHeaders.parseMp4(payload)
            .getOrElse(StubDecoder.decode(mediaType, payload))
        case _ => StubDecoder.decode(mediaType, payload)
      }
  }

  /** REAL pixel decode on the pure JVM: `javax.imageio` ships in every
    * JDK and decodes PNG/GIF/BMP (and baseline JPEG) headlessly with no
    * native codec libs — so pixel statistics for the image modality are
    * genuine decodes, not stubs. Unrecognized or corrupt bytes return
    * None and the caller falls back exactly like the header parsers. */
  object PixelDecode {
    // BufferedImage works headless; pin the property so a misconfigured
    // DISPLAY can never stall an executor on X11 discovery
    try System.setProperty("java.awt.headless", "true")
    catch { case _: SecurityException => () }

    def read(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
      if (payload == null || payload.isEmpty) None
      else
        try Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload)))
        catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Pixel-statistics output contract: real decoded stats (BT.601 mean
    * luminance in [0,255]; dominant 64-bucket RGB color — 2 bits per
    * channel — with its pixel fraction) or NULLs with `decoded = false`
    * when the payload isn't a decodable image. */
  val pixelStatsSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("mean_luminance", DoubleType, nullable = true),
    StructField("dominant_bucket", IntegerType, nullable = true),
    StructField("dominant_frac", DoubleType, nullable = true),
    StructField("decoded", BooleanType, nullable = false)))

  /** REAL per-pixel feature extraction for the image modality
    * (PNG/GIF/BMP/baseline-JPEG via [[PixelDecode]]): mean luminance
    * accumulates the integer BT.601 numerator (299r+587g+114b) as a
    * LONG — exact, order-free, and an SQL oracle can replay the final
    * division bit-identically — and the dominant color is the argmax
    * of a 64-bucket histogram (bucket = r₂g₂b₂ high bits; ties break
    * to the smallest bucket index). Non-decodable payloads yield NULL
    * stats with `decoded = false` — the honest boundary: video frames
    * stay stubbed (no codecs here), image pixels are real.
    *
    * Scale shape: narrow per-partition map, no shuffle; one decoded
    * image in memory at a time per task — pair with
    * [[repartitionBySize]] so a partition's blobs fit the executor. */
  def pixelStats(media: DataFrame): DataFrame = {
    val enc = ExpressionEncoder(pixelStatsSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val typeIdx = media.schema.fieldIndex("media_type")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      rows.filter(r => r.getString(typeIdx) == "image").map { r =>
        val payload =
          if (r.isNullAt(payloadIdx)) Array.empty[Byte]
          else r.getAs[Array[Byte]](payloadIdx)
        PixelDecode.read(payload) match {
          case Some(img) =>
            val (w, h, meanLum, best, frac) = imageStatValues(img)
            Row(r.getLong(idIdx), w, h, meanLum, best, frac, true)
          case None =>
            Row(r.getLong(idIdx), null, null, null, null, null, false)
        }
      }
    }(enc)
  }

  /** One pass over a decoded image: (width, height, BT.601 mean
    * luminance, dominant 64-bucket index, dominant fraction). The
    * luminance numerator accumulates as an exact LONG so an SQL oracle
    * replays the division bit-identically; ties on the histogram break
    * to the smallest bucket index. */
  private def imageStatValues(img: java.awt.image.BufferedImage)
      : (Int, Int, Double, Int, Double) = {
    val w = img.getWidth; val h = img.getHeight
    var lum = 0L
    val hist = new Array[Long](64)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val rr = (rgb >> 16) & 0xff
        val gg = (rgb >> 8) & 0xff
        val bb = rgb & 0xff
        lum += 299L * rr + 587L * gg + 114L * bb
        hist(((rr >> 6) << 4) | ((gg >> 6) << 2) | (bb >> 6)) += 1
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    var best = 0
    var i = 1
    while (i < 64) { if (hist(i) > hist(best)) best = i; i += 1 }
    (w, h, lum.toDouble / (1000.0 * n), best, hist(best).toDouble / n)
  }

  // --------------------------------------------------------------------
  // Perceptual image hashing (pHash) — the image near-dup primitive the
  // LAION-class pipelines run: re-encoded/re-scaled/brightness-shifted
  // copies of one image share a 64-bit hash within a small Hamming
  // distance, so image dedup reuses the EXACT banded-Hamming machinery
  // the text simhash family already has.
  // --------------------------------------------------------------------

  /** Precomputed DCT-II cosine tables for the 8-of-32 pHash transform:
    * cosTab(u)(x) = cos((2x+1)·u·π/64), u < 8, x < 32. */
  private lazy val PhashCos: Array[Array[Double]] =
    Array.tabulate(8, 32)((u, x) =>
      math.cos((2 * x + 1) * u * math.Pi / 64.0))

  /** 64-bit perceptual hash of a decoded image — the pinned, documented
    * variant of the classic pHash recipe:
    *
    *   1. integer BT.601 luminance per pixel (299r + 587g + 114b — the
    *      same numerator as [[pixelStats]], unscaled);
    *   2. box-average down/up-sample onto a 32×32 grid with exact
    *      integer cell bounds `[tx·w/32, (tx+1)·w/32)` (an empty cell —
    *      only possible when w or h < 32 — takes its single sampled
    *      pixel), so resizing is deterministic arithmetic, not a
    *      platform-dependent Graphics2D filter;
    *   3. 2-D DCT-II of the grid, keeping the low-frequency 8×8 block;
    *   4. threshold the 63 AC coefficients (DC excluded — it carries
    *      absolute brightness) against their LOWER MEDIAN: bit i set
    *      iff coeff(i) > median. Bit 63 stays 0.
    *
    * Invariants that make it a NEAR-dup key (unit-pinned): uniform
    * brightness shift leaves every AC coefficient unchanged (DC absorbs
    * it) and positive contrast scaling rescales coefficients AND their
    * median together — both produce the IDENTICAL hash (absent pixel
    * clipping); small local edits flip few bits. Comparison/banding is
    * [[phashPairs]].
    *
    * Per-task memory: bounded by the DECODED IMAGE only — scratch is
    * one O(w) row buffer plus fixed 32×32 tables (no w×h luminance
    * plane), so crawl-corpus megapixel outliers cost decode, not
    * hash. */
  def phash64(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth; val h = img.getHeight
    if (w == 0 || h == 0) return 0L
    // Per-task scratch is O(w), NOT O(w·h): box sums accumulate row by
    // row from a single reused RGB row buffer (bulk getRGB), so a
    // 100-megapixel crawl outlier costs one decoded image plus one row
    // — not an extra 8-byte/pixel luminance plane on top of the
    // decode. Long sums are order-independent, so the hash is
    // bit-identical to the plane formulation (unit-pinned against a
    // naive reference). When h < 32 a source row feeds several ty
    // cells and is re-fetched per cell — only possible on tiny images.
    val rowBuf = new Array[Int](w)
    val g = new Array[Double](32 * 32)
    var ty = 0
    while (ty < 32) {
      val y0 = ty * h / 32
      val y1 = math.max(y0 + 1, (ty + 1) * h / 32)
      val cellS = new Array[Long](32)
      var yy = y0
      while (yy < y1) {
        img.getRGB(0, yy, w, 1, rowBuf, 0, w)
        var tx = 0
        while (tx < 32) {
          val x0 = tx * w / 32
          val x1 = math.max(x0 + 1, (tx + 1) * w / 32)
          var s = 0L; var xx = x0
          while (xx < x1) {
            val rgb = rowBuf(xx)
            s += 299L * ((rgb >> 16) & 0xff) +
              587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)
            xx += 1
          }
          cellS(tx) += s
          tx += 1
        }
        yy += 1
      }
      var tx = 0
      while (tx < 32) {
        val x0 = tx * w / 32
        val x1 = math.max(x0 + 1, (tx + 1) * w / 32)
        g(ty * 32 + tx) = cellS(tx).toDouble / ((y1 - y0).toLong * (x1 - x0))
        tx += 1
      }
      ty += 1
    }
    phashFromGrid(g)
  }

  /** DCT + median-threshold tail of [[phash64]], on the 32×32 box-mean
    * grid: low 8×8 of the 2-D DCT-II, then bit i set iff AC
    * coefficient i exceeds the lower median of the 63. Factored so the
    * grid-accumulation strategy can be tested bit-for-bit against a
    * naive full-plane reference sharing this exact transform. */
  private[llm] def phashFromGrid(g: Array[Double]): Long = {
    // low 8×8 of the 2-D DCT-II (separable: rows then columns; the
    // orthonormal a(u)a(v) factors are positive constants per
    // coefficient — irrelevant to a per-coefficient sign-vs-median
    // test ONLY if uniform, so they are applied for fidelity)
    val rowT = new Array[Double](8 * 32) // rowT(u)(y): DCT over x
    var u = 0
    while (u < 8) {
      var yy = 0
      while (yy < 32) {
        var s = 0.0; var xx = 0
        while (xx < 32) { s += g(yy * 32 + xx) * PhashCos(u)(xx); xx += 1 }
        rowT(u * 32 + yy) = s
        yy += 1
      }
      u += 1
    }
    val coef = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var uu = 0
      while (uu < 8) {
        var s = 0.0; var yy = 0
        while (yy < 32) { s += rowT(uu * 32 + yy) * PhashCos(v)(yy); yy += 1 }
        val au = if (uu == 0) math.sqrt(1.0 / 32) else math.sqrt(2.0 / 32)
        val av = if (v == 0) math.sqrt(1.0 / 32) else math.sqrt(2.0 / 32)
        coef(v * 8 + uu) = au * av * s
        uu += 1
      }
      v += 1
    }
    val ac = new Array[Double](63)
    System.arraycopy(coef, 1, ac, 0, 63)
    val sorted = ac.clone(); java.util.Arrays.sort(sorted)
    val med = sorted(31) // lower median of 63
    var hash = 0L
    var i = 0
    while (i < 63) {
      if (ac(i) > med) hash |= 1L << i
      i += 1
    }
    hash
  }

  /** pHash output contract: (media_id, phash, decoded) — NULL hash with
    * `decoded = false` for payloads no JDK codec reads. */
  val phashSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("phash", LongType, nullable = true),
    StructField("decoded", BooleanType, nullable = false)))

  /** Perceptual hashes for every image row — one narrow per-partition
    * map (decode + hash, one image in memory per task, no shuffle);
    * pair with [[repartitionBySize]] so a partition's blobs fit. */
  def phash(media: DataFrame): DataFrame = {
    val enc = ExpressionEncoder(phashSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val typeIdx = media.schema.fieldIndex("media_type")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      rows.filter(r => r.getString(typeIdx) == "image").map { r =>
        val payload =
          if (r.isNullAt(payloadIdx)) Array.empty[Byte]
          else r.getAs[Array[Byte]](payloadIdx)
        PixelDecode.read(payload) match {
          case Some(img) => Row(r.getLong(idIdx), phash64(img), true)
          case None => Row(r.getLong(idIdx), null, false)
        }
      }
    }(enc)
  }

  /** Image near-dup candidate pairs: decode → [[phash64]] → the text
    * family's multi-index-Hamming engine ([[Dedup.bandedHammingPairs]])
    * — any pair within `maxHamming` bits meets in at least one
    * (band, perturbed-chunk) bucket (double pigeonhole, see the
    * engine), candidates meet in ONE capped shuffle, and the verify is
    * a popcount on signatures riding the buckets. Default bands = 4 →
    * 16-bit chunk keys with radius-1 perturbation balls: 65536-value
    * buckets stay selective at LAION-class corpus sizes (the former
    * bands = 16 default meant 4-bit keys whose 16-value buckets
    * saturate past ~16·cap items — now rejected loudly by the engine).
    * Returns (id_a, id_b, hamming) with id_a < id_b; non-decodable
    * rows never pair. */
  def phashPairs(media: DataFrame, maxHamming: Int = 10, bands: Int = 4,
                 maxBucketSize: Int = 100000): DataFrame =
    Dedup.bandedHammingPairs(
      phash(media).filter(col("decoded"))
        .select(col("media_id").as("id"), col("phash").as("sig")),
      maxHamming, bands, maxBucketSize)

  // --------------------------------------------------------------------
  // Perceptual AUDIO hashing — the same pHash recipe applied to an
  // 8 (time) × 8 (frequency) spectral grid, so near-dup detection
  // covers all three modalities (text simhash/minhash, image pHash,
  // audio spectral hash) through the ONE banded-Hamming engine.
  // --------------------------------------------------------------------

  /** DCT-II cosine tables for the audio hash: cos((2x+1)·f·π/512),
    * f ≤ 8, x < 256. */
  private lazy val AudioCos: Array[Array[Double]] =
    Array.tabulate(9, 256)((f, x) =>
      math.cos((2 * x + 1) * f * math.Pi / 512.0))

  /** PCM16 sample sequence of a WAV payload — the SAME decode domain
    * as [[audioStats]]: format 1 @ 16-bit verbatim, format 3 (IEEE
    * float32) folded via s = clamp(rint(f·32768)), NaN/Inf → None
    * (corrupt data is loud), truncated or non-WAV bytes → None.
    * Channels interleave into one sequence (documented: the hash is a
    * property of the interleaved stream). */
  private[llm] def readSamples16(payload: Array[Byte]): Option[Array[Int]] =
    AudioHeaders.parsePcm(payload) match {
      case Some((1, _, _, 16, off, len))
          if len >= 2 && len % 2 == 0 && off + len <= payload.length =>
        val n = (len / 2).toInt
        Some(Array.tabulate(n) { k =>
          val i = (off + 2L * k).toInt
          ((payload(i) & 0xff) | (payload(i + 1) << 8)).toShort.toInt
        })
      case Some((3, _, _, 32, off, len))
          if len >= 4 && len % 4 == 0 && off + len <= payload.length =>
        val n = (len / 4).toInt
        val out = new Array[Int](n)
        var k = 0
        while (k < n) {
          val i = (off + 4L * k).toInt
          val w = (payload(i) & 0xff) | ((payload(i + 1) & 0xff) << 8) |
            ((payload(i + 2) & 0xff) << 16) | (payload(i + 3) << 24)
          val f = java.lang.Float.intBitsToFloat(w)
          if (java.lang.Float.isNaN(f) || java.lang.Float.isInfinite(f))
            return None
          val rd = math.rint(f * 32768.0)
          out(k) =
            if (rd >= 32767.0) 32767
            else if (rd <= -32768.0) -32768
            else rd.toInt
          k += 1
        }
        Some(out)
      case _ => None
    }

  /** 64-bit perceptual audio hash — [[phash64]]'s recipe on a spectral
    * grid, pinned:
    *
    *   1. split the sample sequence into 8 equal TIME slots (exact
    *      integer bounds `[t·n/8, (t+1)·n/8)`);
    *   2. box-average each slot onto 256 points (same exact-bounds
    *      resample as the image path);
    *   3. per slot, DCT-II coefficients at frequencies 1..8 — f = 0
    *      (the slot's DC offset) is EXCLUDED, so a constant sample
    *      offset cannot move the hash;
    *   4. threshold the 64 |coefficient| magnitudes against their
    *      lower median: bit (t·8 + f−1) set iff above.
    *
    * Invariants (unit-pinned): volume scaling multiplies every
    * magnitude AND the median together — identical hash; a DC offset
    * lands only in the excluded f = 0 terms; re-encoded identical
    * samples are bit-identical. Different temporal/spectral structure
    * lands many bits away. Comparison/banding is [[audioHashPairs]]. */
  def audioHash64(samples: Array[Int]): Long = {
    val n = samples.length
    if (n == 0) return 0L
    val mags = new Array[Double](64)
    var t = 0
    while (t < 8) {
      val s0 = t * n / 8
      val s1 = math.max(s0 + 1, (t + 1) * n / 8)
      val m = s1 - s0
      // box-average the slot onto 256 points (exact integer bounds;
      // an empty cell — only when the slot has < 256 samples — takes
      // its single sampled point)
      val g = new Array[Double](256)
      var j = 0
      while (j < 256) {
        val a = s0 + j * m / 256
        val b = math.max(a + 1, s0 + (j + 1) * m / 256)
        var s = 0L; var k = a
        while (k < b) { s += samples(k); k += 1 }
        g(j) = s.toDouble / (b - a)
        j += 1
      }
      var f = 1
      while (f <= 8) {
        var c = 0.0; var x = 0
        while (x < 256) { c += g(x) * AudioCos(f)(x); x += 1 }
        mags(t * 8 + (f - 1)) = math.abs(c)
        f += 1
      }
      t += 1
    }
    val sorted = mags.clone(); java.util.Arrays.sort(sorted)
    val med = sorted(31) // lower median of 64
    var hash = 0L
    var i = 0
    while (i < 64) {
      if (mags(i) > med) hash |= 1L << i
      i += 1
    }
    hash
  }

  /** Audio-hash output contract: (media_id, ahash, decoded). */
  val audioHashSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("ahash", LongType, nullable = true),
    StructField("decoded", BooleanType, nullable = false)))

  /** Perceptual hashes for every audio row — narrow per-partition map
    * (decode + hash, one payload in memory per task, no shuffle). */
  def audioHash(media: DataFrame): DataFrame = {
    val enc = ExpressionEncoder(audioHashSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val typeIdx = media.schema.fieldIndex("media_type")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      rows.filter(r => r.getString(typeIdx) == "audio").map { r =>
        val payload =
          if (r.isNullAt(payloadIdx)) Array.empty[Byte]
          else r.getAs[Array[Byte]](payloadIdx)
        readSamples16(payload) match {
          case Some(s) if s.nonEmpty =>
            Row(r.getLong(idIdx), audioHash64(s), true)
          case _ => Row(r.getLong(idIdx), null, false)
        }
      }
    }(enc)
  }

  /** Audio near-dup candidate pairs through the shared
    * multi-index-Hamming engine ([[Dedup.bandedHammingPairs]]):
    * (id_a, id_b, hamming) with id_a < id_b; non-decodable rows never
    * pair. Default bands = 4 for the same key-selectivity reason as
    * [[phashPairs]]. */
  def audioHashPairs(media: DataFrame, maxHamming: Int = 10,
                     bands: Int = 4,
                     maxBucketSize: Int = 100000): DataFrame =
    Dedup.bandedHammingPairs(
      audioHash(media).filter(col("decoded"))
        .select(col("media_id").as("id"), col("ahash").as("sig")),
      maxHamming, bands, maxBucketSize)

  /** Frame-statistics output contract: one row per sampled video frame
    * — real decoded stats when the extracted sample bytes are an image
    * a JDK codec reads (the MJPEG case: in motion-JPEG each sample IS
    * a complete JPEG), NULLs + `decoded = false` when the sample is a
    * compressed-codec frame (H.264 etc.) or truncated. */
  val frameStatsSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("mean_luminance", DoubleType, nullable = true),
    StructField("dominant_bucket", IntegerType, nullable = true),
    StructField("dominant_frac", DoubleType, nullable = true),
    StructField("decoded", BooleanType, nullable = false)))

  /** REAL video-frame pixel statistics for self-contained-frame codecs:
    * [[Mp4Samples]] carves each sample's exact byte range from the
    * public stsz/stsc/stco tables (no codec), then [[PixelDecode]]
    * tries a genuine `javax.imageio` decode of the sample bytes — for
    * MJPEG tracks every sample is a complete baseline JPEG, so
    * frame-level luminance/dominant-color are REAL decodes. Samples in
    * inter-frame codecs (H.264/VP9 — no JDK codec) or truncated
    * samples yield NULL stats with `decoded = false`; payloads that
    * are not a consistent ISO-BMFF video yield no rows (use
    * [[frameSample]]'s fallback slicing for those). This closes the
    * former video-decode stub down to non-self-contained codecs only.
    *
    * Scale shape: narrow per-partition flatMap — no shuffle, one
    * payload plus one decoded frame in memory per task; pair with
    * [[repartitionBySize]] so a partition's blobs fit the executor. */
  def frameStats(media: DataFrame, stride: Int = 1): DataFrame = {
    require(stride >= 1, s"stride must be >= 1: $stride")
    val enc = ExpressionEncoder(frameStatsSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val typeIdx = media.schema.fieldIndex("media_type")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      rows.filter(r => r.getString(typeIdx) == "video").flatMap { r =>
        val payload =
          if (r.isNullAt(payloadIdx)) Array.empty[Byte]
          else r.getAs[Array[Byte]](payloadIdx)
        val id = r.getLong(idIdx)
        // lenient parse: a truncated mdat under intact sample tables
        // surfaces as per-frame decoded=false rows (the scaladoc
        // contract) instead of silently yielding zero rows
        Mp4Samples.parse(payload, lenient = true).iterator.flatMap {
          samples =>
          (0 until samples.length by stride).iterator.map { f =>
            val (off, len) = samples(f)
            val decodedImg =
              if (off + len > payload.length) None
              else PixelDecode.read(java.util.Arrays.copyOfRange(
                payload, off.toInt, off.toInt + len))
            decodedImg match {
              case Some(img) =>
                val (w, h, meanLum, best, frac) = imageStatValues(img)
                Row(id, f, w, h, meanLum, best, frac, true)
              case None =>
                Row(id, f, null, null, null, null, null, false)
            }
          }
        }
      }
    }(enc)
  }

  /** Audio sample-statistics output contract: one row per audio
    * payload — real PCM16 stats when the payload is a well-formed
    * RIFF/WAVE with format 1 (integer PCM, 16 bits) or format 3 (IEEE
    * float32) and a data chunk fully inside the payload; NULLs +
    * `decoded = false` for non-WAV bytes, other formats (ADPCM,
    * 8/24-bit PCM, 16-bit-tagged float), truncated data chunks, and
    * float payloads carrying non-finite samples. */
  val audioStatsSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("n_samples", LongType, nullable = true),
    StructField("peak", IntegerType, nullable = true),
    StructField("rms", DoubleType, nullable = true),
    StructField("clipping_ratio", DoubleType, nullable = true),
    StructField("silence_frac", DoubleType, nullable = true),
    StructField("decoded", BooleanType, nullable = false)))

  /** REAL audio PCM sample statistics — the audio sibling of
    * [[pixelStats]]/[[frameStats]], closing the WAV path beyond header
    * parsing: one pass over the PCM16 data chunk computing RMS
    * loudness, peak amplitude (|−32768| = 32768), clipping ratio
    * (samples at |s| >= 32767 — both rails), and silence fraction
    * (|s| <= `silenceThreshold`, default 327 ≈ 1% full scale, ~−40
    * dBFS). The sum of squares accumulates as an exact LONG (16-bit
    * samples: <= 2^30 per sample, exact past 2^33 samples) so an SQL
    * oracle replays `sqrt(ssq / n)` bit-identically; counts are exact
    * integers, ratios one IEEE division each.
    *
    * IEEE float32 WAV (format 3, 32-bit samples — the other format
    * speech corpora actually ship) folds into the SAME 16-bit domain
    * via s = clamp(rint(f·32768)), the standard float→PCM16
    * conversion: clipping at the ±1.0 float rails is exactly the
    * |s| >= 32767 rule, and one output schema serves both formats.
    *
    * Honest failure boundary ([[AudioHeaders.parsePcm]]): non-WAV
    * bytes, other formats (ADPCM/8-bit/24-bit, a float tag with 16-bit
    * samples), truncated or misaligned data chunks, and float payloads
    * with non-finite samples (NaN/Inf — corrupt data must be loud) →
    * NULL stats with `decoded = false` — one row per audio payload
    * either way, never a vanished row.
    *
    * Scale shape: narrow per-partition map — no shuffle, one payload
    * in memory per task; pair with [[repartitionBySize]] so a
    * partition's blobs fit the executor. */
  def audioStats(media: DataFrame, silenceThreshold: Int = 327): DataFrame = {
    require(silenceThreshold >= 0,
      s"silenceThreshold must be >= 0: $silenceThreshold")
    val enc = ExpressionEncoder(audioStatsSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val typeIdx = media.schema.fieldIndex("media_type")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      rows.filter(r => r.getString(typeIdx) == "audio").map { r =>
        val payload =
          if (r.isNullAt(payloadIdx)) Array.empty[Byte]
          else r.getAs[Array[Byte]](payloadIdx)
        val id = r.getLong(idIdx)
        val failed = Row(id, null, null, null, null, null, null, null, false)
        AudioHeaders.parsePcm(payload) match {
          case Some((format, ch, rate, bits, off, len))
              if format == 1 && bits == 16 && len >= 2 && len % 2 == 0 &&
                off + len <= payload.length =>
            val n = (len / 2).toInt
            var ssq = 0L
            var peak = 0
            var clip = 0L
            var sil = 0L
            var k = 0
            while (k < n) {
              val i = (off + 2L * k).toInt
              // PCM16 little-endian signed
              val s = ((payload(i) & 0xff) | (payload(i + 1) << 8)).toShort.toInt
              val a = math.abs(s)
              ssq += s.toLong * s
              if (a > peak) peak = a
              if (a >= 32767) clip += 1
              if (a <= silenceThreshold) sil += 1
              k += 1
            }
            Row(id, rate, ch, n.toLong, peak,
              math.sqrt(ssq.toDouble / n),
              clip.toDouble / n, sil.toDouble / n, true)
          case Some((format, ch, rate, bits, off, len))
              if format == 3 && bits == 32 && len >= 4 && len % 4 == 0 &&
                off + len <= payload.length =>
            // IEEE float32 WAV (format 3 — common in speech corpora):
            // samples fold into the SAME 16-bit stats domain via
            // s = clamp(rint(f * 32768)) — the standard float→PCM16
            // conversion — so one schema serves both formats and
            // clipping at the ±1.0 float rails lands exactly on the
            // |s| >= 32767 rule. A non-finite sample (NaN/Inf) marks
            // the whole row decoded = false: corrupt data must be
            // loud, not silently folded into the statistics.
            val n = (len / 4).toInt
            var ssq = 0L
            var peak = 0
            var clip = 0L
            var sil = 0L
            var bad = false
            var k = 0
            while (k < n && !bad) {
              val i = (off + 4L * k).toInt
              val w = (payload(i) & 0xff) | ((payload(i + 1) & 0xff) << 8) |
                ((payload(i + 2) & 0xff) << 16) | (payload(i + 3) << 24)
              val f = java.lang.Float.intBitsToFloat(w)
              if (java.lang.Float.isNaN(f) || java.lang.Float.isInfinite(f))
                bad = true
              else {
                val rd = math.rint(f * 32768.0)
                val s =
                  if (rd >= 32767.0) 32767
                  else if (rd <= -32768.0) -32768
                  else rd.toInt
                val a = math.abs(s)
                ssq += s.toLong * s
                if (a > peak) peak = a
                if (a >= 32767) clip += 1
                if (a <= silenceThreshold) sil += 1
              }
              k += 1
            }
            if (bad) failed
            else Row(id, rate, ch, n.toLong, peak,
              math.sqrt(ssq.toDouble / n),
              clip.toDouble / n, sil.toDouble / n, true)
          case _ => failed
        }
      }
    }(enc)
  }

  /** Deterministic PCM16 WAV fixture: every parameter (channels, rate,
    * frame count) and every SAMPLE derives ARITHMETICALLY from the id —
    * sample k is 0 every 7th position (planted silence), +32767 at
    * k%11==3 and −32768 at k%13==5 (planted clipping on both rails,
    * silence winning ties by the CASE order), else
    * `(id·31 + k·997) % 60000 − 30000` (never clips, rarely silent —
    * and when it is, the oracle's identical formula agrees) — so an SQL
    * oracle recomputes RMS/peak/clipping/silence without parsing
    * anything. `format` other than 1 plants a non-PCM header around the
    * same body (the decoded=false path, in-gate). */
  def wavPcm16Fixture(id: Long, format: Int = 1): Array[Byte] = {
    val channels = (1 + id % 2).toInt
    val rate = (8000 + 100 * (id % 5)).toInt
    val frames = (40 + id % 16).toInt
    val n = frames * channels
    val blockAlign = channels * 2
    val dataLen = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(format.toShort).putShort(channels.toShort)
      .putInt(rate).putInt(rate * blockAlign)
      .putShort(blockAlign.toShort).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var k = 0
    while (k < n) {
      val s =
        if (k % 7 == 0) 0
        else if (k % 11 == 3) 32767
        else if (k % 13 == 5) -32768
        else ((id * 31 + k * 997) % 60000 - 30000).toInt
      bb.putShort(s.toShort)
      k += 1
    }
    bb.array()
  }

  /** Deterministic IEEE-float32 WAV fixture (format 3): same planted-
    * arithmetic contract as [[wavPcm16Fixture]]. Sample k is 0.0 every
    * 7th position (silence), +1.0 at k%11==3 and −1.0 at k%13==5 (the
    * float rails — exactly the clipping rule), else
    * `((id·31 + k·997) % 2000 − 1000) / 1024f` — an EXACT float32
    * (integer × 2^-10) whose folded 16-bit value is exactly v·32, so
    * an SQL oracle replays every statistic in integer arithmetic
    * without touching IEEE rounding. `nanAt >= 0` plants a NaN sample
    * at that index (the corrupt-data decoded=false path, in-gate). */
  def wavFloat32Fixture(id: Long, nanAt: Int = -1): Array[Byte] = {
    val channels = (1 + id % 2).toInt
    val rate = (16000 + 100 * (id % 5)).toInt
    val frames = (40 + id % 16).toInt
    val n = frames * channels
    val blockAlign = channels * 4
    val dataLen = n * 4
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(3.toShort).putShort(channels.toShort)
      .putInt(rate).putInt(rate * blockAlign)
      .putShort(blockAlign.toShort).putShort(32)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var k = 0
    while (k < n) {
      val f =
        if (k == nanAt) Float.NaN
        else if (k % 7 == 0) 0.0f
        else if (k % 11 == 3) 1.0f
        else if (k % 13 == 5) -1.0f
        else ((id * 31 + k * 997) % 2000 - 1000).toFloat / 1024.0f
      bb.putFloat(f)
      k += 1
    }
    bb.array()
  }

  /** Deterministic two-band PNG fixture: every parameter (dimensions,
    * the two band colors, the band split at h/3) derives ARITHMETICALLY
    * from the id, so an SQL oracle can recompute the expected pixel
    * statistics without decoding anything — which makes the real
    * [[pixelStats]] decode path oracle-gateable. PNG truecolor is
    * lossless, so the decode recovers the planted bytes exactly. */
  def pngFixture(id: Long): Array[Byte] = {
    val w = (8 + id % 5).toInt
    val h = (6 + id % 7).toInt
    val hA = h / 3
    def c(m: Long, a: Long): Int = ((id * m + a) % 256).toInt
    val rgbA = (c(37, 0) << 16) | (c(59, 0) << 8) | c(83, 0)
    val rgbB = (c(101, 17) << 16) | (c(131, 29) << 8) | c(151, 43)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, if (y < hA) rgbA else rgbB)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic minimal-but-REAL ISO-BMFF fixture: ftyp + moov
    * (mvhd, trak(tkhd, mdia(hdlr `vide`, minf(stbl(stts, stsc, stsz,
    * stco))))) + mdat, with every sample parameter derived
    * ARITHMETICALLY from the id — sample count 3 + id%4, sample j has
    * size 16 + (id+j)%8 and is filled with the constant byte
    * (id·7 + j·13)%256 — so an SQL oracle recomputes each extracted
    * frame's exact bytes (as hex) without parsing anything. Even ids
    * split samples across TWO chunks with a 4-byte 0xAA sentinel gap
    * between them in mdat, so a chunk-offset bug reads sentinel or
    * neighboring-fill bytes and breaks the hex replay. `uniform = true`
    * writes the stsz uniform-size form (all samples 16 + id%8) to
    * exercise that branch of the parser. */
  def mp4Fixture(id: Long, uniform: Boolean = false): Array[Byte] = {
    val n = (3 + id % 4).toInt
    val sizes =
      if (uniform) Array.fill(n)(16 + (id % 8).toInt)
      else Array.tabulate(n)(j => 16 + ((id + j) % 8).toInt)
    val fills = Array.tabulate(n)(j => ((id * 7 + j * 13) % 256).toByte)
    val twoChunks = id % 2 == 0
    def beInts(vals: Int*): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 * vals.length)
      vals.foreach(bb.putInt)
      bb.array()
    }
    def box(tp: String, payload: Array[Byte]*): Array[Byte] = {
      val len = 8 + payload.map(_.length).sum
      val bb = java.nio.ByteBuffer.allocate(len)
      bb.putInt(len)
      bb.put(tp.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      payload.foreach(bb.put)
      bb.array()
    }
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    val ftyp = box("ftyp", "isom".getBytes(ascii), beInts(0x200),
      "isom".getBytes(ascii))
    // mvhd v0: timescale 1000 at payload+12, duration 2000 at +16
    val mvhd = {
      val p = new Array[Byte](100)
      System.arraycopy(beInts(1000, 2000), 0, p, 12, 8)
      box("mvhd", p)
    }
    // tkhd v0: 16.16 fixed width at payload+76, height at +80
    val tkhd = {
      val p = new Array[Byte](84)
      System.arraycopy(beInts(64 << 16, 48 << 16), 0, p, 76, 8)
      box("tkhd", p)
    }
    val hdlr = box("hdlr", beInts(0, 0), "vide".getBytes(ascii),
      new Array[Byte](12), Array(0.toByte))
    val stts = box("stts", beInts(0, 1, n, 1))
    val stsc =
      if (twoChunks) box("stsc", beInts(0, 2, 1, 2, 1, 2, n - 2, 1))
      else box("stsc", beInts(0, 1, 1, n, 1))
    val stsz =
      if (uniform) box("stsz", beInts(0, sizes(0), n))
      else box("stsz", beInts(0, 0, n), beInts(sizes.toIndexedSeq: _*))
    def moov(chunkOffsets: Seq[Int]): Array[Byte] = {
      val stco = box("stco",
        beInts(0, chunkOffsets.length), beInts(chunkOffsets: _*))
      val stbl = box("stbl", stts, stsc, stsz, stco)
      val minf = box("minf", stbl)
      val mdia = box("mdia", hdlr, minf)
      val trak = box("trak", tkhd, mdia)
      box("moov", mvhd, trak)
    }
    // moov's size depends only on the CHUNK COUNT, so build once with
    // placeholder offsets to learn the mdat payload position, then
    // rebuild with the real offsets (same byte length by construction)
    val nOffsets = if (twoChunks) 2 else 1
    val mdatStart = ftyp.length + moov(Seq.fill(nOffsets)(0)).length + 8
    val chunk1Len = if (twoChunks) sizes.take(2).sum else sizes.sum
    val offsets =
      if (twoChunks) Seq(mdatStart, mdatStart + chunk1Len + 4)
      else Seq(mdatStart)
    val mdatBytes = {
      val bos = new java.io.ByteArrayOutputStream()
      (0 until (if (twoChunks) 2 else n)).foreach(j =>
        bos.write(Array.fill(sizes(j))(fills(j))))
      if (twoChunks) {
        bos.write(Array.fill(4)(0xAA.toByte)) // sentinel gap
        (2 until n).foreach(j => bos.write(Array.fill(sizes(j))(fills(j))))
      }
      bos.toByteArray
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(ftyp)
    out.write(moov(offsets))
    out.write(box("mdat", mdatBytes))
    out.toByteArray
  }

  /** Wrap arbitrary per-sample byte blobs in a minimal-but-REAL
    * ISO-BMFF video container (same box layout as [[mp4Fixture]], but
    * caller-supplied sample contents): ftyp + moov(mvhd, trak(tkhd,
    * mdia(hdlr `vide`, minf(stbl(stts, stsc, stsz, stco))))) + mdat.
    * `twoChunks` splits the first two samples into their own chunk
    * with a 4-byte 0xAA sentinel gap before the rest, so a
    * chunk-offset bug feeds sentinel bytes to the decoder and the
    * frame either fails to decode or breaks the planted arithmetic. */
  def mp4WithSamples(samples: Seq[Array[Byte]],
                     twoChunks: Boolean = false): Array[Byte] = {
    require(samples.nonEmpty, "mp4WithSamples needs at least one sample")
    require(!twoChunks || samples.length >= 2,
      "twoChunks layout needs at least two samples")
    val n = samples.length
    val sizes = samples.map(_.length)
    def beInts(vals: Int*): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 * vals.length)
      vals.foreach(bb.putInt)
      bb.array()
    }
    def box(tp: String, payload: Array[Byte]*): Array[Byte] = {
      val len = 8 + payload.map(_.length).sum
      val bb = java.nio.ByteBuffer.allocate(len)
      bb.putInt(len)
      bb.put(tp.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      payload.foreach(bb.put)
      bb.array()
    }
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    val ftyp = box("ftyp", "isom".getBytes(ascii), beInts(0x200),
      "isom".getBytes(ascii))
    val mvhd = {
      val p = new Array[Byte](100)
      System.arraycopy(beInts(1000, 1000 * n), 0, p, 12, 8)
      box("mvhd", p)
    }
    val tkhd = {
      val p = new Array[Byte](84)
      System.arraycopy(beInts(64 << 16, 48 << 16), 0, p, 76, 8)
      box("tkhd", p)
    }
    val hdlr = box("hdlr", beInts(0, 0), "vide".getBytes(ascii),
      new Array[Byte](12), Array(0.toByte))
    val stts = box("stts", beInts(0, 1, n, 1))
    val stsc =
      if (twoChunks) box("stsc", beInts(0, 2, 1, 2, 1, 2, n - 2, 1))
      else box("stsc", beInts(0, 1, 1, n, 1))
    val stsz = box("stsz", beInts(0, 0, n), beInts(sizes: _*))
    def moov(chunkOffsets: Seq[Int]): Array[Byte] = {
      val stco = box("stco",
        beInts(0, chunkOffsets.length), beInts(chunkOffsets: _*))
      box("moov", mvhd,
        box("trak", tkhd, box("mdia", hdlr, box("minf",
          box("stbl", stts, stsc, stsz, stco)))))
    }
    val nOffsets = if (twoChunks) 2 else 1
    val mdatStart = ftyp.length + moov(Seq.fill(nOffsets)(0)).length + 8
    val chunk1Len = if (twoChunks) sizes.take(2).sum else sizes.sum
    val offsets =
      if (twoChunks) Seq(mdatStart, mdatStart + chunk1Len + 4)
      else Seq(mdatStart)
    val mdatBytes = {
      val bos = new java.io.ByteArrayOutputStream()
      if (twoChunks) {
        samples.take(2).foreach(bos.write)
        bos.write(Array.fill(4)(0xAA.toByte)) // sentinel gap
        samples.drop(2).foreach(bos.write)
      } else samples.foreach(bos.write)
      bos.toByteArray
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(ftyp)
    out.write(moov(offsets))
    out.write(box("mdat", mdatBytes))
    out.toByteArray
  }

  /** Deterministic MJPEG-style fixture: a REAL ISO-BMFF container
    * ([[mp4WithSamples]], even ids two-chunked) whose samples are each
    * a complete encoded image — the motion-JPEG layout, where frame
    * decode needs no video codec. Every frame is a SOLID color derived
    * arithmetically from (id, frame): sample j is a
    * (4+id%3)×(3+id%2) image of RGB ((id·37+j·53)%256,
    * (id·59+j·71)%256, (id·83+j·97)%256) over n = 2+id%3 frames, so
    * an SQL oracle recomputes each frame's exact pixel statistics
    * from id arithmetic alone. The default `format = "png"` keeps the
    * planted bytes lossless for that exact replay (the decode seam is
    * codec-agnostic `javax.imageio` either way); `format = "jpg"`
    * plants true JPEG samples — genuine MJPEG — whose decode is
    * exercised with a tolerance in the unit suite since JPEG DC
    * quantization may shift a solid color by a count or two. */
  def mjpegFixture(id: Long, format: String = "png"): Array[Byte] = {
    val n = (2 + id % 3).toInt
    val w = (4 + id % 3).toInt
    val h = (3 + id % 2).toInt
    val samples = (0 until n).map { j =>
      val rr = ((id * 37 + j * 53) % 256).toInt
      val gg = ((id * 59 + j * 71) % 256).toInt
      val bb = ((id * 83 + j * 97) % 256).toInt
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.setRGB(x, y, (rr << 16) | (gg << 8) | bb)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, format, bos)
      bos.toByteArray
    }
    mp4WithSamples(samples, twoChunks = id % 2 == 0)
  }

  private def fnv(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h = (h ^ (bytes(i) & 0xff)) * 0x100000001b3L; i += 1 }
    h
  }

  /** Batched per-partition feature extraction (the mapInPandas analog):
    * each task iterates its partition once, feeding the decoder. The
    * default decoder is [[HeaderDecoder]] (real PNG/JPEG/GIF/WAV header
    * parse, stub fallback) — see its default-change note; pass
    * [[StubDecoder]] to force the legacy stub formula everywhere. */
  def extractFeatures(media: DataFrame,
                      decoder: MediaDecoder = HeaderDecoder): DataFrame = {
    val enc = ExpressionEncoder(featureSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val typeIdx = media.schema.fieldIndex("media_type")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      rows.map { r =>
        val payload =
          if (r.isNullAt(payloadIdx)) Array.empty[Byte]
          else r.getAs[Array[Byte]](payloadIdx)
        val mt = r.getString(typeIdx)
        val (w, h, c) = decoder.decode(mt, payload)
        Row(r.getLong(idIdx), mt, payload.length.toLong,
          w, h, c, fnv(payload))
      }
    }(enc)
  }

  /** Resized-media output contract. */
  val resizedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** Resize stage: per-partition batched transform of image payloads to
    * a target box. Decodable images (PNG/GIF/BMP/baseline-JPEG via
    * [[PixelDecode]]) get a REAL bilinear resample re-encoded as
    * truecolor PNG; bytes no JDK codec reads fall back to the legacy
    * deterministic byte-fold so synthetic fixtures stay stable. The
    * Spark side — schema contract, mapPartitions batch shape, narrow
    * no-shuffle execution — is the deployment plumbing either way. */
  def resize(media: DataFrame, targetW: Int, targetH: Int,
             decoder: MediaDecoder = StubDecoder): DataFrame = {
    val enc = ExpressionEncoder(resizedSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val typeIdx = media.schema.fieldIndex("media_type")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      rows.filter(r => r.getString(typeIdx) == "image").map { r =>
        val payload =
          if (r.isNullAt(payloadIdx)) Array.empty[Byte]
          else r.getAs[Array[Byte]](payloadIdx)
        val out = PixelDecode.read(payload) match {
          case Some(img) =>
            val dst = new java.awt.image.BufferedImage(
              targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = dst.createGraphics()
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, targetW, targetH, null)
            g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(dst, "png", bos)
            bos.toByteArray
          case None =>
            // legacy deterministic fold for non-decodable bytes
            val outLen = math.max(targetW * targetH / 64, 1)
            val buf = new Array[Byte](outLen)
            var i = 0
            while (i < payload.length) {
              buf(i % outLen) = (buf(i % outLen) ^ payload(i)).toByte
              i += 1
            }
            buf
        }
        Row(r.getLong(idIdx), targetW, targetH, out)
      }
    }(enc)
  }

  /** Sampled-frames output contract. */
  val frameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame", BinaryType, nullable = false)))

  /** Frame sampling: each video payload fans out to every `stride`-th
    * frame as its own row (the shape a caption/embedding stage
    * consumes). ISO-BMFF payloads get REAL samples: [[Mp4Samples]]
    * locates each sample's exact byte range from the public stsz/stsc/
    * stco tables and the frame row carries those bytes verbatim
    * (frame_idx = sample index) — codec-free extraction, with sample
    * DECODE staying out of scope. Anything that isn't a consistent MP4
    * falls back to the legacy fixed-size payload slices, keeping
    * synthetic text-byte fixtures stable. Narrow per-partition flatMap
    * either way — no shuffle, one payload in memory per task. */
  def frameSample(media: DataFrame, frameBytes: Int = 256,
                  stride: Int = 2): DataFrame = {
    val enc = ExpressionEncoder(frameSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val typeIdx = media.schema.fieldIndex("media_type")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      rows.filter(r => r.getString(typeIdx) == "video").flatMap { r =>
        val payload =
          if (r.isNullAt(payloadIdx)) Array.empty[Byte]
          else r.getAs[Array[Byte]](payloadIdx)
        Mp4Samples.parse(payload) match {
          case Some(samples) =>
            (0 until samples.length by stride).iterator.map { f =>
              val (off, len) = samples(f)
              Row(r.getLong(idIdx), f, java.util.Arrays.copyOfRange(
                payload, off.toInt, off.toInt + len))
            }
          case None =>
            val nFrames = math.max(payload.length / frameBytes, 1)
            (0 until nFrames by stride).iterator.map { f =>
              val from = math.min(f * frameBytes, payload.length)
              val until = math.min(from + frameBytes, payload.length)
              Row(r.getLong(idIdx), f,
                java.util.Arrays.copyOfRange(payload, from, until))
            }
        }
      }
    }(enc)
  }

  /** Size-classed repartition so one task's blobs fit in memory:
    * outlier blobs (>= target bytes) each get their OWN partition — a
    * 2 GB video never shares a task with the bulk — while small blobs
    * hash into `ceil(smallBytes / target)` buckets, so the expected
    * bucket payload is one target's worth. Exact global bin packing
    * needs a total-order running sum (a scalability bottleneck); this
    * is the scalable version: outlier isolation is exact (zipWithIndex
    * + identity partitioner, no driver materialization), the bulk is
    * hash-approximate. Driver-side work is one 2-column aggregate row. */
  def repartitionBySize(media: DataFrame,
                        targetPartitionBytes: Long = 128L << 20): DataFrame = {
    val bytes = coalesce(length(col("payload")).cast("long"), lit(0L))
    val isBig = bytes >= targetPartitionBytes
    val stats = media.agg(
      sum(when(isBig, 0L).otherwise(bytes)).as("small_bytes"),
      sum(when(isBig, 1L).otherwise(0L)).as("n_big")).head
    val smallBytes = Option(stats.get(0)).map(_.asInstanceOf[Long]).getOrElse(0L)
    val nBig = Option(stats.get(1)).map(_.asInstanceOf[Long]).getOrElse(0L).toInt
    val smallParts = math.max(1L,
      (smallBytes + targetPartitionBytes - 1) / targetPartitionBytes).toInt

    val small = media.filter(!isBig)
      .repartition(smallParts, pmod(hash(col("media_id")), lit(smallParts)))
    if (nBig == 0) small
    else {
      val spark = media.sparkSession
      val bigRdd = media.filter(isBig).rdd.zipWithIndex()
        .map { case (r, i) => (i, r) }
        .partitionBy(new org.apache.spark.Partitioner {
          override def numPartitions: Int = nBig
          // modulo guard: the stats aggregate and this pass re-evaluate
          // the upstream plan (checkpointing a 100 TB corpus to pin one
          // count would cost more than the rescan), so a
          // non-deterministic source could surface MORE big rows here
          // than nBig — wrap rather than crash the job with an
          // out-of-range partition index
          override def getPartition(key: Any): Int =
            (key.asInstanceOf[Long] % numPartitions).toInt
        })
        .values
      // union concatenates children partitions: smallParts + nBig tasks
      small.union(spark.createDataFrame(bigRdd, media.schema))
    }
  }

  /** Build a media table from the documents fixture: payload = utf-8
    * bytes of the text (a deterministic fake blob, letting the whole
    * pipeline run without codec libs). */
  def mediaFromDocuments(spark: SparkSession, documentsDir: String): DataFrame = {
    spark.read.parquet(documentsDir)
      .select(
        col("doc_id").as("media_id"),
        when(pmod(col("doc_id"), lit(3)) === 0, "image")
          .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
          .otherwise("video").as("media_type"),
        encode(col("text"), "UTF-8").as("payload"),
        to_json(struct(col("lang"), col("source"))).as("meta"))
  }
}
