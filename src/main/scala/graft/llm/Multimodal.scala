package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, plus a feature-extraction stage
  * (north-star surface from BASELINE.json).
  *
  * The actual media decode is STUBBED — this container has no image/
  * audio codecs — behind [[MediaDecoder]]. Everything Spark-side is
  * real and tested: the schema contract, the per-partition batched
  * execution (`mapPartitions`, the Scala analog of `mapInPandas` batch
  * shape), the partition sizing guidance, and the output plumbing.
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

  private def fnv(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h = (h ^ (bytes(i) & 0xff)) * 0x100000001b3L; i += 1 }
    h
  }

  /** Batched per-partition feature extraction (the mapInPandas analog):
    * each task iterates its partition once, feeding the decoder. */
  def extractFeatures(media: DataFrame,
                      decoder: MediaDecoder = StubDecoder): DataFrame = {
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
    * a target box. The pixel work is stubbed (no codecs here) with a
    * deterministic byte-fold so tests are stable; the Spark side —
    * schema contract, mapPartitions batch shape, narrow no-shuffle
    * execution — is the real deployment plumbing. */
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
        // STUB "resample": deterministic fold of the source bytes into a
        // targetW×targetH/64 buffer — a real codec plugs in here
        val outLen = math.max(targetW * targetH / 64, 1)
        val out = new Array[Byte](outLen)
        var i = 0
        while (i < payload.length) {
          out(i % outLen) = (out(i % outLen) ^ payload(i)).toByte
          i += 1
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
    * consumes). Frames are stubbed as fixed-size payload slices — the
    * contract (one row per sampled frame, order-stable frame_idx,
    * per-partition batching) is the real part. */
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
        val nFrames = math.max(payload.length / frameBytes, 1)
        (0 until nFrames by stride).iterator.map { f =>
          val from = math.min(f * frameBytes, payload.length)
          val until = math.min(from + frameBytes, payload.length)
          Row(r.getLong(idIdx), f, java.util.Arrays.copyOfRange(payload, from, until))
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
