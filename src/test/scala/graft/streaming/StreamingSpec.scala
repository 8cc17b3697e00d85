package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Batch/stream parity: the SAME transformation body (hourlyAgg) run as
  * a Structured Streaming query (file source, watermark, append mode,
  * AvailableNow) must produce the batch answer for every window the
  * watermark has closed. */
class StreamingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("hourlyAggStream equals hourlyAggBatch for watermark-closed windows") {
    val q = EventsStreaming.hourlyAggStream(spark, dir, "ev_parity_test")
    q.awaitTermination(120000L)
    val streamed = spark.table("ev_parity_test")

    val batch = EventsStreaming.hourlyAggBatch(spark, dir)
    val maxTs = EventsStreaming.readEvents(spark, dir)
      .agg(max(col("ts"))).head.getTimestamp(0)

    // append mode emits a window only once the watermark (max ts - 10m)
    // passes its end; windows strictly below the cutoff MUST be present
    val cutoff = new java.sql.Timestamp(maxTs.getTime - 10 * 60 * 1000)
    val mustHave = batch.filter(
      col("hour_start") + expr("INTERVAL 1 HOUR") < lit(cutoff))

    assert(streamed.count() > 0, "stream emitted nothing")
    // stream ⊆ batch (no invented rows, exact values)
    assert(streamed.exceptAll(batch).isEmpty,
      "stream produced rows absent from batch")
    // batch-closed windows ⊆ stream (nothing withheld that should emit)
    assert(mustHave.exceptAll(streamed).isEmpty,
      "watermark-closed windows missing from stream output")
  }

  test("hourlyDistinctUsersStream: KMV sketch state survives the state store") {
    val q = EventsStreaming.hourlyDistinctUsersStream(
      spark, dir, "ev_distinct_test")
    q.awaitTermination(120000L)
    val streamed = spark.table("ev_distinct_test")
    val batch = EventsStreaming.hourlyDistinctUsers(
      EventsStreaming.readEvents(spark, dir))
    val maxTs = EventsStreaming.readEvents(spark, dir)
      .agg(max(col("ts"))).head.getTimestamp(0)
    val cutoff = new java.sql.Timestamp(maxTs.getTime - 10 * 60 * 1000)
    val mustHave = batch.filter(
      col("hour_start") + expr("INTERVAL 1 HOUR") < lit(cutoff))
    assert(streamed.count() > 0, "stream emitted nothing")
    // the sketch is deterministic, so closed windows match EXACTLY —
    // estimates included — proving the TypedImperativeAggregate buffer
    // round-trips through streaming state serialization
    assert(streamed.exceptAll(batch).isEmpty,
      "stream produced rows absent from batch")
    assert(mustHave.exceptAll(streamed).isEmpty,
      "watermark-closed windows missing from stream output")
  }

  test("enrichedHourlyStream (stream-static join) equals its batch body") {
    val dim = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey").as("user_id"),
        col("c_mktsegment").as("segment"))
    val q = EventsStreaming.enrichedHourlyStream(spark, dir, dim,
      "enriched_parity_test")
    q.awaitTermination(120000L)
    val streamed = spark.table("enriched_parity_test")

    val batch = EventsStreaming.enrichedHourly(
      EventsStreaming.readEvents(spark, dir), dim)
    val maxTs = EventsStreaming.readEvents(spark, dir)
      .agg(max(col("ts"))).head.getTimestamp(0)
    val cutoff = new java.sql.Timestamp(maxTs.getTime - 10 * 60 * 1000)
    val mustHave = batch.filter(
      col("hour_start") + expr("INTERVAL 1 HOUR") < lit(cutoff))

    assert(streamed.count() > 0, "stream emitted nothing")
    assert(streamed.exceptAll(batch).isEmpty,
      "stream produced rows absent from batch")
    assert(mustHave.exceptAll(streamed).isEmpty,
      "watermark-closed windows missing from stream output")
    // the stream-static join must not invent state: every segment is
    // either a real dimension value or the explicit 'unknown'
    val segs = streamed.select("segment").distinct()
      .as[String](org.apache.spark.sql.Encoders.STRING).collect().toSet
    val dimSegs = dim.select("segment").distinct()
      .as[String](org.apache.spark.sql.Encoders.STRING).collect().toSet
    assert(segs.subsetOf(dimSegs + "unknown"))
  }

  test("slidingAggStream equals batch slidingAgg for watermark-closed windows") {
    val q = EventsStreaming.slidingAggStream(spark, dir, "sliding_parity_test")
    q.awaitTermination(120000L)
    val streamed = spark.table("sliding_parity_test")
    val batch = EventsStreaming.slidingAgg(EventsStreaming.readEvents(spark, dir))
    val maxTs = EventsStreaming.readEvents(spark, dir)
      .agg(max(col("ts"))).head.getTimestamp(0)
    val cutoff = new java.sql.Timestamp(maxTs.getTime - 10 * 60 * 1000)
    val mustHave = batch.filter(
      col("window_start") + expr("INTERVAL 1 HOUR") < lit(cutoff))
    assert(streamed.count() > 0, "stream emitted nothing")
    assert(streamed.exceptAll(batch).isEmpty,
      "stream produced windows absent from batch")
    assert(mustHave.exceptAll(streamed).isEmpty,
      "watermark-closed sliding windows missing from stream output")
    // every event lands in size/slide = 4 hopping windows
    val events = EventsStreaming.readEvents(spark, dir).count()
    val total = batch.agg(sum(col("n_events"))).head.getLong(0)
    assert(total == 4 * events, s"expected 4x replication, got $total/$events")
  }

  test("sessionsStream equals batch sessions for watermark-closed sessions") {
    val q = EventsStreaming.sessionsStream(spark, dir, "sess_parity_test")
    q.awaitTermination(120000L)
    val streamed = spark.table("sess_parity_test")
    val batch = EventsStreaming.sessions(EventsStreaming.readEvents(spark, dir))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty,
      "stream produced sessions absent from batch")
    val maxTs = EventsStreaming.readEvents(spark, dir)
      .agg(max(col("ts"))).head.getTimestamp(0)
    // sessions closing before watermark − gap margin must all be emitted
    val cutoff = new java.sql.Timestamp(maxTs.getTime - 45 * 60 * 1000)
    val mustHave = batch.filter(col("last_ts") < lit(cutoff))
    assert(mustHave.exceptAll(streamed).isEmpty,
      "watermark-closed sessions missing from stream output")
  }

  test("flatMapGroupsWithState threshold crossings equal the batch window shape") {
    val q = EventsStreaming.thresholdCrossingsStream(spark, dir, 500.0,
      "crossings_parity_test")
    q.awaitTermination(120000L)
    val streamed = spark.table("crossings_parity_test")
    val batch = EventsStreaming.thresholdCrossings(
      EventsStreaming.readEvents(spark, dir), 500.0)
    assert(streamed.count() > 0, "no crossings emitted")
    // custom state has no watermark: with AvailableNow over a finite
    // fixture the outputs must match exactly
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("attributionStream (stream-stream self join) equals the batch body") {
    val q = EventsStreaming.attributionStream(spark, dir,
      queryName = "attr_parity_test")
    q.awaitTermination(120000L)
    val streamed = spark.table("attr_parity_test")
    val batch = EventsStreaming.attributionBatch(spark, dir)
    assert(streamed.count() > 0, "no attribution pairs emitted")
    // inner stream-stream join emits eagerly (no watermark hold-back);
    // the finite fixture arrives in one AvailableNow pass → exact parity
    assert(streamed.exceptAll(batch).isEmpty,
      "stream invented pairs absent from batch")
    assert(batch.exceptAll(streamed).isEmpty,
      "stream missed pairs present in batch")
  }

  test("dedupStream drops replayed deliveries; parity with firstOccurrence") {
    val scratch = tmpDir("stream_dedup")
    val raw = EventsStreaming.readEvents(spark, dir).limit(500)
    // originals + 200 EXACT replays (full-row copies) land as separate
    // files in one stream directory
    raw.write.mode("overwrite").parquet(s"$scratch/in")
    raw.limit(200).write.mode("append").parquet(s"$scratch/in")

    val content = Seq("user_id", "event_type", "value", "props")
    val q = EventsStreaming.dedupStream(spark, s"$scratch/in", content,
      "sdedup_parity_test")
    q.awaitTermination(120000L)
    val streamed = spark.table("sdedup_parity_test")

    val batchIn = spark.read.schema(EventsStreaming.eventsSchemaTs)
      .parquet(s"$scratch/in")
    val batch = graft.llm.Dedup.firstOccurrence(batchIn,
      content, Seq("ts", "event_id"))

    // one surviving row per distinct content, same contents as batch
    assert(streamed.count() == batch.count())
    assert(streamed.count() < 700, "replays must have been dropped")
    assert(streamed.select(content.map(col): _*)
      .except(batch.select(content.map(col): _*)).isEmpty)
    assert(batch.select(content.map(col): _*)
      .except(streamed.select(content.map(col): _*)).isEmpty)
  }

  test("stateless curation ops run unchanged on a stream (AvailableNow parity)") {
    // HTML strip, repetition stats, and URL hygiene are pure
    // projections, so the SAME operator bodies must work as a streaming
    // pipeline with no watermark and no state — the continuous-ingest
    // curation story (URL analysis runs BEFORE the strip, which removes
    // the markup hrefs it needs)
    def curate(df: org.apache.spark.sql.DataFrame) = {
      val urled = graft.llm.Urls.analyze(
        df.select(col("doc_id"), col("text")), "text",
        Seq("spam.example.com"))
      graft.llm.Repetition.stats(
          graft.llm.TextAnalysis.stripHtml(urled, "text"), "text")
        .select(col("doc_id"), col("n_words"), col("dup_word_frac"),
          col("n_urls"), col("is_blocked"))
    }
    // FileStreamSource needs a DIRECTORY; the fixture is a single file
    val streamDir = tmpDir("curation_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/documents.parquet"),
      java.nio.file.Paths.get(s"$streamDir/part-0.parquet"))
    val batchIn = spark.read.parquet(streamDir)
    val q = curate(spark.readStream.schema(batchIn.schema).parquet(streamDir))
      .writeStream.format("memory").queryName("curation_parity")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000L)
    val streamed = spark.table("curation_parity")
    val batch = curate(batchIn)
    assert(streamed.count() == batch.count() && streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "stateless curation ops must be batch/stream identical")
  }

  test("chat-transcript ops stream (stats verdicts + loss-mask spans " +
      "are per-row: AvailableNow parity with batch)") {
    import spark.implicits._
    val streamDir = tmpDir("chat_stream")
    Seq(
        (1L, """[{"role":"user","content":"hi"},{"role":"assistant","content":"hello"}]"""),
        (2L, """[{"role":"user","content":"a"},{"role":"user","content":"b"}]"""),
        (3L, "garbage"))
      .toDF("id", "j").write.mode("overwrite").parquet(streamDir)
    def ops(df: org.apache.spark.sql.DataFrame) =
      graft.llm.Chat.assistantSpans(
        graft.llm.Chat.flatten(graft.llm.Chat.stats(df, "j"), "j"), "j")
    val batchIn = spark.read.parquet(streamDir)
    val q = ops(spark.readStream.schema(batchIn.schema).parquet(streamDir))
      .writeStream.format("memory").queryName("chat_parity")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000L)
    val streamed = spark.table("chat_parity")
    val batch = ops(batchIn)
    assert(streamed.count() == 3)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "chat ops must be batch/stream identical")
  }

  test("pipelineStream: stateless stages + watermarked dedup match batch curation") {
    import spark.implicits._
    import graft.llm.Curation
    val scratch = tmpDir("stream_curation")
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def at(s: Long) = new java.sql.Timestamp(ts0.getTime + s * 1000)
    // originals first, exact-content replays later (higher ids, later
    // ts) — batch keep-min-id and stream first-occurrence then agree
    val originals = (1L to 300L).map(i =>
      (i, s"<p>streaming document number $i with body words</p>", at(i)))
    val replays = (1L to 100L).map(i =>
      (i + 10000L, s"<p>streaming document number $i with body words</p>", at(400 + i)))
    (originals ++ replays).toDF("doc_id", "text", "ts")
      .coalesce(1).write.mode("overwrite").parquet(scratch)

    val cfg = Curation.PipelineConfig(stripHtml = true, sampleFraction = 0.5,
      maxDupWordFrac = 0.9, maxDupNgramFrac = 0.9, maxTopNgramFrac = 0.9)
    val in = spark.readStream
      .schema(spark.read.parquet(scratch).schema).parquet(scratch)
    val q = Curation.pipelineStream(in, "doc_id", "text", "ts",
        dedupHorizon = "10 minutes", cfg = cfg)
      .writeStream.format("memory").queryName("curation_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000L)
    val streamed = spark.table("curation_stream")
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val batch = Curation.pipeline(
        spark.read.parquet(scratch).select($"doc_id", $"text"),
        "doc_id", "text", cfg)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(streamed.nonEmpty && streamed == batch,
      s"stream kept ${streamed.size}, batch kept ${batch.size}")
    // markup really was stripped in-flight
    assert(streamed.values.forall(t => !t.contains("<p>")))

    // incremental reference snapshot streams as a stream-static
    // anti-join: previously-shipped content vanishes from the stream,
    // and the result still matches the batch pipeline with the same
    // snapshot
    val refSnap = spark.read.parquet(scratch)
      .filter($"doc_id" <= 50L && $"doc_id" >= 1L).select($"text")
    val cfgRef = cfg.copy(referenceSnapshot = Some(
      graft.llm.TextAnalysis.stripHtml(refSnap.toDF(), "text")))
    val qr = Curation.pipelineStream(in, "doc_id", "text", "ts",
        dedupHorizon = "10 minutes", cfg = cfgRef)
      .writeStream.format("memory").queryName("curation_stream_ref")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    qr.awaitTermination(120000L)
    val streamedRef = spark.table("curation_stream_ref")
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val batchRef = Curation.pipeline(
        spark.read.parquet(scratch).select($"doc_id", $"text"),
        "doc_id", "text", cfgRef)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(streamedRef.nonEmpty && streamedRef == batchRef)
    // docs 1-50 and their replays carried referenced content (reference
    // stage); replays of 51-100 lost to their originals (dedup stage)
    assert(streamedRef.forall(id => id > 50L && id <= 300L))
    // a streaming snapshot is rejected up front
    intercept[IllegalArgumentException](
      Curation.pipelineStream(in, "doc_id", "text", "ts",
        cfg = cfg.copy(referenceSnapshot = Some(in))))

    // the bloom prefilter is survivor-invariant in STREAM mode too
    // (plan-literal bit test before the anti-join; FPs re-check, FNs
    // don't exist) — same output as the un-prefiltered stream AND the
    // bloom-enabled batch pipeline
    val cfgRefBloom = cfgRef.copy(referenceBloom = Some(64L))
    val qb = Curation.pipelineStream(in, "doc_id", "text", "ts",
        dedupHorizon = "10 minutes", cfg = cfgRefBloom)
      .writeStream.format("memory").queryName("curation_stream_ref_bloom")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    qb.awaitTermination(120000L)
    val streamedBloom = spark.table("curation_stream_ref_bloom")
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(streamedBloom == streamedRef, "bloom prefilter changed survivors")
    val batchBloom = Curation.pipeline(
        spark.read.parquet(scratch).select($"doc_id", $"text"),
        "doc_id", "text", cfgRefBloom)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(batchBloom == batchRef, "batch bloom prefilter changed survivors")
    // misuse is loud: bloom without a snapshot, bloom with near-dup
    intercept[graft.core.GraftError.Configuration](
      Curation.pipelineStream(in, "doc_id", "text", "ts",
        cfg = cfg.copy(referenceBloom = Some(10L))))
    intercept[graft.core.GraftError.Configuration](
      Curation.pipeline(spark.read.parquet(scratch), "doc_id", "text",
        cfgRefBloom.copy(referenceNearDup = Some(0.8))))

    // decontaminate-excise STREAMS (per-row projection over a static
    // probe index): stream output matches the batch pipeline rows,
    // contaminated_chars included
    val exProbe = Seq("streaming document number 7 with body words")
      .toDF("text")
    // sampleFraction 1.0: the excised doc must not be hash-sampled away
    val cfgEx = cfg.copy(decontaminateExciseProbes = Some(exProbe),
      decontaminateExciseWindow = 4, sampleFraction = 1.0)
    val qx = Curation.pipelineStream(in, "doc_id", "text", "ts",
        dedupHorizon = "10 minutes", cfg = cfgEx)
      .writeStream.format("memory").queryName("curation_stream_ex")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    qx.awaitTermination(120000L)
    val streamedEx = spark.table("curation_stream_ex")
      .select($"doc_id", $"text", $"contaminated_chars")
      .as[(Long, String, Long)].collect().toSet
    val batchEx = Curation.pipeline(
        spark.read.parquet(scratch).select($"doc_id", $"text"),
        "doc_id", "text", cfgEx)
      .select($"doc_id", $"text", $"contaminated_chars")
      .as[(Long, String, Long)].collect().toSet
    assert(streamedEx.nonEmpty && streamedEx == batchEx,
      s"stream ${streamedEx.size} vs batch ${batchEx.size}")
    // the probe doc itself was excised to a husk somewhere in the output
    assert(streamedEx.exists(_._3 > 0L), "no contamination recorded")

    // decontaminate-FUZZY streams for the same structural reason (two
    // bounded collected indexes, per-row projection): stream == batch,
    // near_contaminated_chars included
    val fzProbe = Seq("streaming document number 7 with body words and a " +
      "long enough tail for the winnow seed window").toDF("text")
    val cfgFz = cfg.copy(decontaminateFuzzyProbes = Some(fzProbe),
      decontaminateFuzzyK = 8, decontaminateFuzzyW = 4,
      sampleFraction = 1.0)
    val qf = Curation.pipelineStream(in, "doc_id", "text", "ts",
        dedupHorizon = "10 minutes", cfg = cfgFz)
      .writeStream.format("memory").queryName("curation_stream_fz")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    qf.awaitTermination(120000L)
    val streamedFz = spark.table("curation_stream_fz")
      .select($"doc_id", $"text", $"near_contaminated_chars")
      .as[(Long, String, Long)].collect().toSet
    val batchFz = Curation.pipeline(
        spark.read.parquet(scratch).select($"doc_id", $"text"),
        "doc_id", "text", cfgFz)
      .select($"doc_id", $"text", $"near_contaminated_chars")
      .as[(Long, String, Long)].collect().toSet
    assert(streamedFz.nonEmpty && streamedFz == batchFz,
      s"fuzzy stream ${streamedFz.size} vs batch ${batchFz.size}")

    // reference NEAR-dup streams too (per-row broadcast-index probe):
    // stream output equals the batch pipeline's under the same config
    val cfgNear = cfgRef.copy(referenceNearDup = Some(0.5))
    val qn = Curation.pipelineStream(in, "doc_id", "text", "ts",
        dedupHorizon = "10 minutes", cfg = cfgNear)
      .writeStream.format("memory").queryName("curation_stream_near")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    qn.awaitTermination(120000L)
    val streamedNear = spark.table("curation_stream_near")
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val batchNear = Curation.pipeline(
        spark.read.parquet(scratch).select($"doc_id", $"text"),
        "doc_id", "text", cfgNear)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(streamedNear.nonEmpty && streamedNear == batchNear,
      s"near-dup stream kept ${streamedNear.size} vs batch ${batchNear.size}")

    // corpus-wide stages are a loud typed error, not a silent skip
    for (bad <- Seq(
        cfg.copy(lineDedupMinDocs = Some(3)),
        cfg.copy(substringDedupWindow = Some(50)),
        cfg.copy(softDedup = true),
        cfg.copy(contaminationProbes = Some(Seq("x").toDF("text"))),
        cfg.copy(dsirTarget = Some(Seq("x").toDF("text")), dsirK = 5),
        cfg.copy(tokenBudget = Some(1000L)),
        // near-dup STREAMS now, but still needs its snapshot
        cfg.copy(referenceNearDup = Some(0.5))))
      intercept[graft.core.GraftError.Configuration](
        Curation.pipelineStream(in, "doc_id", "text", "ts", cfg = bad))
    // a STREAMING probe frame for the excise stage is rejected up front
    intercept[IllegalArgumentException](
      Curation.pipelineStream(in, "doc_id", "text", "ts",
        cfg = cfg.copy(decontaminateExciseProbes = Some(in))))
    // and a batch frame is rejected up front
    intercept[IllegalArgumentException](
      Curation.pipelineStream(spark.read.parquet(scratch),
        "doc_id", "text", "ts", cfg = cfg))
  }

  test("pipelineStream quality stages ride the FUSED walk expressions " +
      "(QualityKeep / C4Keep), never the per-signal chains") {
    import spark.implicits._
    import graft.llm.Curation
    val scratch = tmpDir("stream_fused_pin")
    Seq((1L, "stream pin fixture text", java.sql.Timestamp.valueOf(
      "2024-01-01 10:00:00"))).toDF("doc_id", "text", "ts")
      .write.mode("overwrite").parquet(scratch)
    val in = spark.readStream
      .schema(spark.read.parquet(scratch).schema).parquet(scratch)
    val out = Curation.pipelineStream(in, "doc_id", "text", "ts",
      cfg = Curation.PipelineConfig(c4Rules = true, gopherRules = true))
    // the UNSTARTED stream's analyzed plan carries the stage
    // expressions verbatim — pin the exact fused-walk counts the batch
    // PlanSpec pins, so a stream-path regression (re-chaining the
    // 5x-retokenizing per-signal filters) cannot land silently
    val plan = out.queryExecution.analyzed.toString.toLowerCase
    def n(expr: String): Int = expr.r.findAllIn(plan).length
    assert(n("c4keep") == 1, s"c4 stage must be ONE C4Keep walk:\n$plan")
    assert(n("c4kepttext") == 1,
      s"c4 rebuild must be ONE C4KeptText walk:\n$plan")
    assert(n("qualitykeep") == 1,
      s"gopher_rules must be ONE QualityKeep walk:\n$plan")
    assert(n("textqualitysignals") == 0,
      s"no per-signal walk belongs in the stream filter path:\n$plan")
  }

  test("firstOccurrence keeps the earliest row per content group") {
    import spark.implicits._
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val df = Seq(
      (1L, ts(5), "a"), (2L, ts(1), "a"), (3L, ts(1), "a"), // dup content "a"
      (4L, ts(9), "b")
    ).toDF("event_id", "ts", "payload")
    val out = graft.llm.Dedup.firstOccurrence(df, Seq("payload"),
      Seq("ts", "event_id")).orderBy("event_id").collect()
    // earliest ts wins; ts tie broken by event_id (2 beats 3)
    assert(out.map(_.getLong(0)).toSeq == Seq(2L, 4L))
  }

  test("sessions: gap semantics — new session at exactly the gap") {
    import spark.implicits._
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val events = Seq(
      (1L, ts(0)), (1L, ts(10)), (1L, ts(39)),   // 10:10→10:39 = 29m: same
      (1L, ts(40)), (2L, ts(0))                  // wait, 39→40 merges too
    ).toDF("user_id", "ts")
    // gap 30m: user 1 events 0,10,39,40 chain (each diff < 30m) → 1 session
    val s1 = EventsStreaming.sessions(events, "30 minutes")
    assert(s1.filter($"user_id" === 1L).count() == 1)

    val events2 = Seq((1L, ts(0)), (1L, ts(30))).toDF("user_id", "ts")
    // exactly 30m apart: session_window's gap boundary is INCLUSIVE —
    // the two events merge into one session (pinned; the DuckDB oracle
    // mirrors this with `ts > prev + gap` for a session break)
    val s2 = EventsStreaming.sessions(events2, "30 minutes")
    assert(s2.filter($"user_id" === 1L).count() == 1)

    val events3 = Seq(
      (1L, ts(0)),
      (1L, new java.sql.Timestamp(ts(30).getTime + 1))).toDF("user_id", "ts")
    // one millisecond past the gap → two sessions
    val s3 = EventsStreaming.sessions(events3, "30 minutes")
    assert(s3.filter($"user_id" === 1L).count() == 2)
  }
}
