package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming surface over the events stream (new capability;
  * the reference is strictly batch — SURVEY §2.E "Streaming: none").
  *
  * The batch/stream duality is deliberate: [[hourlyAggBatch]] and
  * [[hourlyAggStream]] share the same transformation body, so the
  * DuckDB oracle validates the logic in batch mode while the streaming
  * test exercises watermarks + incremental state on the same files.
  */
object EventsStreaming {

  /** The events fixture stores `ts` as parquet TIMESTAMP(NANOS), which
    * Spark 4 refuses to read as a timestamp; we read it as raw
    * nanos-since-epoch (legacy nanosAsLong) and floor-divide to micros —
    * the same truncation DuckDB applies, so oracles agree. */
  val eventsSchemaRaw: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private def nanosToTs(df: DataFrame): DataFrame =
    df.withColumn("ts", timestamp_micros(expr("ts div 1000")))

  /** Batch read of the events fixture with ns→µs normalization. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    nanosToTs(spark.read.schema(eventsSchemaRaw).parquet(s"$dir/events.parquet"))
  }

  /** Shared transformation: tumbling 1h window per event_type. Sums go
    * through DECIMAL(18,4) for cross-engine exactness (values are 2dp). */
  def hourlyAgg(events: DataFrame): DataFrame = {
    val dec = DecimalType(18, 4)
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(dec)).cast("double").as("sum_value"))
      .select(col("w.start").as("hour_start"), col("event_type"),
        col("n_events"), col("sum_value"))
  }

  def hourlyAggBatch(spark: SparkSession, dir: String): DataFrame =
    hourlyAgg(readEvents(spark, dir))

  /** Streaming flavor: file source + 10-minute watermark on the event
    * time; append mode emits a window once the watermark passes it. */
  def hourlyAggStream(spark: SparkSession, dir: String,
                      queryName: String = "events_hourly"): StreamingQuery = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the file stream source needs a directory; glob-filter to the fixture
    val events = nanosToTs(spark.readStream
      .schema(eventsSchemaRaw)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir))
    hourlyAgg(events.withWatermark("ts", "10 minutes"))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Sessionization: gap-based sessions per user via the SQL
    * session_window — stateful streaming-native semantics, expressed the
    * same way in batch. */
  def sessions(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("s"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
      .select(col("user_id"), col("s.start").as("session_start"),
        col("n_events"), col("first_ts"), col("last_ts"))

  /** Streaming sessionization: same body as [[sessions]], with a
    * watermark bounding session state; append mode emits a session once
    * the watermark passes its close. */
  def sessionsStream(spark: SparkSession, dir: String,
                     queryName: String = "events_sessions",
                     gap: String = "30 minutes"): StreamingQuery = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = nanosToTs(spark.readStream
      .schema(eventsSchemaRaw)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir))
    sessions(events.withWatermark("ts", "10 minutes"), gap)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Typed access to the JSON `props` sidecar: per-type stats over an
    * extracted numeric field (the DataType::Json story mapped to
    * get_json_object — parse on demand, StringType at rest). */
  def propsStats(events: DataFrame, field: String = "k"): DataFrame =
    events
      .withColumn("_v", get_json_object(col("props"), s"$$.$field").cast("long"))
      .groupBy(col("event_type"))
      .agg(count(col("_v")).as("n_with_field"),
        sum(col("_v")).as(s"sum_$field"),
        min(col("_v")).as(s"min_$field"),
        max(col("_v")).as(s"max_$field"))
}
