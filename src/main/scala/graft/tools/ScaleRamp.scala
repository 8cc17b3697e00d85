package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-ramp dataset generator: synthesizes a `factor`× replica of a
  * testdata scale-factor directory so the heavy queries can be measured
  * at 1× vs N× and checked for near-linear growth (the empirical leg of
  * the 100 TB design claims — plan audits say the shapes scale; this
  * produces the numbers).
  *
  * Construction: key-shifted replicas. Every fact-ish table is unioned
  * `factor` times via `explode(sequence(...))` (narrow, no shuffle, no
  * cartesian), with each key domain shifted by `replica * (max(key)+1)`
  * CONSISTENTLY across tables (o_orderkey and l_orderkey move together,
  * o_custkey with c_custkey, …) so join fan-outs are preserved exactly:
  * the N× corpus is N disjoint copies of the 1× join graph. Dimension
  * tables (region, nation) are copied verbatim — at 100 TB they stay 25
  * and 5 rows, and replicating them would distort join selectivity.
  *
  * Documents get their doc_id shifted AND every word suffixed with a
  * per-replica tag for replica > 0, so shingle sets are disjoint across
  * replicas: near-dup structure within each replica is preserved
  * identically, while cross-replica candidate pairs — which would grow
  * quadratically and measure the *construction*, not the operator — are
  * impossible. Embeddings get per-element deterministic hash noise for
  * the same reason (identical vectors across replicas would put every
  * replica of a point in one LSH bucket / k-means cell at cosine 1.0).
  *
  * Stride floors (round-10): SparkEntry's engineered corpora add
  * +100000/+200000/+400000 offsets to doc_id (and +1e7 to event_id in
  * q_dedup_first). With the natural stride max(key)+1 (≈5e3 docs at
  * sf0.1) those offsets collide with replica ids above factor ~19, so
  * the doc/user/vec strides are FLOORED at 1e6 and the event stride at
  * 1e8: every replica owns a band wide enough that base ids plus any
  * engineered offset stay inside it. Bands are sparse rather than
  * dense, which no query depends on; replica membership is still
  * id / stride.
  *
  * Usage: runMain graft.tools.ScaleRamp [baseDir] [outDir] [factor]
  */
object ScaleRamp {

  /** Replicate `df` `factor` times, then apply per-replica column
    * overrides. The replica index column `__r` (LongType, 0-based) is
    * visible to the override expressions and dropped afterwards. */
  private def replicate(df: DataFrame, factor: Int)(
      overrides: (String, org.apache.spark.sql.Column)*): DataFrame = {
    val exploded = df.withColumn("__r",
      explode(sequence(lit(0L), lit(factor - 1L))))
    overrides.foldLeft(exploded) { case (d, (name, c)) =>
      d.withColumn(name, c)
    }.drop("__r").select(df.columns.map(col).toIndexedSeq: _*)
  }

  def main(args: Array[String]): Unit = {
    graft.core.Logs.derbyHomeToScratch()
    val baseDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 1) args(1) else "/root/repo/target/scale10"
    val factor = if (args.length > 2) args(2).toInt else 10
    require(factor >= 1 && factor <= 100,
      s"factor must be in [1,100]; got $factor")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(name: String): DataFrame =
      spark.read.parquet(s"$baseDir/$name.parquet")
    def baseFiles(name: String): Int = math.max(1,
      Option(new java.io.File(s"$baseDir/$name.parquet")
        .listFiles((_, f) => f.endsWith(".parquet"))).map(_.length)
        .getOrElse(1))
    // a real factor× dataset has factor× the FILES of the same layout,
    // not the same files grown factor× — and scan parallelism follows
    // file structure. The first ramp wrote documents as ONE ~40 MB
    // file (< maxPartitionBytes), so every text-heavy query's scan +
    // shingle phase ran in a single task: thread dumps showed 1 of 32
    // cores busy and the "10×" ratios measured serialization, not the
    // operators. Replicated tables are therefore written with
    // factor × (base file count) output files.
    def write(df: DataFrame, name: String, files: Int = 1): Unit = {
      df.repartition(files).write.mode("overwrite")
        .parquet(s"$outDir/$name.parquet")
      println(s"[scale-ramp] wrote $name x$factor ($files files)")
    }
    // one tiny driver-side max per key domain; `floor` widens the band
    // for domains the engineered corpora offset (see scaladoc) so a
    // replica id plus any planted offset stays inside its own band
    def stride(df: DataFrame, key: String, floor: Long = 1L): Long =
      math.max(df.agg(max(col(key).cast("long"))).head.getLong(0) + 1L,
        floor)

    val orders = read("orders")
    val lineitem = read("lineitem")
    val customer = read("customer")
    val supplier = read("supplier")
    val part = read("part")
    val events = read("events")
    val documents = read("documents")
    val embeddings = read("embeddings")

    val orderS = stride(orders, "o_orderkey")
    val custS = stride(customer, "c_custkey")
    val suppS = stride(supplier, "s_suppkey")
    val partS = stride(part, "p_partkey")
    val eventS = stride(events, "event_id", floor = 100000000L)
    val userS = stride(events, "user_id", floor = 1000000L)
    val docS = stride(documents, "doc_id", floor = 1000000L)
    val vecS = stride(embeddings, "vec_id", floor = 1000000L)

    // dimensions: verbatim copy (they do not scale with the fact data)
    write(read("region"), "region")
    write(read("nation"), "nation")

    write(replicate(customer, factor)(
      "c_custkey" -> (col("c_custkey") + col("__r") * custS)), "customer",
      factor * baseFiles("customer"))
    write(replicate(supplier, factor)(
      "s_suppkey" -> (col("s_suppkey") + col("__r") * suppS)), "supplier",
      factor * baseFiles("supplier"))
    write(replicate(part, factor)(
      "p_partkey" -> (col("p_partkey") + col("__r") * partS)), "part",
      factor * baseFiles("part"))
    write(replicate(orders, factor)(
      "o_orderkey" -> (col("o_orderkey") + col("__r") * orderS),
      "o_custkey" -> (col("o_custkey") + col("__r") * custS)), "orders",
      factor * baseFiles("orders"))
    write(replicate(lineitem, factor)(
      "l_orderkey" -> (col("l_orderkey") + col("__r") * orderS),
      "l_partkey" -> (col("l_partkey") + col("__r") * partS),
      "l_suppkey" -> (col("l_suppkey") + col("__r") * suppS)), "lineitem",
      factor * baseFiles("lineitem"))
    write(replicate(events, factor)(
      "event_id" -> (col("event_id") + col("__r") * eventS),
      "user_id" -> (col("user_id") + col("__r") * userS)), "events",
      factor * baseFiles("events"))
    // replica > 0: every word tagged, so shingles/lines/grams are
    // disjoint across replicas (see scaladoc). The tag separator MUST
    // be a \w word character (underscore): a non-word tag (first
    // attempt used '~') makes the \W+ tokenizer split "word~1" into
    // two tokens, inserting the replica digit between every word — a
    // shared every-other-shingle pattern that exploded LSH buckets
    // 170× (measured: max bucket 20 → 3463, candidate pairs 53k →
    // 140M at 10×) and turned the ramp into a fixture artifact.
    val taggedText = when(col("__r") === 0L, col("text")).otherwise(
      array_join(
        transform(split(col("text"), " "),
          w => concat(w, lit("_"), col("__r"))),
        " "))
    // overrides apply sequentially, so n_chars reads the already-tagged
    // text column rather than re-deriving (and double-tagging) it
    write(replicate(documents, factor)(
      "doc_id" -> (col("doc_id") + col("__r") * docS),
      "text" -> taggedText,
      "n_chars" -> length(col("text")).cast("long")), "documents",
      factor * baseFiles("documents"))
    // replica > 0: per-element deterministic hash noise in [0, 0.01)
    // breaks exact cross-replica vector identity without moving any
    // point far enough to change its intra-replica neighborhood
    val noisyVec = when(col("__r") === 0L, col("embedding")).otherwise(
      transform(col("embedding"), (x, i) =>
        (x + pmod(xxhash64(col("vec_id"), i, col("__r")), lit(1000L))
          .cast("float") / lit(100000.0f))))
    write(replicate(embeddings, factor)(
      "vec_id" -> (col("vec_id") + col("__r") * vecS),
      "embedding" -> noisyVec), "embeddings",
      factor * baseFiles("embeddings"))

    println(s"[scale-ramp] done: $outDir (factor $factor from $baseDir)")
    spark.stop()
  }
}
