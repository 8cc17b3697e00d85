package graft.engine

import graft.sources.Connectors
import graft.transform.Transform
import graft.validate.{SchemaFile, Validation}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The pipeline driver (U1, `/root/reference/src/transfer.rs:23-199`):
  * read → [validate] → [transform] → (preview | dry-run | write).
  *
  * The reference's 10 sequential steps collapse into one lazy Spark
  * plan: Catalyst sees scan + validation + transform as a single
  * optimized query, so filters/pruning push into the source — the
  * opposite of the reference's opaque per-row loop (SURVEY §4.1).
  */
final case class TransformSpec(
    inline: Option[String] = None,
    script: Option[String] = None,
    filter: Option[String] = None,
    file: Option[String] = None)

final case class JobConfig(
    source: String,
    target: String,
    sourceOptions: Map[String, String] = Map.empty,
    targetOptions: Map[String, String] = Map.empty,
    transform: TransformSpec = TransformSpec(),
    schemaFile: Option[String] = None,
    truncate: Boolean = false,
    skipExisting: Boolean = false,
    primaryKey: Option[String] = None,
    /** "double" (reference parity — the reference computes Decimal in
      * f64 at every boundary, SURVEY §1.2) or "exact": floating columns
      * are cast to DecimalType(38,18) at the WRITE boundary, so sinks
      * that declare SQL DECIMAL (postgres.rs:379 DECIMAL(18,6),
      * mysql.rs:393 DECIMAL(65,30)) get exact digits while reads and
      * transforms keep f64 semantics. */
    decimalMode: String = "double",
    /** Dead-letter target: rows failing schema validation are written
      * here (raw source typing + a `_violations` reason column) instead
      * of aborting the batch — the reference's fail-fast semantics
      * become route-and-continue. Requires `schemaFile`. */
    quarantine: Option[String] = None) {
  if (decimalMode != "double" && decimalMode != "exact")
    throw graft.core.GraftError.Configuration(
      s"decimal mode must be double|exact, got '$decimalMode'")
  if (quarantine.isDefined && schemaFile.isEmpty)
    throw graft.core.GraftError.Configuration(
      "quarantine requires schema_file — without schema checks there is " +
        "nothing to quarantine")
}

final case class TransferStats(totalRows: Long, seconds: Double,
                               rejectedRows: Long = 0L) {
  def rowsPerSecond: Double = if (seconds > 0) totalRows / seconds else 0.0
}

class TransferEngine(cfg: JobConfig) {

  /** The pre-transform frame (read + validation) — the "original
    * schema" preview renders this stage's shape. */
  private def sourceFrame(spark: SparkSession): DataFrame = {
    val df = Connectors.read(spark, cfg.source, cfg.sourceOptions)
    // validation BEFORE transform (transfer.rs:154-159, README.md:772)
    cfg.schemaFile.fold(df)(p => validated(df, SchemaFile.fromFile(p)))
  }

  /** Validation stage: fail-fast by default; with a quarantine target
    * configured, the VALID-side route (annotate → keep clean → type) —
    * the invalid side is written by [[execute]], and preview/dry-run
    * naturally render the valid route. */
  private def validated(df: DataFrame, sf: SchemaFile): DataFrame =
    if (cfg.quarantine.isEmpty) Validation(df, sf)
    else {
      import org.apache.spark.sql.functions.{col, size}
      Validation(Validation.annotate(df, sf)
        .where(size(col("_violations")) === 0).drop("_violations"), sf)
    }

  /** Build the full lazy plan (read → validate → transform). */
  def plan(spark: SparkSession): DataFrame =
    applyTransforms(spark, sourceFrame(spark))

  /** The validate → transform stages over an externally built source
    * frame — the streaming curation path reads via
    * [[Connectors.readStream]] and runs the EXACT batch stage bodies on
    * the stream (they are column expressions; parity is structural).
    * skip-existing is a batch anti-join and must be off. */
  def planOver(spark: SparkSession, source: DataFrame): DataFrame = {
    if (source.isStreaming && cfg.skipExisting)
      throw graft.core.GraftError.Configuration(
        "skip_existing cannot stream (it anti-joins the target's current " +
          "keys, a batch-time snapshot) — deduplicate in the curation " +
          "stage instead")
    if (source.isStreaming && cfg.quarantine.isDefined)
      throw graft.core.GraftError.Configuration(
        "quarantine cannot stream (it forks the batch into two sinks " +
          "over one materialized pass) — run validation-routing as a " +
          "batch transfer")
    var df = source
    cfg.schemaFile.foreach(p => df = validated(df, SchemaFile.fromFile(p)))
    applyTransforms(spark, df)
  }

  /** Transform + skip-existing stages over an already-built source
    * frame — split out so preview can render both stages from ONE
    * source build (a second build would re-download http/ssh sources
    * and re-run JDBC schema/bounds probes). */
  private def applyTransforms(spark: SparkSession,
                              source: DataFrame): DataFrame = {
    var df = source
    // --transform-file wins over --transform (cli.rs:183-191)
    cfg.transform.file match {
      case Some(p) => df = graft.transform.LuaFile.fromFile(df, p)
      case None =>
        cfg.transform.inline.foreach(t => df = Transform.inline(df, t))
        cfg.transform.script.foreach(t => df = Transform.script(df, t))
        cfg.transform.filter.foreach(t => df = Transform.filter(df, t))
    }
    // --skip-existing: documented intent is "skip rows already in the
    // target by primary key" (cli.rs:46-47; never wired in the
    // reference engine — SURVEY §2.E). Implemented as a left_anti join
    // against the target's current keys; broadcast-able when small.
    if (cfg.skipExisting) {
      val pk = cfg.primaryKey.getOrElse(detectPk(df))
      val existing = scala.util.Try(
        Connectors.read(spark, cfg.target, cfg.targetOptions).select(pk))
      existing.toOption.foreach(ex => df = df.join(ex, Seq(pk), "left_anti"))
    }
    df
  }

  /** PK-candidate heuristic (odbc.rs:196-203), shared with the JDBC
    * partitioned-scan path. */
  private def detectPk(df: DataFrame): String =
    Connectors.pkCandidate(df.schema).getOrElse(
      throw graft.core.GraftError.Configuration(
        "skipExisting requires primaryKey (no id-like integer column found)"))

  /** Execute the copy (write path). Row stats come from an
    * `Observation` riding the write job itself (U4) — one pass, no
    * re-read of the written target, no second scan of the source. The
    * RDD-based Avro sink can't fire Dataset listeners; it counts rows
    * while writing and returns the count directly. */
  def execute(spark: SparkSession): TransferStats = {
    import org.apache.spark.sql.Observation
    import org.apache.spark.sql.functions.{count, lit}
    val t0 = System.nanoTime()
    val rejected = cfg.quarantine.fold(0L)(writeQuarantine(spark, _))
    val obs = Observation()
    val df = exactDecimals(plan(spark)).observe(obs, count(lit(1)).as("rows"))
    val direct =
      try Connectors.write(df, cfg.target, cfg.truncate, cfg.targetOptions)
      catch {
        case e: graft.core.GraftError => throw e // already typed
        case e: Exception => throw graft.core.GraftError.DataTransfer(
          s"writing ${cfg.target} failed: ${e.getMessage}", e)
      }
    val rows = direct.getOrElse(obs.get("rows").asInstanceOf[Long])
    TransferStats(rows, (System.nanoTime() - t0) / 1e9, rejected)
  }

  /** Dead-letter write: the INVALID side of the annotated source —
    * raw source typing plus `_violations` flattened to a '|'-joined
    * string (portable across every sink, CSV included). Written before
    * the main transfer so a failing main write still leaves the
    * rejects inspectable. Costs one extra source pass — the route
    * split is two filters over one lazy read; sources where a second
    * scan is expensive (http/ssh download once into a temp file via
    * their connectors) are unaffected. */
  private def writeQuarantine(spark: SparkSession, target: String): Long = {
    import org.apache.spark.sql.functions.{col, concat_ws, count, lit, size}
    import org.apache.spark.sql.Observation
    val sf = SchemaFile.fromFile(cfg.schemaFile.get)
    val src = Connectors.read(spark, cfg.source, cfg.sourceOptions)
    val invalid = Validation.annotate(src, sf)
      .where(size(col("_violations")) > 0)
      .withColumn("_violations", concat_ws("|", col("_violations")))
    val obs = Observation()
    val observed = invalid.observe(obs, count(lit(1)).as("rows"))
    val direct =
      try Connectors.write(observed, target, cfg.truncate, Map.empty)
      catch {
        case e: graft.core.GraftError => throw e
        case e: Exception => throw graft.core.GraftError.DataTransfer(
          s"writing quarantine $target failed: ${e.getMessage}", e)
      }
    direct.getOrElse(obs.get("rows").asInstanceOf[Long])
  }

  /** Write-boundary cast for `decimalMode = "exact"`: every floating
    * column becomes [[graft.core.TinyType.TDecimal.exact]]
    * (DecimalType(38,18)) so the sink's declared SQL DECIMAL holds exact
    * digits. A no-op (same frame, no extra projection) in the default
    * double mode.
    *
    * DECIMAL(38,18) cannot represent NaN, ±Infinity, or |x| >= 1e20;
    * the plain (non-ANSI) cast would null those silently — an opt-in
    * "exact" mode that corrupts extremes the default double mode
    * preserves. Fail fast instead (U8 semantics), naming column and
    * value. Nulls pass through: only a non-null input that the cast
    * nulls is an error. */
  private def exactDecimals(df: DataFrame): DataFrame =
    if (cfg.decimalMode != "exact") df
    else {
      import org.apache.spark.sql.functions.{col, concat, lit, raise_error, when}
      import org.apache.spark.sql.types.{DoubleType, FloatType}
      val floating = df.schema.fields
        .filter(f => f.dataType == DoubleType || f.dataType == FloatType)
      if (floating.isEmpty) df
      else df.withColumns(floating.map { f =>
        val c = col(f.name)
        // try_cast (not cast): under ANSI the plain cast throws a raw
        // Spark error on overflow but still NULLs NaN/Infinity; with
        // ANSI off it NULLs all three. try_cast nulls uniformly, so the
        // guard below owns the whole failure surface with one typed error.
        val cast = c.try_cast(graft.core.TinyType.TDecimal.exact)
        f.name -> when(c.isNotNull && cast.isNull,
          raise_error(concat(
            lit(s"decimal mode exact: column '${f.name}' value "),
            c.cast("string"),
            lit(" is not representable as DECIMAL(38,18) (NaN/Infinity/overflow)")))
            .cast(graft.core.TinyType.TDecimal.exact))
          .otherwise(cast)
      }.toMap)
    }

  /** Preview (U2, transfer.rs:201-316): original-schema box, transformed
    * schema when a transform is configured, then the first N rows in the
    * reference's fixed-width table — no write. */
  def preview(spark: SparkSession, n: Int = 10): String = {
    val src = sourceFrame(spark) // built ONCE; both sections derive from it
    val df = applyTransforms(spark, src)
    val sb = new StringBuilder
    sb.append("\nOriginal Schema Preview:\n")
    sb.append(PreviewFormat.schemaBox(src.schema))
    if (cfg.transform != TransformSpec()) {
      sb.append("\nApplying transformations...\n")
      sb.append("\nTransformed Schema Preview:\n")
      sb.append(PreviewFormat.schemaBox(df.schema))
    }
    sb.append(s"\nData Preview ($n rows):\n")
    sb.append(PreviewFormat.dataTable(df.columns, df.limit(n).collect()))
    sb.toString
  }

  /** Dry run (U3, transfer.rs:318-368): connections, schema, 10-row
    * transform smoke test — no write. Returns the resolved schema. */
  def dryRun(spark: SparkSession): org.apache.spark.sql.types.StructType = {
    val df = plan(spark)
    df.limit(10).collect() // smoke-execute the head of the pipeline
    df.schema
  }

}

/** Box-drawing renderers mirroring the reference's preview layout
  * (transfer.rs:242-316): a fixed-width schema table (19/13/8 columns)
  * and a 15-wide-cell data table with values truncated to 15 chars and
  * NULL for nulls. */
object PreviewFormat {

  def schemaBox(schema: org.apache.spark.sql.types.StructType): String = {
    val sb = new StringBuilder
    sb.append("┌─────────────────────┬───────────────┬──────────┐\n")
    sb.append("│ Column              │ Type          │ Nullable │\n")
    sb.append("├─────────────────────┼───────────────┼──────────┤\n")
    schema.fields.foreach { f =>
      val tpe = graft.core.TinyType.fromSpark(f.dataType, f.metadata).name
      sb.append(String.format("│ %-19s │ %-13s │ %-8s │%n",
        f.name, tpe, f.nullable.toString))
    }
    sb.append("└─────────────────────┴───────────────┴──────────┘\n")
    sb.toString
  }

  def dataTable(headers: Seq[String],
                rows: Seq[org.apache.spark.sql.Row]): String = {
    if (rows.isEmpty) return "No data to display\n"
    val sb = new StringBuilder
    def border(l: String, m: String, r: String): Unit = {
      sb.append(l)
      headers.indices.foreach { i =>
        sb.append("─────────────────")
        if (i < headers.length - 1) sb.append(m)
      }
      sb.append(r).append('\n')
    }
    def line(cells: Seq[String]): Unit = {
      sb.append("│")
      cells.foreach(c => sb.append(String.format(" %-15s │", c.take(15))))
      sb.append('\n')
    }
    border("┌", "┬", "┐")
    line(headers)
    border("├", "┼", "┤")
    rows.foreach { r =>
      line(r.toSeq.map(v => if (v == null) "NULL" else v.toString))
    }
    border("└", "┴", "┘")
    sb.toString
  }
}
