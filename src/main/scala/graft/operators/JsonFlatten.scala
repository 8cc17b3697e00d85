package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Flatten a JSON string column into typed top-level columns — the
  * engine's DataType::Json story completed (reference keeps JSON opaque
  * at rest, `/root/reference/src/datatype.rs`; [[graft.streaming.EventsStreaming.propsStats]]
  * extracts one field on demand; this operator lifts the WHOLE payload
  * into the schema).
  *
  * Shape: the schema comes from a BOUNDED sample (same convention as
  * CSV cell inference's 1000-row cap — `graft.infer.CellInference`), so
  * driver memory is fixed no matter the table size; the data path is
  * then ONE codegen'd `from_json` projection — no per-key
  * get_json_object re-parses (k keys would parse the payload k times),
  * no shuffle, no driver loop. Nested objects flatten recursively into
  * `sep`-joined names; arrays and scalars keep their inferred type.
  * Malformed rows yield NULL in every flattened column (from_json's
  * PERMISSIVE mode), and keys absent from the sample are dropped —
  * both documented consequences of bounded inference.
  */
object JsonFlatten {

  private def q(c: String): Column = col("`" + c.replace("`", "``") + "`")

  /** Infer the payload schema from up to `sampleRows` non-null rows
    * (a bounded spark.read.json pass over the sample). */
  def inferSchema(df: DataFrame, jsonCol: String,
                  sampleRows: Int = 1000): StructType = {
    val sample = df.select(q(jsonCol).cast("string")).na.drop()
      .limit(sampleRows)
      .as(Encoders.STRING)
    val s = df.sparkSession.read.json(sample).schema
    // spark.read.json surfaces unparseable rows as _corrupt_record —
    // not a payload key; drop it from the projection schema
    StructType(s.fields.filterNot(_.name == "_corrupt_record"))
  }

  private def leafCols(prefix: String, t: StructType, path: Column,
                       sep: String): Seq[(String, Column)] =
    t.fields.toSeq.flatMap { f =>
      f.dataType match {
        case s: StructType =>
          leafCols(prefix + f.name + sep, s, path.getField(f.name), sep)
        case _ => Seq((prefix + f.name, path.getField(f.name)))
      }
    }

  /** Project every (recursively flattened) JSON key as a typed column
    * appended after the frame's other columns; the source column is
    * dropped unless `keepSource`. Name collisions with existing
    * columns fail loudly at plan time. */
  def flatten(df: DataFrame, jsonCol: String, sampleRows: Int = 1000,
              sep: String = "_", keepSource: Boolean = false): DataFrame = {
    require(df.columns.contains(jsonCol),
      s"json column '$jsonCol' not in ${df.columns.mkString(", ")}")
    val schema = inferSchema(df, jsonCol, sampleRows)
    require(schema.nonEmpty,
      s"no JSON keys discovered in '$jsonCol' ($sampleRows-row sample)")
    val parsedCol = from_json(q(jsonCol).cast("string"), schema)
    val flat = leafCols("", schema, parsedCol, sep)
    val kept = df.columns.toSeq.filter(c => keepSource || c != jsonCol)
    val clash = flat.map(_._1).toSet.intersect(kept.toSet)
    require(clash.isEmpty,
      s"flattened JSON keys collide with existing columns: ${clash.mkString(", ")}")
    df.select(kept.map(q) ++ flat.map { case (n, c) => c.as(n) }: _*)
  }
}
