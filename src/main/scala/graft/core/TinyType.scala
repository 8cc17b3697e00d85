package graft.core

import org.apache.spark.sql.types._

/** The engine's 8-type declared type system, modeled on the reference's
  * `DataType` enum (`/root/reference/src/schema.rs:12-21`) but mapped to
  * Spark types per SURVEY.md §1.5.
  *
  * Key deltas (deliberate, documented):
  *  - Decimal is DoubleType by default: the reference converts its
  *    Decimal to/from f64 at nearly every boundary
  *    (`src/transformer.rs:370-374`, `src/connectors/parquet.rs:373-387`),
  *    so double is the oracle-parity choice. `TDecimal.exact` offers
  *    DecimalType(38,18) for sinks that declare SQL DECIMAL.
  *  - Date and DateTime share TimestampType (session tz UTC), mirroring
  *    the single `Value::Date(DateTime<Utc>)` runtime variant
  *    (`src/schema.rs:381`, `src/date_parser.rs:44-60`).
  *  - Json is StringType tagged with column metadata
  *    `{"tinyetl:type":"json"}` exactly like the reference's Arrow field
  *    metadata (`src/schema.rs:318-329`).
  */
sealed abstract class TinyType(val name: String) extends Serializable {
  /** Spark runtime type for this tiny type. */
  def spark: DataType
  /** Metadata to attach to a StructField of this type. */
  def metadata: Metadata = Metadata.empty
}

object TinyType {
  /** Metadata key marking JSON-typed string columns (schema.rs:322-325). */
  val JsonMetaKey = "tinyetl:type"

  case object TString extends TinyType("string") { val spark: DataType = StringType }
  case object TInteger extends TinyType("integer") { val spark: DataType = LongType }
  case object TDecimal extends TinyType("decimal") {
    val spark: DataType = DoubleType
    /** Exact-decimal mode for sinks that declare SQL DECIMAL columns
      * (e.g. the reference's PG DDL DECIMAL(18,6), postgres.rs:379). */
    val exact: DataType = DecimalType(38, 18)
  }
  case object TBoolean extends TinyType("boolean") { val spark: DataType = BooleanType }
  /** Date-only declared type; runtime repr is a timestamp at midnight UTC. */
  case object TDate extends TinyType("date") { val spark: DataType = TimestampType }
  case object TDateTime extends TinyType("datetime") { val spark: DataType = TimestampType }
  case object TJson extends TinyType("json") {
    val spark: DataType = StringType
    override def metadata: Metadata =
      new MetadataBuilder().putString(JsonMetaKey, "json").build()
  }
  /** All-null column; folds to nullable TEXT at DDL (sqlite.rs:265). */
  case object TNull extends TinyType("null") { val spark: DataType = StringType }

  val all: Seq[TinyType] =
    Seq(TString, TInteger, TDecimal, TBoolean, TDate, TDateTime, TJson, TNull)

  /** Case-insensitive name → type, accepting the reference's YAML schema
    * spellings (schema.rs:117-146): string/text, integer/int, decimal/
    * float/double/number, boolean/bool, date, datetime/timestamp, json. */
  def parse(s: String): Option[TinyType] = s.trim.toLowerCase match {
    case "string" | "text" | "varchar"            => Some(TString)
    case "integer" | "int" | "bigint" | "long"    => Some(TInteger)
    case "decimal" | "float" | "double" | "number" | "numeric" => Some(TDecimal)
    case "boolean" | "bool"                       => Some(TBoolean)
    case "date"                                   => Some(TDate)
    case "datetime" | "timestamp"                 => Some(TDateTime)
    case "json"                                   => Some(TJson)
    case "null"                                   => Some(TNull)
    case _                                        => None
  }

  /** Spark DataType → closest TinyType, mirroring the reference's reverse
    * Arrow mapping (schema.rs:39-60): all int widths → Integer, all
    * floats/decimals → Decimal, complex types → String. */
  def fromSpark(dt: DataType, meta: Metadata = Metadata.empty): TinyType = dt match {
    case _ if meta.contains(JsonMetaKey)          => TJson
    case ByteType | ShortType | IntegerType | LongType => TInteger
    case FloatType | DoubleType | _: DecimalType  => TDecimal
    case BooleanType                              => TBoolean
    case DateType                                 => TDate
    case TimestampType | TimestampNTZType         => TDateTime
    case StringType                               => TString
    case NullType                                 => TNull
    case _                                        => TString // complex → stringified
  }

  /** A column in the engine's schema model (Column, schema.rs:309-314). */
  final case class TinyColumn(name: String, tpe: TinyType, nullable: Boolean = true) {
    def toField: StructField = StructField(name, tpe.spark, nullable, tpe.metadata)
  }

  /** Build a Spark StructType from tiny columns (order preserved —
    * fixes the reference's unordered-HashMap weakness, SURVEY §1.1). */
  def toStruct(cols: Seq[TinyColumn]): StructType = StructType(cols.map(_.toField))

  /** Unify a column's observed value-types into one declared type:
    * nulls don't vote; all-null → String; mixed non-null types → String;
    * inferred columns are ALWAYS nullable (schema.rs:526-554). */
  def resolve(observed: Seq[TinyType]): (TinyType, Boolean) = {
    val nonNull = observed.filterNot(_ == TNull)
    val tpe =
      if (nonNull.isEmpty) TString
      else if (nonNull.forall(_ == nonNull.head)) nonNull.head
      else TString
    (tpe, true)
  }
}
