package graft.validate

import graft.core.TinyType._
import graft.infer.DateFormats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Row validation + typed defaults, as one distributed projection (V2,
  * `/root/reference/src/schema.rs:148-244`). Runs BEFORE transform
  * (transfer.rs:154-159).
  *
  * Per column, in the reference's order:
  *  1. required column present (plan-time error if absent);
  *  2. null + default → default; null + non-nullable + no default → row
  *     error;
  *  3. declared json → value must parse as JSON, else row error;
  *  4. type check: non-null value that can't convert to the declared
  *     type → row error (conversion itself is the multi-format date
  *     chain for dates, try_cast otherwise);
  *  5. `pattern` regex on string columns → non-matching row errors.
  *
  * Row errors are fail-fast via `raise_error` (SURVEY §4.3(4)) — the
  * Spark-shaped equivalent of the reference aborting the batch. All
  * checks are built-in expressions, so the whole validation is one
  * codegen'd projection over the scan: zero shuffles, scales linearly.
  */
object Validation {

  def apply(df: DataFrame, schema: SchemaFile, failFast: Boolean = true): DataFrame = {
    val present = df.columns.toSet
    val missing = schema.columns.filterNot(c => present(c.name))
    if (missing.nonEmpty)
      throw graft.core.GraftError.DataValidation(
        s"required columns missing from source: ${missing.map(_.name).mkString(", ")}")

    val checked = schema.columns.map { sc =>
      val c = col(s"`${sc.name}`")
      validatedColumn(c, sc, df.schema(sc.name).dataType, failFast).as(
        sc.name, sc.tpe.metadata)
    }
    // columns not in the schema file pass through untouched, after the
    // declared ones (schema order wins, mirroring Schema::columns order)
    val passthrough = df.columns.toSeq
      .filterNot(n => schema.columns.exists(_.name == n))
      .map(n => col(s"`$n`"))
    df.select(checked ++ passthrough: _*)
  }

  private def err(c: Column, msg: Column, failFast: Boolean): Column =
    if (failFast) raise_error(msg) else lit(null)

  private def validatedColumn(c0: Column, sc: SchemaColumn, from: DataType,
                              failFast: Boolean): Column = {
    // 3+4. typed conversion of the raw value (lenient; nulls mark failure)
    val target = sc.tpe.spark
    val converted: Column = sc.tpe match {
      case TDate | TDateTime if from == StringType => DateFormats.parseExpr(c0)
      case TJson =>
        // string must parse as JSON (schema.rs:168-189); keep as string
        val parsed = try_parse_json(c0.cast(StringType))
        when(c0.isNotNull && parsed.isNull,
          err(c0, concat(lit(s"Validation error: column '${sc.name}' " +
            s"contains invalid JSON: "), c0.cast(StringType)), failFast))
          .otherwise(c0.cast(StringType))
      case _ if from == target => c0
      case _ => c0.try_cast(target)
    }

    // conversion failure of a NON-NULL value is a row error (schema.rs:201-231)
    val typeChecked = sc.tpe match {
      case TJson => converted
      case _ =>
        when(c0.isNotNull && converted.isNull,
          err(c0, concat(
            lit(s"Validation error: column '${sc.name}' expected ${sc.tpe.name}, got: "),
            c0.cast(StringType)), failFast).cast(target))
          .otherwise(converted)
    }

    // 2. defaults fill nulls; null + non-nullable + no default is a row
    //    error (schema.rs:148-165)
    val withDefault = sc.typedDefault match {
      case Some(d) => when(c0.isNull, lit(d).cast(target)).otherwise(typeChecked)
      case None if !sc.nullable =>
        when(c0.isNull, err(c0, concat(
          lit(s"Validation error: required column '${sc.name}' is null")),
          failFast).cast(target)).otherwise(typeChecked)
      case None => typeChecked
    }
    val checked = withDefault

    // 5. pattern (string columns only, schema.rs:233-241)
    sc.pattern match {
      case Some(p) if sc.tpe == TString =>
        when(checked.isNotNull && !checked.rlike(p),
          err(checked, concat(
            lit(s"Validation error: column '${sc.name}' value does not match pattern '$p': "),
            checked.cast(StringType)), failFast).cast(StringType))
          .otherwise(checked)
      case _ => checked
    }
  }

  private def concat(cols: Column*): Column =
    org.apache.spark.sql.functions.concat(cols: _*)
}
