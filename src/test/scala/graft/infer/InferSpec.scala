package graft.infer

import graft.SparkSpec
import graft.core.TinyType._
import java.time.Instant

/** Date-parser corpus from the reference's tests (FIXTURES.md A9,
  * date_parser.rs:181-331) + cell-typing lattice (csv.rs:82-111,
  * schema.rs:526-554). */
class InferSpec extends SparkSpec {

  val mustParse = Seq(
    "2023-12-25T10:30:00Z",
    "2023-12-25T10:30:00+00:00",
    "2023-12-25T10:30:00-05:00",
    "2023-12-25T10:30:00.123Z",
    "2023-12-25T10:30:00",
    "2023-12-25T10:30:00.123",
    "2023-12-25T10:30:00.123456",
    "2023-12-25",
    "12/25/2023",
    "12-25-2023",
    "2023/12/25",
    "25.12.2023",
    "Dec 25, 2023",
    "December 25, 2023",
    "25 Dec 2023",
    "2023-12-25 10:30",
    "2023-12-25 10:30:00",
    "2023-12-25 10:30:00.123",
    "12/25/2023 10:30:00 AM"
  )

  val mustNotParse = Seq("13/25/2023", "12/32/2023", "2023-13-01", "3.14159",
    "hello world", "", "true")

  test("driver-side date parser: corpus") {
    mustParse.foreach { s =>
      assert(DateFormats.tryParse(s).isDefined, s"should parse: $s")
    }
    mustNotParse.foreach { s =>
      assert(DateFormats.tryParse(s).isEmpty, s"should NOT parse: $s")
    }
  }

  test("ambiguity: month-first wins (01/02/2023 = Jan 2)") {
    val got = DateFormats.tryParse("01/02/2023").get
    assert(got == Instant.parse("2023-01-02T00:00:00Z"))
    // unambiguous day-first still parses via the d/M fallback
    assert(DateFormats.tryParse("25/12/2023").get ==
      Instant.parse("2023-12-25T00:00:00Z"))
  }

  test("tz handling: offsets normalize to UTC; naive assumed UTC") {
    assert(DateFormats.tryParse("2023-12-25T10:30:00-05:00").get ==
      Instant.parse("2023-12-25T15:30:00Z"))
    assert(DateFormats.tryParse("2023-12-25T10:30:00").get ==
      Instant.parse("2023-12-25T10:30:00Z"))
  }

  test("distributed parseExpr agrees with driver-side parser") {
    import spark.implicits._
    val df = (mustParse ++ mustNotParse).toDF("s")
    val got = df.select(DateFormats.parseExpr(org.apache.spark.sql.functions.col("s"))
      .as("ts"), org.apache.spark.sql.functions.col("s")).collect()
    got.foreach { r =>
      val s = r.getString(1)
      val expected = DateFormats.tryParse(s)
      val sparkVal = if (r.isNullAt(0)) None else Some(r.getTimestamp(0).toInstant)
      assert(sparkVal == expected, s"mismatch for '$s': spark=$sparkVal scala=$expected")
    }
  }

  test("cell classification lattice (csv.rs:82-111)") {
    assert(CellInference.classify("123") == TInteger)
    assert(CellInference.classify("-42") == TInteger)
    assert(CellInference.classify("1.5") == TDecimal)
    assert(CellInference.classify("-3.14") == TDecimal)
    assert(CellInference.classify("true") == TBoolean)
    assert(CellInference.classify("false") == TBoolean)
    assert(CellInference.classify("True") == TString)   // Rust bool parse is exact
    assert(CellInference.classify("2023-12-25") == TDate)
    assert(CellInference.classify("2023-12-25T10:30:00Z") == TDateTime)
    assert(CellInference.classify("") == TNull)
    assert(CellInference.classify("hello") == TString)
    // i64 overflow falls through to decimal
    assert(CellInference.classify("99999999999999999999") == TDecimal)
  }

  test("column resolution: nulls don't vote, mixed→String, always nullable") {
    assert(resolve(Seq(TInteger, TInteger, TNull)) == (TInteger, true))
    assert(resolve(Seq(TNull, TNull)) == (TString, true))
    assert(resolve(Seq(TInteger, TDecimal)) == (TString, true))
    assert(resolve(Seq(TBoolean)) == (TBoolean, true))
  }

  test("CSV read with tinyetl semantics end-to-end") {
    val dir = tmpDir("csvread")
    val f = new java.io.File(s"$dir/in.csv")
    val w = new java.io.PrintWriter(f)
    w.println("id,name,price,active,when,note")
    w.println("1,Alice,9.99,true,2023-12-25,hi")
    w.println("2,Bob,12.50,false,12/26/2023,")
    w.println("3,,0.25,true,Dec 27, ok") // note: 'Dec 27' won't parse → mixed col
    w.close()
    val df = CellInference.readCsv(spark, f.getPath)
    val sch = df.schema
    assert(sch("id").dataType == org.apache.spark.sql.types.LongType)
    assert(sch("price").dataType == org.apache.spark.sql.types.DoubleType)
    assert(sch("active").dataType == org.apache.spark.sql.types.BooleanType)
    // 'when' column: two dates + one non-date → String (mixed)
    assert(sch("when").dataType == org.apache.spark.sql.types.StringType)
    assert(sch.fields.forall(_.nullable))
    assert(df.columns.toSeq == Seq("id", "name", "price", "active", "when", "note"))
    val rows = df.orderBy("id").collect()
    assert(rows(0).getAs[String]("name") == "Alice")
    assert(rows(2).isNullAt(1)) // empty cell → null
  }

  test("tinyetl:type=json field metadata survives a parquet round-trip") {
    import graft.core.TinyType
    import spark.implicits._
    val dir = tmpDir("meta_rt")
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putString(TinyType.JsonMetaKey, "json").build()
    val df = Seq((1L, """{"a":1}""")).toDF("id", "payload")
      .select($"id", $"payload".as("payload", meta))
    assert(df.schema("payload").metadata.contains(TinyType.JsonMetaKey))
    df.write.mode("overwrite").parquet(s"$dir/m.parquet")
    val back = spark.read.parquet(s"$dir/m.parquet")
    assert(back.schema("payload").metadata.contains(TinyType.JsonMetaKey),
      "parquet.rs:45-77 parity: json tag must revive on read")
    assert(back.schema("payload").metadata.getString(TinyType.JsonMetaKey) == "json")
    assert(graft.core.TinyType.fromSpark(
      back.schema("payload").dataType, back.schema("payload").metadata).name == "json")
  }

  test("all-date CSV column becomes timestamp") {
    val dir = tmpDir("csvdates")
    val f = new java.io.File(s"$dir/in.csv")
    val w = new java.io.PrintWriter(f)
    w.println("id,d")
    w.println("1,2023-12-25")
    w.println("2,12/26/2023")
    w.close()
    val df = CellInference.readCsv(spark, f.getPath)
    assert(df.schema("d").dataType == org.apache.spark.sql.types.TimestampType)
    val vals = df.orderBy("id").collect().map(_.getTimestamp(1).toInstant.toString)
    assert(vals.toSeq == Seq("2023-12-25T00:00:00Z", "2023-12-26T00:00:00Z"))
  }
}
