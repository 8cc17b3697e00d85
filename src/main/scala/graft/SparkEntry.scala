package graft

import graft.infer.{CellInference, DateFormats}
import graft.sources.{AvroConnector, Connectors}
import graft.transform.Transform
import graft.validate.{SchemaFile, Validation}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every key in [[queries]] exercises one operator from SURVEY.md §2 (or
  * a first-class LLM-pipeline operator); [[oracleSql]] holds the DuckDB
  * equivalent over the same parquet tables. Column names are aligned on
  * both sides; doubles produced by arithmetic are rounded to 4dp on both
  * sides so the hash compare is stable across engines. Integer-typed
  * columns are cast to BIGINT in the oracle because the engine's type
  * system collapses all int widths to i64 (SURVEY §1.3).
  */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Repo-local scratch space for round-trip queries (never outside repo). */
  private def scratch(name: String): String = {
    val p = java.nio.file.Paths.get(s"/root/repo/target/tmp/queries/$name")
    java.nio.file.Files.createDirectories(p.getParent)
    p.toString
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_agg_pricing_summary")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- aggregation over lineitem (new analytics surface, SURVEY §2.E) ---
    // Sums go through DECIMAL(18,4): the summands are exact 2-4dp decimal
    // quantities, so the decimal sum is EXACT and bit-identical to the
    // DuckDB oracle regardless of partitioning/summation order (double
    // sums would drift in the low bits and flicker at round() boundaries).
    "q_agg_pricing_summary" -> { (s, dir) =>
      val dec = org.apache.spark.sql.types.DecimalType(18, 4)
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast(dec)).cast("double").as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(dec))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // --- P1 inline transform (all input cols kept; assignments see input row) ---
    "q_transform_inline" -> { (s, dir) =>
      Transform.inline(t(s, dir, "lineitem"),
        "gross=row.l_extendedprice * (1 - row.l_discount); " +
          "flag_up=string.upper(row.l_returnflag)")
        .select(col("l_orderkey"), col("l_linenumber"), col("gross"), col("flag_up"))
    },

    // --- P2 script transform (cross-line locals) ---
    "q_transform_script" -> { (s, dir) =>
      Transform.script(t(s, dir, "lineitem"),
        """disc_price = row.l_extendedprice * (1 - row.l_discount)
          |charged = disc_price * (1 + row.l_tax)""".stripMargin)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("disc_price"), col("charged"))
    },

    // --- P4 row filter (Lua truthiness predicate) ---
    "q_filter_rows" -> { (s, dir) =>
      Transform.filter(t(s, dir, "lineitem"),
        "row.l_quantity > 25 and row.l_returnflag == 'R'")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    },

    // --- P6 Lua pattern functions over strings ---
    "q_lua_patterns" -> { (s, dir) =>
      Transform.inline(t(s, dir, "customer"),
        "digits=row.c_name:gsub('[^%d]', ''); seg_lower=string.lower(row.c_mktsegment)")
        .select(col("c_custkey"), col("digits"), col("seg_lower"))
    },

    // --- V5 multi-format date parsing round-trip ---
    "q_multiformat_dates" -> { (s, dir) =>
      val o = t(s, dir, "orders")
      val formatted = o.select(col("o_orderkey"),
        date_format(col("o_orderdate"), "MM/dd/yyyy").as("us"),
        date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss").as("iso"),
        date_format(col("o_orderdate"), "dd.MM.yyyy").as("eu"))
      formatted.select(col("o_orderkey"),
        DateFormats.parseExpr(col("us")).as("parsed_us"),
        DateFormats.parseExpr(col("iso")).as("parsed_iso"),
        DateFormats.parseExpr(col("eu")).as("parsed_eu"))
    },

    // --- V1-V3 schema-file validation with typed defaults ---
    "q_validate_defaults" -> { (s, dir) =>
      val schema = SchemaFile.fromYaml(
        """columns:
          |  - name: c_custkey
          |    type: integer
          |    nullable: false
          |  - name: c_acctbal
          |    type: decimal
          |    default: "0.0"
          |  - name: c_mktsegment
          |    type: string
          |    pattern: '^[A-Z]+$'
          |""".stripMargin)
      val withNulls = t(s, dir, "customer")
        .withColumn("c_acctbal",
          when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_acctbal")))
      Validation(withNulls, schema)
        .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"))
    },

    // --- S1/T1 CSV round-trip with tinyetl cell typing ---
    "q_csv_roundtrip" -> { (s, dir) =>
      val out = scratch("csv_rt")
      t(s, dir, "lineitem").write.mode("overwrite")
        .option("header", "true").csv(out)
      CellInference.readCsv(s, out)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax"), col("l_returnflag"),
          col("l_linestatus"), col("l_shipdate"))
    },

    // --- S2/T2 JSON round-trip (stringify-nested + date-sniff) ---
    "q_json_roundtrip" -> { (s, dir) =>
      val out = scratch("json_rt")
      t(s, dir, "nation").write.mode("overwrite").json(out)
      CellInference.readJson(s, out)
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    },

    // --- S4/T4 Avro round-trip via the hand-rolled distributed connector ---
    "q_avro_roundtrip" -> { (s, dir) =>
      val out = scratch("avro_rt")
      AvroConnector.write(t(s, dir, "orders"), out)
      AvroConnector.read(s, out)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"), col("o_orderdate"), col("o_orderpriority"))
    },

    // --- U1 engine spine: read csv → inline transform → write parquet ---
    "q_engine_transfer" -> { (s, dir) =>
      val csvDir = scratch("engine_csv")
      val outDir = scratch("engine_out")
      t(s, dir, "part").write.mode("overwrite")
        .option("header", "true").csv(csvDir)
      val cfg = graft.engine.JobConfig(
        source = s"$csvDir/*.csv",
        target = s"$outDir.parquet",
        transform = graft.engine.TransformSpec(
          inline = Some("retail_cents=row.p_retailprice * 100; " +
            "brand_lc=string.lower(row.p_brand)")),
        truncate = true)
      new graft.engine.TransferEngine(cfg).execute(s)
      s.read.parquet(s"$outDir.parquet")
        .select(col("p_partkey"), col("retail_cents"), col("brand_lc"))
    }
  )

  def oracleSql: Map[String, String] = Map(
    "q_agg_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_transform_inline" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  l_extendedprice * (1 - l_discount) AS gross,
        |  upper(l_returnflag) AS flag_up
        |FROM lineitem""".stripMargin,

    "q_transform_script" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  l_extendedprice * (1 - l_discount) AS disc_price,
        |  (l_extendedprice * (1 - l_discount)) * (1 + l_tax) AS charged
        |FROM lineitem""".stripMargin,

    "q_filter_rows" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_quantity
        |FROM lineitem WHERE l_quantity > 25 AND l_returnflag = 'R'""".stripMargin,

    "q_lua_patterns" ->
      """SELECT c_custkey, regexp_replace(c_name, '[^0-9]', '', 'g') AS digits,
        |  lower(c_mktsegment) AS seg_lower
        |FROM customer""".stripMargin,

    "q_multiformat_dates" ->
      """SELECT o_orderkey,
        |  date_trunc('day', o_orderdate) AS parsed_us,
        |  o_orderdate AS parsed_iso,
        |  date_trunc('day', o_orderdate) AS parsed_eu
        |FROM orders""".stripMargin,

    "q_validate_defaults" ->
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal < 0 THEN 0.0 ELSE c_acctbal END AS c_acctbal,
        |  c_mktsegment
        |FROM customer""".stripMargin,

    "q_csv_roundtrip" ->
      """SELECT l_orderkey, l_partkey, l_suppkey,
        |  CAST(l_linenumber AS BIGINT) AS l_linenumber, l_quantity,
        |  l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
        |  l_shipdate
        |FROM lineitem""".stripMargin,

    "q_json_roundtrip" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
        |  CAST(n_regionkey AS BIGINT) AS n_regionkey
        |FROM nation""".stripMargin,

    "q_avro_roundtrip" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders""".stripMargin,

    "q_engine_transfer" ->
      """SELECT CAST(p_partkey AS BIGINT) AS p_partkey,
        |  p_retailprice * 100 AS retail_cents,
        |  lower(p_brand) AS brand_lc
        |FROM part""".stripMargin
  )
}
