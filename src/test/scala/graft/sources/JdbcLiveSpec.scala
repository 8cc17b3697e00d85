package graft.sources

import graft.SparkSpec

/** LIVE JDBC execution against the embedded Derby engine that ships in
  * Spark's own distribution (derby-10.16 on the unmanaged classpath —
  * no network, no external server). The sandbox has no
  * sqlite/postgres/mysql/mssql drivers, so those dialects stay pinned at
  * the unit level (DDL maps, URL routing, coercions), but everything
  * DIALECT-INDEPENDENT in the JDBC path runs for real here: table
  * create-on-write, append vs truncate semantics, the PK-candidate
  * heuristic, the MIN/MAX bounds probe with a partitioned scan, the
  * `query`-as-source mode, and the single-connection fallback. */
class JdbcLiveSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dbDir = {
    val d = tmpDir("derby")
    // keep derby.log inside the repo scratch area
    System.setProperty("derby.system.home", d)
    d
  }
  private def url(db: String) = s"jdbc:derby:$dbDir/$db;create=true"

  test("write creates the table; append appends; truncate overwrites") {
    val uri = s"${url("wdb")}#people"
    Connectors.write(Seq((1L, "ada"), (2L, "grace")).toDF("id", "name"), uri)
    assert(Connectors.read(spark, uri).count() == 2)
    // jdbc targets are appendable (reference semantics)
    Connectors.write(Seq((3L, "edsger")).toDF("id", "name"), uri)
    assert(Connectors.read(spark, uri).count() == 3)
    // truncate → overwrite
    Connectors.write(Seq((9L, "alan")).toDF("id", "name"), uri, truncate = true)
    val rows = Connectors.read(spark, uri).collect()
    assert(rows.length == 1 && rows.head.getAs[String]("name") == "alan")
  }

  /** Fresh per-test events table so tests stay order-independent. */
  private def eventsTable(db: String): String = {
    val uri = s"${url(db)}#events"
    Connectors.write((1L to 200L).map(i => (i, s"v$i")).toDF("id", "payload"),
      uri, truncate = true)
    uri
  }

  test("pk heuristic + MIN/MAX probe parallelize the scan (odbc.rs keyset idea)") {
    val uri = eventsTable("pdb")
    val df = Connectors.read(spark, uri)
    assert(df.count() == 200)
    // the integer `id` column triggers the partitionColumn path: the
    // bounds probe fills lowerBound/upperBound and numPartitions
    // defaults to 8 — a genuinely partitioned JDBC scan, not one cursor
    assert(df.rdd.getNumPartitions == 8,
      s"expected the probed partitioned scan, got ${df.rdd.getNumPartitions}")
    assert(df.agg(org.apache.spark.sql.functions.sum($"id")).head.getLong(0)
      == (1L to 200L).sum)
  }

  test("explicit partition spec passes through; partial specs degrade gracefully") {
    val uri = eventsTable("sdb")
    val full = Connectors.read(spark, uri, Map(
      "partitionColumn" -> "id", "lowerBound" -> "1", "upperBound" -> "200",
      "numPartitions" -> "4"))
    assert(full.rdd.getNumPartitions == 4 && full.count() == 200)
    // upperBound without lowerBound: stripped → single-connection read
    // (previously an IllegalArgumentException deep in Spark)
    val partial = Connectors.read(spark, uri, Map("upperBound" -> "200"))
    assert(partial.count() == 200)
  }

  test("query-as-source mode (mssql.rs custom-query idea, any dialect)") {
    eventsTable("qdb")
    val uri = url("qdb") // no #table needed with a query
    // Derby folds unquoted identifiers to uppercase; Spark created the
    // columns quoted-lowercase, so the custom query quotes them
    val df = Connectors.read(spark, uri, Map(
      "query" -> "SELECT \"id\", \"payload\" FROM events WHERE \"id\" <= 10"))
    assert(df.count() == 10)
  }

  test("no pk candidate → single-connection fallback, never an error") {
    val uri = s"${url("ndb")}#notes"
    Connectors.write(Seq(("a", 1.5), ("b", 2.5)).toDF("label", "score"), uri)
    val df = Connectors.read(spark, uri)
    assert(df.rdd.getNumPartitions == 1 && df.count() == 2)
  }

  test("CLI csv → live jdbc with transform (examples/05-06 shape)") {
    val dir = tmpDir("jdbc_cli")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/in.csv"),
      "id,price\n1,10.5\n2,20.0\n3,0.5\n")
    val uri = s"${url("clidb")}#products"
    val parsed = graft.Main.parse(List(s"$dir/in.csv", uri,
      "--transform", "cents=row.price * 100", "--truncate"))
      .asInstanceOf[graft.Main.Transfer]
    assert(graft.Main.runTransfer(parsed.cfg, None, dryRun = false, "error") == 0)
    val back = Connectors.read(spark, uri)
    assert(back.count() == 3)
    assert(back.filter($"id" === 2L).head.getAs[Double]("cents") == 2000.0)
  }

  test("skip-existing anti-joins against a live jdbc target's keys") {
    val dir = tmpDir("jdbc_skip")
    val uri = s"${url("skipdb")}#items"
    Connectors.write(Seq((1L, "old"), (2L, "old")).toDF("id", "v"), uri,
      truncate = true)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/in.csv"), "id,v\n1,new\n3,new\n")
    val cfg = graft.engine.JobConfig(s"$dir/in.csv", uri, skipExisting = true)
    new graft.engine.TransferEngine(cfg).execute(spark)
    val ids = Connectors.read(spark, uri).select($"id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L), "only the unseen key appends")
  }

  test("transfer engine end-to-end into and out of a live jdbc target") {
    val dir = tmpDir("jdbc_engine")
    sf("nation").write.mode("overwrite").parquet(s"$dir/in.parquet")
    val uri = s"${url("edb")}#nation"
    val cfg = graft.engine.JobConfig(s"$dir/in.parquet", uri,
      transform = graft.engine.TransformSpec(filter = Some("row.n_regionkey < 2")),
      truncate = true)
    val stats = new graft.engine.TransferEngine(cfg).execute(spark)
    val expected = sf("nation").filter($"n_regionkey" < 2).count()
    assert(stats.totalRows == expected)
    assert(Connectors.read(spark, uri).count() == expected)
  }
}
