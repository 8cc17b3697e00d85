package graft.transform

import graft.SparkSpec
import graft.core.GraftError

class LuaFileSpec extends SparkSpec {
  import spark.implicits._

  private val people = Seq(
    (1L, "Ada", "Lovelace", "ada@x.com", 36L, "United States"),
    (2L, "Bob", "Minor", "bob@x.com", 15L, "United States"),
    (3L, "Eve", "NoMail", null, 30L, "United States"),
    (4L, "Kim", "Abroad", "kim@x.com", 40L, "France")
  ).toDF("id", "first_name", "last_name", "email", "age", "country")

  test("README nil-filter example: filters + row mutation + return row") {
    val lua =
      """function transform(row)
        |    -- Filter out rows with missing data
        |    if not row.email or row.email == "" then
        |        return nil  -- Remove this row
        |    end
        |    if row.age and row.age < 18 then
        |        return nil  -- Remove minors
        |    end
        |    if row.country ~= "United States" then
        |        return nil  -- Keep only US records
        |    end
        |    row.full_name = row.first_name .. ' ' .. row.last_name
        |    return row
        |end""".stripMargin
    val out = LuaFile(people, lua)
    assert(out.columns.toSeq ==
      Seq("id", "first_name", "last_name", "email", "age", "country", "full_name"))
    val rows = out.orderBy($"id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L))
    assert(rows.head.getAs[String]("full_name") == "Ada Lovelace")
  }

  test("return table literal keeps only returned keys (README rule 5)") {
    val lua =
      """function transform(row)
        |  local dbl = row.age * 2
        |  return {
        |    id = row.id,
        |    shout = string.upper(row.first_name),
        |    dbl = dbl
        |  }
        |end""".stripMargin
    val out = LuaFile(people, lua)
    assert(out.columns.toSeq == Seq("id", "shout", "dbl"))
    assert(out.filter($"id" === 2L).head.getAs[String]("shout") == "BOB")
    assert(out.filter($"id" === 2L).head.getAs[Long]("dbl") == 30L)
  }

  test("result-table building: local t = {}; t.f = expr; return t") {
    val lua =
      """function transform(row)
        |  local result = {}
        |  result.key = row.id
        |  result.domain = row.email:match('@(.+)')
        |  return result
        |end""".stripMargin
    val out = LuaFile(people, lua)
    assert(out.columns.toSeq == Seq("key", "domain"))
    assert(out.filter($"key" === 1L).head.getAs[String]("domain") == "x.com")
  }

  test("locals are fixed at declaration point (later row writes don't leak)") {
    val lua =
      """function transform(row)
        |  local before = row.age
        |  row.age = row.age + 100
        |  return { id = row.id, before = before, after = row.age }
        |end""".stripMargin
    val r = LuaFile(people, lua).filter($"id" === 1L).head
    assert(r.getAs[Long]("before") == 36L)
    assert(r.getAs[Long]("after") == 136L)
  }

  test("one-line filter form and 'local r = row' alias") {
    val lua =
      """function transform(row)
        |  if row.age < 18 then return nil end
        |  local r = row
        |  r.checked = true
        |  return r
        |end""".stripMargin
    val out = LuaFile(people, lua)
    assert(out.count() == 3)
    assert(out.columns.contains("checked"))
  }

  test("unsupported constructs raise typed Transform errors naming the line") {
    val loops =
      """function transform(row)
        |  for i = 1, 10 do end
        |  return row
        |end""".stripMargin
    val e1 = intercept[GraftError.Transform](LuaFile(people, loops))
    assert(e1.getMessage.contains("for i = 1, 10 do"))
    assert(e1.getMessage.contains("Transform.rowFn"))

    val assignInIf =
      """function transform(row)
        |  if row.age > 18 then
        |    row.adult = true
        |  end
        |  return row
        |end""".stripMargin
    val e2 = intercept[GraftError.Transform](LuaFile(people, assignInIf))
    assert(e2.getMessage.contains("return nil"))

    val noFn = "local x = 1"
    val e3 = intercept[GraftError.Transform](LuaFile(people, noFn))
    assert(e3.getMessage.contains("'transform' function"))

    intercept[GraftError.Configuration](
      LuaFile.fromFile(people, "/root/repo/target/nonexistent.lua"))
  }

  test("engine runs --transform-file end-to-end (file wins over inline)") {
    val dir = tmpDir("luafile_e2e")
    people.write.mode("overwrite").parquet(s"$dir/in.parquet")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/t.lua"),
      """function transform(row)
        |  if not row.email then return nil end
        |  return { id = row.id, mail = string.lower(row.email) }
        |end""".stripMargin)
    val cfg = graft.engine.JobConfig(
      source = s"$dir/in.parquet", target = s"$dir/out.parquet",
      transform = graft.engine.TransformSpec(
        inline = Some("never=1"), file = Some(s"$dir/t.lua")),
      truncate = true)
    val stats = new graft.engine.TransferEngine(cfg).execute(spark)
    assert(stats.totalRows == 3)
    val out = spark.read.parquet(s"$dir/out.parquet")
    assert(out.columns.toSeq == Seq("id", "mail"))
  }
}
