package graft.transform

import graft.core.GraftError

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{coalesce, col, lit}
import org.apache.spark.sql.types.DataType

/** `--transform-file f.lua` parity (P3, `/root/reference/src/
  * transformer.rs:67-102`, README.md:540-615): a user-authored
  * `function transform(row) ... end` compiled to a declarative Spark
  * plan — no interpreter, no UDF, full Catalyst optimization.
  *
  * Supported surface (the documented one, README.md:566-571 + the
  * nil-filter example at README.md:573-600):
  *  - `local name = expr` / `name = expr` — locals visible to later
  *    statements (materialized at declaration point, so later
  *    `row.x = ...` writes don't retroactively change them);
  *  - `row.field = expr` — mutate/add a row field;
  *  - `local t = {}` + `t.field = expr` — build a result table;
  *  - `if <cond> then return nil end` (or `return {}`), one-line or
  *    block form — drop the row when <cond> is Lua-truthy;
  *  - final `return row` (all fields, README rule 2) / `return t`
  *    (only t's keys, README rule 5 column filtering) /
  *    `return { k = expr, ... }` (inline table, possibly multi-line).
  *
  * Anything outside that surface (loops, elseif/else, nested
  * functions, assignments inside if-blocks) raises a typed
  * [[GraftError.Transform]] naming the offending line — an actionable
  * error instead of silently-wrong output. Arbitrary imperative Lua
  * belongs in [[Transform.rowFn]].
  */
object LuaFile {

  def fromFile(df: DataFrame, path: String): DataFrame = {
    val p = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(p))
      throw GraftError.Configuration(s"Transform file not found: $path")
    apply(df, new String(java.nio.file.Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8))
  }

  private val FunctionRe = """function\s+transform\s*\(\s*(\w+)\s*\)""".r
  private val LocalRe = """local\s+(\w+)\s*=\s*(.+)""".r
  private val AssignFieldRe = """(\w+)\.(\w+)\s*=\s*(.+)""".r
  private val AssignRe = """(\w+)\s*=\s*(.+)""".r
  private val IfOneLineRe = """if\s+(.+?)\s+then\s+return\s+(nil|\{\s*\})\s+end""".r
  private val IfOpenRe = """if\s+(.+?)\s+then""".r
  private val ReturnNilRe = """return\s+(nil|\{\s*\})""".r
  private val IdentOnlyRe = """(\w+)""".r

  def apply(df0: DataFrame, source: String): DataFrame = {
    val lines = cleanLines(source)
    if (lines.isEmpty) throw GraftError.Transform("empty transform file")
    lines.head match {
      case FunctionRe(param) if param == "row" => ()
      case FunctionRe(param) => throw GraftError.Transform(
        s"transform parameter must be named 'row' (got '$param')")
      case other => throw GraftError.Transform(
        s"Lua file must contain a 'transform' function (first statement was '$other')")
    }
    if (lines.last != "end")
      throw GraftError.Transform("transform function is not closed with 'end'")

    var df = df0
    val originalCols = df0.columns.toSeq
    var locals = Map.empty[String, Column]
    var localTypes = Map.empty[String, Option[DataType]]
    var temps = Vector.empty[String]
    var addedRowFields = Vector.empty[String]
    // table locals: name → ordered (field, temp column) pairs; a value of
    // null marks a row-alias (`local r = row`)
    var tables = Map.empty[String, Vector[(String, String)]]
    var rowAliases = Set("row")

    def schemaMap: Map[String, DataType] =
      df.schema.fields.map(f => f.name -> f.dataType).toMap

    def unsupported(line: String, hint: String): Nothing =
      throw GraftError.Transform(
        s"unsupported Lua construct: '$line' ($hint). Supported surface: " +
          "local/name = expr; row.field = expr; local t = {} with " +
          "t.field = expr; 'if <cond> then return nil end' filters; a " +
          "final return of row, a table local, or an inline { ... } " +
          "table. For arbitrary Lua, use Transform.rowFn.")

    def compileExpr(src: String): Column =
      try ExprLang.compile(src, locals, schemaMap, localTypes)
      catch {
        case e: GraftError => throw e
        case e: Exception =>
          throw GraftError.Transform(s"cannot compile '$src': ${e.getMessage}", e)
      }

    def addLocal(name: String, expr: String): Unit = {
      val tmp = s"__lua_$name"
      df = df.withColumn(tmp, compileExpr(expr))
      temps :+= tmp
      locals += name -> col(s"`$tmp`")
      localTypes += name -> df.schema.fields.find(_.name == tmp).map(_.dataType)
    }

    def applyFilter(cond: String): Unit = {
      val p =
        try ExprLang.compilePredicate(cond, schemaMap, locals)
        catch {
          case e: Exception =>
            throw GraftError.Transform(s"cannot compile filter '$cond': ${e.getMessage}", e)
        }
      // Lua: truthy condition → the row is DROPPED; a NULL boolean
      // (nil-ish comparison) is falsy → row kept
      df = df.filter(!coalesce(p, lit(false)))
    }

    def finish(outFields: Seq[(String, Column)]): DataFrame =
      df.select(outFields.map { case (n, c) => c.as(n) }: _*)

    val body = lines.slice(1, lines.length - 1)
    var i = 0
    var result: Option[DataFrame] = None

    while (i < body.length && result.isEmpty) {
      val line = body(i)
      line match {
        // ---- filters ----
        case IfOneLineRe(cond, _) =>
          applyFilter(cond)

        case IfOpenRe(cond) =>
          // block form: body must be exactly `return nil|{}` then `end`
          if (i + 2 >= body.length) unsupported(line, "unterminated if block")
          (body(i + 1), body(i + 2)) match {
            case (ReturnNilRe(_), "end") =>
              applyFilter(cond)
              i += 2
            case _ => unsupported(line,
              "if-blocks may only contain 'return nil' or 'return {}'")
          }

        // ---- return (terminal) ----
        case l if l.startsWith("return") =>
          val expr = gatherReturn(body, i)
          i += expr.extraLines
          result = Some(expr.text match {
            case "row" =>
              val keep = (originalCols ++ addedRowFields).distinct
              finish(keep.map(n => n -> col(s"`$n`")))
            case IdentOnlyRe(name) if rowAliases(name) =>
              val keep = (originalCols ++ addedRowFields).distinct
              finish(keep.map(n => n -> col(s"`$n`")))
            case IdentOnlyRe(name) if tables.contains(name) =>
              finish(tables(name).map { case (f, tmp) => f -> col(s"`$tmp`") })
            case t if t.startsWith("{") && t.endsWith("}") =>
              val inner = t.substring(1, t.length - 1).trim
              if (inner.isEmpty) unsupported(line, "unconditional 'return {}'")
              val fields = Transform.parseAssignments(inner, ',')
              finish(fields.map(a => a.name -> compileExpr(a.expr)))
            case "nil" => unsupported(line, "unconditional 'return nil'")
            case other => unsupported(s"return $other",
              "return must yield row, a declared table, or a { ... } literal")
          })

        // ---- assignments ----
        case LocalRe(name, rhs) if rhs.trim == "{}" =>
          tables += name -> Vector.empty
        case LocalRe(name, rhs) if rhs.trim == "row" =>
          rowAliases += name
        case LocalRe(name, rhs) =>
          addLocal(name, rhs)

        case AssignFieldRe(base, field, rhs) if rowAliases(base) =>
          val existed = df.columns.contains(field)
          df = df.withColumn(field, compileExpr(rhs))
          if (!existed && !originalCols.contains(field)) addedRowFields :+= field

        case AssignFieldRe(base, field, rhs) if tables.contains(base) =>
          val tmp = s"__tbl_${base}_$field"
          df = df.withColumn(tmp, compileExpr(rhs))
          temps :+= tmp
          tables += base -> (tables(base).filterNot(_._1 == field) :+ (field -> tmp))

        case AssignFieldRe(base, _, _) =>
          unsupported(line, s"'$base' is not row or a declared table local")

        case AssignRe(name, rhs) =>
          addLocal(name, rhs)

        case other => unsupported(other, "unrecognized statement")
      }
      i += 1
    }

    result.getOrElse(throw GraftError.Transform(
      "transform function has no reachable final return"))
  }

  /** Strip `--` comments (quote-aware), trim, drop blanks. */
  private def cleanLines(src: String): Vector[String] = {
    if (src.contains("--[["))
      throw GraftError.Transform("block comments --[[ ]] are not supported")
    src.linesIterator.map { raw =>
      val sb = new StringBuilder
      var quote: Char = 0
      var i = 0
      var done = false
      while (i < raw.length && !done) {
        val c = raw.charAt(i)
        if (quote != 0) { sb += c; if (c == quote) quote = 0 }
        else if (c == '\'' || c == '"') { quote = c; sb += c }
        else if (c == '-' && i + 1 < raw.length && raw.charAt(i + 1) == '-') done = true
        else sb += c
        i += 1
      }
      sb.toString.trim
    }.filter(_.nonEmpty).toVector
  }

  private case class ReturnExpr(text: String, extraLines: Int)

  /** Collect a possibly multi-line `return { ... }` until braces balance. */
  private def gatherReturn(body: Vector[String], start: Int): ReturnExpr = {
    var text = body(start).stripPrefix("return").trim
    var extra = 0
    def balance(s: String): Int = s.count(_ == '{') - s.count(_ == '}')
    while (balance(text) > 0 && start + extra + 1 < body.length) {
      extra += 1
      text += " " + body(start + extra)
    }
    if (balance(text) > 0)
      throw GraftError.Transform(s"unbalanced braces in return: $text")
    ReturnExpr(text, extra)
  }
}
