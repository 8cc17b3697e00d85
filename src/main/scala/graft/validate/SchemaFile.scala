package graft.validate

import graft.core.TinyType
import graft.core.TinyType._
import graft.infer.DateFormats

import java.util.{List => JList, Map => JMap}
import scala.jdk.CollectionConverters._

/** YAML schema-file loader — the declarative schema-override +
  * validation surface (`/root/reference/src/schema.rs:63-146`, V1).
  *
  * Shape:
  * {{{
  * columns:
  *   - name: id
  *     type: integer          # string|integer|decimal|boolean|date|datetime|json
  *     nullable: false
  *     pattern: '^[A-Za-z ]+$'   # regex for string columns
  *     default: "0.00"           # typed default applied when missing/null
  * }}}
  */
final case class SchemaColumn(
    name: String,
    tpe: TinyType,
    nullable: Boolean,
    pattern: Option[String],
    default: Option[String]) {

  /** Typed default literal (V3, schema.rs:246-306). */
  def typedDefault: Option[Any] = default.map { d =>
    tpe match {
      case TInteger => d.trim.toLong
      case TDecimal => d.trim.toDouble
      case TBoolean => d.trim.toLowerCase match {
        // schema-file boolean parsing is wider than CSV cells (README.md:681)
        case "true" | "1" | "yes" => true
        case "false" | "0" | "no" => false
        case other => throw graft.core.GraftError.Configuration(s"bad boolean default: $other")
      }
      case TDate | TDateTime =>
        java.sql.Timestamp.from(DateFormats.tryParse(d).getOrElse(
          throw graft.core.GraftError.Configuration(s"unparseable date default: $d")))
      case _ => d
    }
  }
}

final case class SchemaFile(columns: Seq[SchemaColumn]) {
  def toStruct: org.apache.spark.sql.types.StructType =
    TinyType.toStruct(columns.map(c => TinyColumn(c.name, c.tpe, c.nullable)))
}

object SchemaFile {

  def fromFile(path: String): SchemaFile =
    fromYaml(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8))

  def fromYaml(yaml: String): SchemaFile = {
    val root = new org.yaml.snakeyaml.Yaml().load[JMap[String, Object]](yaml)
    if (root == null || !root.containsKey("columns"))
      throw graft.core.GraftError.Configuration(
        "schema file must have a top-level 'columns' list")
    val cols = root.get("columns").asInstanceOf[JList[JMap[String, Object]]]
      .asScala.toSeq.map { m =>
        def str(k: String): Option[String] =
          Option(m.get(k)).map(_.toString)
        val name = str("name").getOrElse(
          throw graft.core.GraftError.Configuration("column missing 'name'"))
        val tpeName = str("type").getOrElse("string")
        val tpe = TinyType.parse(tpeName).getOrElse(
          throw graft.core.GraftError.Configuration(
            s"unknown type '$tpeName' for column '$name'"))
        val nullable = Option(m.get("nullable"))
          .forall(v => v.toString.toBoolean)
        val pattern = str("pattern")
        // validate the regex compiles now, like SchemaFile::validate
        pattern.foreach(java.util.regex.Pattern.compile)
        SchemaColumn(name, tpe, nullable, pattern, str("default"))
      }
    SchemaFile(cols)
  }
}
