package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite (the Deequ/"expectations"
  * pattern, reduced to its engine core): a list of typed checks compiles
  * into as few distributed passes as the check mix allows, and the
  * result is a small frame — one row per check — with the measured
  * metric and a pass/fail verdict. The reference has no quality gate;
  * every real 100 TB ingest does (beyond-reference operator, same
  * first-class treatment as the LLM-pipeline family).
  *
  * Scale shape, by check family:
  *  - ROW-LEVEL checks (not_null / bounds / in_set / matches) all ride
  *    ONE aggregation over the table — a single scan, partial aggs
  *    map-side, one tiny result row — no matter how many checks. A
  *    NULL cell fails its predicate (compliance counts it against the
  *    metric), matching the "fraction of rows that satisfy" reading.
  *  - UNIQUE checks each run a keys-only two-stage aggregation
  *    (groupBy key → count, then one global agg). Deliberately NOT a
  *    count(DISTINCT ...) inside the shared row-level agg: that plans
  *    an Expand that doubles every scanned row, the exact 2× a 100 TB
  *    scan cannot afford.
  *  - FOREIGN-KEY checks aggregate fact keys first (keys-only shuffle,
  *    counts ride along), then anti-join the dim's distinct keys — the
  *    violation side is bounded by the distinct-key count, never the
  *    fact row count, and AQE broadcasts the dim when it fits.
  *
  * Verdict: passed = metric >= minFrac, compared on the UNROUNDED
  * ratio (two equal long counts divide to bit-identical doubles in any
  * IEEE engine, so the comparison replays exactly in the oracle).
  */
object QualityChecks {

  sealed trait Check {
    /** Minimum fraction of rows that must comply for the check to pass. */
    def minFrac: Double
    def name: String
    def target: String
  }
  /** Fraction of rows with a non-null `column`. */
  final case class NotNull(column: String, minFrac: Double = 1.0)
      extends Check { def name = "not_null"; def target = column }
  /** Fraction of rows with `column` in [min, max] (null fails). */
  final case class Bounds(column: String, min: Double, max: Double,
                          minFrac: Double = 1.0)
      extends Check { def name = "bounds"; def target = column }
  /** Fraction of rows with `column` in the literal value set. */
  final case class InSet(column: String, values: Seq[String],
                         minFrac: Double = 1.0)
      extends Check { def name = "in_set"; def target = column }
  /** Fraction of rows whose `column` matches the anchored regex. */
  final case class Matches(column: String, regex: String,
                           minFrac: Double = 1.0)
      extends Check { def name = "matches"; def target = column }
  /** distinct(columns) / count(*) — 1.0 means fully unique. */
  final case class Unique(columns: Seq[String], minFrac: Double = 1.0)
      extends Check { def name = "unique"; def target = columns.mkString(",") }
  /** Fraction of rows whose `column` exists in `dim.dimColumn`. */
  final case class ForeignKey(column: String, dim: DataFrame,
                              dimColumn: String, minFrac: Double = 1.0)
      extends Check { def name = "foreign_key"; def target = column }

  private def q(c: String): Column = col("`" + c.replace("`", "``") + "`")

  private def compliance(pred: Column): Column =
    avg(when(coalesce(pred, lit(false)), 1.0).otherwise(0.0))

  /** Run every check; returns (check, target, metric, threshold, passed),
    * one row per check, ordered by (check, target) for determinism. */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "quality_checks needs at least one check")
    val rowLevel = checks.collect {
      case c: NotNull => (c: Check, q(c.column).isNotNull)
      case c: Bounds  => (c: Check,
        q(c.column) >= lit(c.min) && q(c.column) <= lit(c.max))
      case c: InSet   => (c: Check, q(c.column).isin(c.values: _*))
      case c: Matches => (c: Check, regexp_like(q(c.column), lit(c.regex)))
    }

    // one scan, one agg row, then unpivot via inline(array(struct...))
    val rowLevelResult: Option[DataFrame] =
      if (rowLevel.isEmpty) None
      else {
        val aggs = rowLevel.zipWithIndex.map { case ((_, pred), i) =>
          compliance(pred).as(s"__m$i")
        }
        val one = df.agg(aggs.head, aggs.tail: _*)
        val rows = rowLevel.zipWithIndex.map { case ((c, _), i) =>
          struct(lit(c.name).as("check"), lit(c.target).as("target"),
            col(s"__m$i").as("metric"), lit(c.minFrac).as("threshold"))
        }
        Some(one.select(inline(array(rows: _*))))
      }

    val uniqueResults = checks.collect { case c: Unique =>
      df.groupBy(c.columns.map(q): _*).agg(count(lit(1)).as("__n"))
        .agg((count(lit(1)).cast("double") / sum(col("__n"))).as("metric"))
        .select(lit(c.name).as("check"), lit(c.target).as("target"),
          col("metric"), lit(c.minFrac).as("threshold"))
    }

    val fkResults = checks.collect { case c: ForeignKey =>
      val factKeys = df.groupBy(q(c.column).as("__k"))
        .agg(count(lit(1)).as("__n"))
      val missing = factKeys
        .join(c.dim.select(q(c.dimColumn).as("__k")).distinct(),
          Seq("__k"), "left_anti")
        .agg(coalesce(sum(col("__n")), lit(0L)).as("__miss"))
      val total = df.agg(count(lit(1)).as("__total"))
      missing.crossJoin(total)
        .select(lit(c.name).as("check"), lit(c.target).as("target"),
          ((col("__total") - col("__miss")).cast("double") / col("__total"))
            .as("metric"),
          lit(c.minFrac).as("threshold"))
    }

    val all = (rowLevelResult.toSeq ++ uniqueResults ++ fkResults)
      .reduce(_.unionByName(_))
    all
      .withColumn("passed", col("metric") >= col("threshold"))
      .orderBy(col("check"), col("target"))
  }

  /** Parse a YAML rules document into checks — the CLI/CI surface
    * (`graft check SOURCE --rules rules.yaml`). Shape:
    *
    * {{{
    * checks:
    *   - type: not_null
    *     column: l_shipdate
    *     min_frac: 0.99        # optional, default 1.0
    *   - type: bounds
    *     column: l_quantity
    *     min: 1
    *     max: 50
    *   - type: in_set
    *     column: l_returnflag
    *     values: [A, N, R]
    *   - type: matches
    *     column: l_comment
    *     regex: "^[ -~]*$"
    *   - type: unique
    *     columns: [l_orderkey, l_linenumber]
    *   - type: foreign_key
    *     column: l_orderkey
    *     ref: /data/orders.parquet     # any readable source URI
    *     ref_column: o_orderkey
    * }}}
    *
    * `resolveRef` turns a foreign-key `ref` URI into a frame (the CLI
    * passes the connector factory). Malformed rules raise
    * [[graft.core.GraftError.Configuration]] with the failing entry's
    * index — fail at load, not mid-job. */
  def fromYaml(yaml: String,
               resolveRef: String => DataFrame): Seq[Check] = {
    import scala.jdk.CollectionConverters._
    def bad(msg: String) = throw graft.core.GraftError.Configuration(msg)
    val root =
      try new org.yaml.snakeyaml.Yaml()
        .load[java.util.Map[String, Object]](yaml)
      catch { case e: Exception => bad(s"rules YAML does not parse: ${e.getMessage}") }
    if (root == null || !root.containsKey("checks"))
      bad("rules YAML needs a top-level 'checks:' list")
    val entries = root.get("checks") match {
      case l: java.util.List[_] => l.asScala.toSeq
      case _ => bad("'checks:' must be a list")
    }
    if (entries.isEmpty) bad("'checks:' list is empty")
    entries.zipWithIndex.map {
      case (m: java.util.Map[_, _], i) =>
        val e = m.asInstanceOf[java.util.Map[String, Object]].asScala
        def str(k: String): String = e.get(k) match {
          case Some(s: String) if s.nonEmpty => s
          case _ => bad(s"check #${i + 1}: needs a '$k' string")
        }
        def num(k: String): Double = e.get(k) match {
          case Some(n: Number) => n.doubleValue()
          case _ => bad(s"check #${i + 1}: needs a numeric '$k'")
        }
        val minFrac = e.get("min_frac") match {
          case Some(n: Number) =>
            val f = n.doubleValue()
            if (f < 0 || f > 1)
              bad(s"check #${i + 1}: min_frac must be in [0,1], got $f")
            f
          case Some(_) => bad(s"check #${i + 1}: min_frac must be a number")
          case None => 1.0
        }
        str("type") match {
          case "not_null" => NotNull(str("column"), minFrac)
          case "bounds" => Bounds(str("column"), num("min"), num("max"), minFrac)
          case "in_set" => e.get("values") match {
            case Some(l: java.util.List[_]) if !l.isEmpty =>
              InSet(str("column"), l.asScala.map(String.valueOf).toSeq, minFrac)
            case _ => bad(s"check #${i + 1}: in_set needs a 'values' list")
          }
          case "matches" => Matches(str("column"), str("regex"), minFrac)
          case "unique" => e.get("columns") match {
            case Some(l: java.util.List[_]) if !l.isEmpty =>
              Unique(l.asScala.map(String.valueOf).toSeq, minFrac)
            case _ => bad(s"check #${i + 1}: unique needs a 'columns' list")
          }
          case "foreign_key" =>
            ForeignKey(str("column"), resolveRef(str("ref")),
              str("ref_column"), minFrac)
          case t => bad(s"check #${i + 1}: unknown check type '$t' " +
            "(not_null|bounds|in_set|matches|unique|foreign_key)")
        }
      case (_, i) => bad(s"check #${i + 1}: must be a mapping")
    }
  }
}
