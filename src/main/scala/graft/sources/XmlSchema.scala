package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import scala.xml.{Elem, Node, XML}

import graft.olap._

/** Mondrian XML catalog reader — the third schema entry surface
  * alongside the Scala DSL binding (reference: `connection.rb:459-475`
  * loads a schema from an XML file path, XML string, or the Ruby DSL;
  * the DSL itself just renders this XML, `schema.rb:30-54`). A
  * reference user can point their existing `<Schema>` catalog at this
  * engine; only the physical layer changes — a `tables` resolver maps
  * `<Table name="...">` to DataFrames (parquet, JDBC, views) instead
  * of JDBC identifiers.
  *
  * Supported subset (the fixture-exercised surface,
  * `MondrianTest.xml`):
  *  - `<Cube><Table/>` fact binding
  *  - inline `<Dimension foreignKey>` with `<Hierarchy primaryKey
  *    uniqueKeyLevelName>` over a `<Table/>` or snowflake `<Join
  *    leftKey rightKey>` (nested joins allowed); degenerate
  *    dimensions (hierarchy without a table: level columns live on
  *    the fact)
  *  - schema-level shared `<Dimension>` + `<DimensionUsage source
  *    foreignKey>`
  *  - `<Level name column ordinalColumn hideMemberIf approxRowCount>`
  *    with `<Property column dependsOnLevelValue>`
  *  - `<Measure aggregator column|MeasureExpression formatString>`
  *  - `<CalculatedMember>` whose `<Formula>` is arithmetic over
  *    `[Measures].[x]` references (rewritten to measure columns;
  *    richer formulas belong in per-query WITH MEMBER MDX)
  *  - roles / virtual cubes: declare via the Scala surface (Role /
  *    VirtualCube) — not read from XML yet.
  */
object XmlSchema {

  /** Load every `<Cube>` of a Mondrian XML catalog string. */
  def load(xml: String, tables: String => DataFrame): Seq[BoundCube] =
    loadElem(XML.loadString(xml), tables)

  /** Load from a file path (the reference's `catalog:` option). */
  def loadFile(path: String, tables: String => DataFrame): Seq[BoundCube] =
    loadElem(XML.loadFile(path), tables)

  /** Convenience resolver over a directory of parquet tables
    * (`<Table name="x">` → `dir/x.parquet`).
    */
  def parquetResolver(spark: SparkSession, dir: String): String => DataFrame =
    name => spark.read.parquet(s"$dir/$name.parquet")

  private def loadElem(root: Elem,
      tables: String => DataFrame): Seq[BoundCube] = {
    require(root.label == "Schema", s"expected <Schema>, got <${root.label}>")
    val shared = (root \ "Dimension").map(d => attr(d, "name") -> d).toMap
    (root \ "Cube").map(cube => bindCube(cube, shared, tables))
  }

  private def attr(n: Node, name: String): String = {
    val v = n \@ name
    require(v.nonEmpty, s"<${n.label}> requires attribute '$name'")
    v
  }
  private def attrOpt(n: Node, name: String): Option[String] =
    Option(n \@ name).filter(_.nonEmpty)

  private def bindCube(cube: Node, shared: Map[String, Node],
      tables: String => DataFrame): BoundCube = {
    val cubeName = attr(cube, "name")
    val factTables = cube \ "Table"
    require(factTables.nonEmpty, s"cube '$cubeName' has no <Table>")
    val fact = tables(attr(factTables.head, "name"))
    val dims = (cube \ "_").collect {
      case d if d.label == "Dimension" =>
        bindDim(d, attr(d, "foreignKey"), fact, tables)
      case u if u.label == "DimensionUsage" =>
        val src = attr(u, "source")
        val node = shared.getOrElse(src, throw new IllegalArgumentException(
          s"cube '$cubeName': DimensionUsage source '$src' not declared"))
        bindDim(node, attr(u, "foreignKey"), fact, tables,
          nameOverride = attrOpt(u, "name"))
    }
    val measures = (cube \ "Measure").map(bindMeasure)
    val calcs = (cube \ "CalculatedMember").map(bindCalc(_, measures))
    val bound = BoundCube(cubeName, fact, dims, measures,
      calcMembers = calcs,
      defaultMeasure = attrOpt(cube, "defaultMeasure"))
    bound.validate()
    bound
  }

  /** `<Table/>` or recursive `<Join leftKey rightKey>` → one flat
    * (snowflake-prejoined) dimension frame. Column names must be
    * unambiguous across the join — the usual star-schema convention
    * (and the reference's, where Level@table disambiguates; a flat
    * DataFrame needs unique names instead).
    */
  private def joinTree(n: Node, tables: String => DataFrame): DataFrame =
    n.label match {
      case "Table" => tables(attr(n, "name"))
      case "Join" =>
        val kids = (n \ "_").filter(c =>
          c.label == "Table" || c.label == "Join")
        require(kids.length == 2, "<Join> needs exactly two children")
        val left = joinTree(kids(0), tables)
        val right = joinTree(kids(1), tables)
        left.join(right,
          left(attr(n, "leftKey")) === right(attr(n, "rightKey")))
      case other =>
        throw new IllegalArgumentException(s"unexpected <$other> in join")
    }

  private def bindDim(d: Node, foreignKey: String, fact: DataFrame,
      tables: String => DataFrame,
      nameOverride: Option[String] = None): BoundDim = {
    val dimName = nameOverride.getOrElse(attr(d, "name"))
    val h = (d \ "Hierarchy").headOption.getOrElse(
      throw new IllegalArgumentException(
        s"dimension '$dimName' has no <Hierarchy>"))
    val levelNodes = h \ "Level"
    require(levelNodes.nonEmpty, s"dimension '$dimName' has no levels")
    val levels = levelNodes.map { l =>
      val props = (l \ "Property").map(p => attr(p, "column"))
      val dependent = (l \ "Property")
        .filter(p => (p \@ "dependsOnLevelValue") == "true")
        .map(p => attr(p, "column")).toSet
      BoundLevel(attr(l, "name"), attr(l, "column"),
        ordCol = attrOpt(l, "ordinalColumn"),
        hideMemberIf = (l \@ "hideMemberIf") match {
          case "IfBlankName"   => HideIf.IfBlankName
          case "IfParentsName" => HideIf.IfParentsName
          case _               => HideIf.Never
        },
        approxRowCount = attrOpt(l, "approxRowCount").map(_.toLong),
        dependentProps = dependent)
    }
    val joinNodes = (h \ "_").filter(c =>
      c.label == "Table" || c.label == "Join")
    if (joinNodes.isEmpty) {
      // degenerate: level columns live on the fact (the reference's
      // private-dimension-off-the-fact pattern)
      val cols = levels.flatMap(l => Seq(l.col) ++ l.ordCol).distinct
      BoundDim(dimName,
        foreignKey = levels.last.col, primaryKey = levels.last.col,
        levels = levels,
        df = fact.select(cols.map(col): _*).distinct(),
        degenerate = true,
        uniqueKeyLevel = attrOpt(h, "uniqueKeyLevelName"))
    } else {
      val df = joinTree(joinNodes.head, tables)
      BoundDim(dimName, foreignKey = foreignKey,
        primaryKey = attr(h, "primaryKey"),
        levels = levels, df = df,
        uniqueKeyLevel = attrOpt(h, "uniqueKeyLevelName"))
    }
  }

  private def bindMeasure(m: Node): Measure = {
    val agg = (m \@ "aggregator") match {
      case "" | "sum"      => Agg.Sum
      case "count"         => Agg.Count
      case "min"           => Agg.Min
      case "max"           => Agg.Max
      case "avg"           => Agg.Avg
      case "distinct-count" => Agg.DistinctCount
      case other => throw new IllegalArgumentException(
        s"unsupported aggregator '$other'")
    }
    val sql = (m \ "MeasureExpression" \ "SQL").headOption
      .map(_.text.trim)
      .orElse(attrOpt(m, "column"))
      .getOrElse(throw new IllegalArgumentException(
        s"measure '${attr(m, "name")}' needs column or MeasureExpression"))
    Measure(attr(m, "name"), agg, sql,
      formatString = attrOpt(m, "formatString"))
  }

  /** `[Measures].[x]` references rewrite to the measure's column name;
    * the rest of the formula passes through as Spark SQL arithmetic —
    * covers the schema-level arithmetic calc members the fixture
    * declares (Profit = sales - cost). Formulas that navigate
    * dimensions belong in per-query WITH MEMBER MDX.
    */
  private def bindCalc(c: Node, measures: Seq[Measure]): CalcMember = {
    val formula = (c \ "Formula").headOption.map(_.text.trim)
      .orElse(attrOpt(c, "formula"))
      .getOrElse(throw new IllegalArgumentException(
        s"calculated member '${attr(c, "name")}' has no formula"))
    val sql = "\\[Measures\\]\\.\\[([^\\]]+)\\]".r
      .replaceAllIn(formula, m => s"`${m.group(1)}`")
    CalcMember(attr(c, "name"), ExprCalc(sql),
      formatString = attrOpt(c, "formatString"))
  }
}
