package graft.olap

/** Named formatters and typed user-defined MDX functions — the
  * Spark-native re-expression of the reference's schema-level UDF /
  * formatter declaration surface (lib/mondrian/olap/schema_udf.rb:64-261;
  * behavior pinned by schema_definition_test.rb:900-1139,1173-1258).
  *
  * Design: the reference compiles Ruby blocks into JVM classes the
  * Mondrian evaluator calls per cell. Here, SCALAR UDFs are macros over
  * Spark SQL fragments — they expand into the calc-member expression and
  * stay inside whole-stage codegen (the functions-not-UDFs rule), so a
  * UDF used in a 100 TB aggregation costs nothing over the inline
  * expression. Member/set/hierarchy/level-typed UDFs receive plan-time
  * metadata handles (the analog of the reference's `call_with_evaluator`
  * schema-reader access): they run once per query against
  * dimension-bounded member frames, never against the fact.
  *
  * Formatters are presentation functions applied at the Result boundary
  * (the same place the reference's CellFormatter/MemberFormatter
  * interfaces run) — the cell grid is axis-sized by construction.
  */

/** Typed UDF parameter/return types (schema_udf.rb:120-135 UDF_SCALAR_TYPES
  * + UDF_OTHER_TYPES; Tuple/TupleSet fold into Member/MemberSet here — a
  * tuple is a member vector and lowers the same way).
  */
sealed trait UdfType
object UdfType {
  case object Numeric extends UdfType
  case object Str extends UdfType
  case object Bool extends UdfType
  case object DateTime extends UdfType
  case object Scalar extends UdfType
  case object Member extends UdfType
  case object MemberSet extends UdfType
  case object Hierarchy extends UdfType
  case object Level extends UdfType

  def isScalar(t: UdfType): Boolean = t match {
    case Numeric | Str | Bool | DateTime | Scalar => true
    case _ => false
  }
}

/** Invocation syntax (schema_udf.rb VALID_SYNTAX_TYPES): Function =
  * `F(args)`, Property = `obj.F`, Method = `obj.F(args)`.
  */
sealed trait UdfSyntax
object UdfSyntax {
  case object Function extends UdfSyntax
  case object Property extends UdfSyntax
  case object Method extends UdfSyntax
}

/** Arguments handed to a UDF body at MDX-lowering time. */
sealed trait UdfArg
/** A scalar argument: a Spark SQL fragment (already-lowered MDX scalar
  * expression — measure refs resolved, sub-functions expanded).
  */
final case class ScalarArg(sql: String) extends UdfArg
/** A member argument. `nameSql` is a SQL fragment yielding the member's
  * name in the current cell context (`CurrentMember` lowers to the
  * axis's deepest level column for the dimension); `path` is set when
  * the member was written as an explicit path — then plan-time metadata
  * (children, properties) is reachable through the context.
  */
final case class MemberArg(dim: BoundDim, nameSql: String,
    path: Option[Seq[Any]]) extends UdfArg
final case class SetArg(set: SetExpr) extends UdfArg
final case class HierarchyArg(dim: BoundDim) extends UdfArg
final case class LevelArg(dim: BoundDim, level: String) extends UdfArg

/** What a UDF body produces: a SQL fragment (scalar returns — spliced
  * into the surrounding expression, codegen'd with it) or a set
  * expression (member-set returns — composes with every set operator).
  */
sealed trait UdfResult
final case class SqlResult(sql: String) extends UdfResult
final case class SetResult(set: SetExpr) extends UdfResult

object UdfResult {
  /** SQL string literal from a driver-computed value. */
  def lit(s: String): SqlResult = SqlResult("'" + s.replace("'", "''") + "'")
}

/** Plan-time evaluator access for UDF bodies (the reference's
  * `call_with_evaluator` + schema reader, schema_udf.rb:167-170,
  * 986-1006 in the tests). All helpers read dimension member frames —
  * bounded by dimension cardinality, never the fact.
  */
final class UdfContext(val cube: BoundCube) {

  private def planner = new Planner(cube)

  private def orderedNames(frame: org.apache.spark.sql.DataFrame,
      d: BoundDim, depth: Int): Seq[String] = {
    import org.apache.spark.sql.functions.col
    val ords = d.levelsTo(depth).map(l => col(l.ordinal).asc)
    frame.orderBy(ords: _*).select(col(d.levels(depth).col))
      .collect().map(r => String.valueOf(r.get(0))).toSeq
  }

  /** Member names of a set, in hierarchical order (deepest level of the
    * set's last dimension).
    */
  def memberNames(set: SetExpr): Seq[String] = {
    val a = planner.evalSet(set, Nil)
    val ad = a.dims.last
    orderedNames(a.members, ad.d, ad.depth)
  }

  def firstMemberName(set: SetExpr): String = memberNames(set).head

  /** Child member names under `path` — the evaluator's
    * getMemberChildren. An empty path means children of the implicit
    * all member: the first level's members.
    */
  def childrenNames(dim: BoundDim, path: Seq[Any]): Seq[String] =
    if (path.isEmpty) memberNames(LevelMembers(dim.name, dim.levels.head.name))
    else memberNames(Children(dim.name, path))

  /** All member names of a level — the evaluator's getLevelMembers. */
  def levelMemberNames(dim: BoundDim, level: String): Seq[String] =
    memberNames(LevelMembers(dim.name, level))
}

/** A typed user-defined MDX function (schema_udf.rb:64-213): referenced
  * from MDX by `name` with the declared syntax; `body` runs at lowering
  * time with one [[UdfArg]] per declared parameter.
  */
final case class UdfDef(
    name: String,
    parameters: Seq[UdfType],
    returns: UdfType = UdfType.Scalar,
    syntax: UdfSyntax = UdfSyntax.Function,
    body: (UdfContext, Seq[UdfArg]) => UdfResult)

/** A member as seen by member/property formatters. */
final case class MemberView(dimension: String, level: String, name: Any) {
  def nameString: String = String.valueOf(name)
}

/** Schema-scope registries for named formatters and UDFs (the
  * reference's `user_defined_cell_formatter` / `user_defined_function`
  * schema elements). Lookup is case-insensitive, matching MDX identifier
  * semantics.
  */
final case class SchemaFunctions(
    cellFormatters: Map[String, Any => String] = Map.empty,
    memberFormatters: Map[String, MemberView => String] = Map.empty,
    propertyFormatters: Map[String, (MemberView, String, Any) => String] =
      Map.empty,
    udfs: Map[String, UdfDef] = Map.empty) {

  def withCellFormatter(name: String)(f: Any => String): SchemaFunctions =
    copy(cellFormatters = cellFormatters + (name.toLowerCase -> f))
  def withMemberFormatter(name: String)(
      f: MemberView => String): SchemaFunctions =
    copy(memberFormatters = memberFormatters + (name.toLowerCase -> f))
  def withPropertyFormatter(name: String)(
      f: (MemberView, String, Any) => String): SchemaFunctions =
    copy(propertyFormatters = propertyFormatters + (name.toLowerCase -> f))
  def withUdf(u: UdfDef): SchemaFunctions =
    copy(udfs = udfs + (u.name.toLowerCase -> u))

  def cellFormatter(name: String): Option[Any => String] =
    cellFormatters.get(name.toLowerCase)
  def memberFormatter(name: String): Option[MemberView => String] =
    memberFormatters.get(name.toLowerCase)
  def propertyFormatter(
      name: String): Option[(MemberView, String, Any) => String] =
    propertyFormatters.get(name.toLowerCase)
  def udf(name: String): Option[UdfDef] = udfs.get(name.toLowerCase)
}

object SchemaFunctions {
  val empty: SchemaFunctions = SchemaFunctions()
}
