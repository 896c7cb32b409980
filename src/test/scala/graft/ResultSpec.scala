package graft

import graft.olap._

/** Cell-set Result, role policies, and metadata member lookup specs. */
class ResultSpec extends SparkSpec {

  private lazy val cube = Cubes.sales(spark, Sf)

  test("Result exposes axis positions, transposition, formatted values") {
    val r = Query.from(cube)
      .columns("revenue", "sum_qty")
      .rows(LevelMembers("customer", "region"))
      .executeResult()
    assert(r.columnNames === Seq("revenue", "sum_qty"))
    assert(r.rowAxisNames === Seq("cr_region"))
    assert(r.rowCount > 0 && r.columnCount === 2)
    // values(1) = row-major (default); values(0) = transposed
    assert(r.values() === r.values(1))
    assert(r.values(0).length === 2)
    assert(r.values(0).head.length === r.rowCount)
    // revenue has a '#,##0.00' format string → grouped decimal text
    val fv = r.formattedValues.head.head
    assert(fv.matches("[0-9,]+\\.[0-9]{2}"), s"formatted: $fv")
    assert(r.toHtml.startsWith("<table>") && r.toHtml.contains("<td>"))
  }

  test("HTML table sink renders golden 1- and 2-axis grids") {
    // golden over a hand-built Result (result.rb:66-110): deterministic
    // markup, formatted cells, member captions
    val oneAxis = new Result(
      columnNames = Seq("revenue"),
      rowAxis = Seq(Seq("EUROPE"), Seq("ASIA")),
      rowAxisNames = Seq("cr_region"),
      cells = Seq(Seq(BigDecimal(1234.5)), Seq(null)),
      formats = Map("revenue" -> "#,##0.00"))
    assert(oneAxis.toHtml ===
      "<table><thead><tr><th>cr_region</th><th>revenue</th></tr></thead>" +
        "<tbody>" +
        "<tr><td>EUROPE</td><td>1,234.50</td></tr>" +
        "<tr><td>ASIA</td><td></td></tr>" +
        "</tbody></table>")
    val twoAxis = new Result(
      columnNames = Seq("qty", "orders"),
      rowAxis = Seq(Seq("EUROPE", "NATION_1"), Seq("EUROPE", "NATION_3")),
      rowAxisNames = Seq("cr_region", "cr_nation"),
      cells = Seq(Seq(7L, 2L), Seq(9L, 4L)),
      formats = Map.empty)
    assert(twoAxis.toHtml ===
      "<table><thead><tr><th>cr_region</th><th>cr_nation</th>" +
        "<th>qty</th><th>orders</th></tr></thead><tbody>" +
        "<tr><td>EUROPE</td><td>NATION_1</td><td>7</td><td>2</td></tr>" +
        "<tr><td>EUROPE</td><td>NATION_3</td><td>9</td><td>4</td></tr>" +
        "</tbody></table>")
    // an engine-produced result renders the same shape end-to-end
    val r = Query.from(cube).columns("count_order")
      .rows(LevelMembers("customer", "region")).executeResult()
    assert(r.toHtml.startsWith("<table><thead>") &&
      "<tr>".r.findAllIn(r.toHtml).length == 1 + r.rowCount)
  }

  test("calc-member $caption drives the column's display caption; " +
      "the name stays the addressable identity") {
    val r = Query.from(cube)
      .withMember(CalcMember("rev2", ExprCalc("revenue * 2"),
        properties = Seq("caption" -> "Double Revenue")))
      .columns("revenue", "rev2")
      .rows(LevelMembers("customer", "region"))
      .executeResult()
    assert(r.columnNames === Seq("revenue", "rev2"))
    assert(r.columnCaption("rev2") === "Double Revenue")
    assert(r.columnCaption("revenue") === "revenue") // fallback = name
    assert(r.toHtml.contains("<th>Double Revenue</th>"))
    assert(!r.toHtml.contains("<th>rev2</th>"))
  }

  test("PAGES axis surfaces as page sub-results") {
    val r = Query.from(cube)
      .columns("revenue")
      .rows(LevelMembers("returnflag", "returnflag"))
      .pages(LevelMembers("customer", "region"))
      .executeResult()
    assert(r.pageAxisNames === Seq("cr_region"))
    assert(r.pageCount === 5)
    val p0 = r.page(0)
    assert(p0.rowAxisNames === Seq("l_returnflag"))
    assert(p0.rowCount === 3)
    assert(p0.pageAxisNames.isEmpty)
    // page cells are the matching slice of the full grid
    assert(r.rowCount === 15)
  }

  test("CHAPTERS and SECTIONS fold as outer page-major axes") {
    val r = Query.from(cube).columns("count_order")
      .rows(LevelMembers("returnflag", "returnflag"))
      .pages(LevelMembers("customer", "region"))
      .chapters(LevelMembers("linestatus", "linestatus"))
      .executeResult()
    // chapters vary slower than pages: page key = (chapter, page)
    assert(r.pageAxisNames === Seq("l_linestatus", "cr_region"))
    assert(r.rowCount === 2 * 5 * 3)
    assert(r.pageCount === 10)
    assert(r.page(0).rowCount === 3)
  }

  test("Full rollup policy restricts axes but not totals") {
    val partial = cube.withRole(Role("p",
      Seq("customer" -> Seq("EUROPE"))))
    val full = cube.withRole(Role("f",
      Seq("customer" -> Seq("EUROPE")), RollupPolicy.Full))
    def total(c: BoundCube): BigDecimal =
      Query.from(c).columns("revenue")
        .rows(LevelMembers("returnflag", "returnflag"))
        .execute().collect().map(r => BigDecimal(r.getDecimal(1))).sum
    val all = total(cube)
    assert(total(full) === all,
      "Full policy totals must include all data")
    assert(total(partial) < all,
      "Partial policy totals must reflect only granted members")
    // both policies hide non-granted members from axes
    Seq(partial, full).foreach { c =>
      val regions = Query.from(c).columns("revenue")
        .rows(LevelMembers("customer", "region"))
        .execute().collect().map(_.getString(0)).toSet
      assert(regions === Set("EUROPE"))
    }
  }

  test("union roles merge grants as a union of subtrees") {
    val u = Role.union(
      Role("eu", Seq("customer" -> Seq("EUROPE"))),
      Role("asia", Seq("customer" -> Seq("ASIA"))))
    val regions = Query.from(cube.withRole(u)).columns("revenue")
      .rows(LevelMembers("customer", "region"))
      .execute().collect().map(_.getString(0)).toSet
    assert(regions === Set("EUROPE", "ASIA"))
  }

  test("union role level bounds widen to any member role's range") {
    val topOnly = Role("toponly", Seq("customer" -> Seq("EUROPE")),
      levelBounds = Map("customer" -> Seq((None, Some("region")))))
    val midOnly = Role("midonly", Seq("customer" -> Seq("EUROPE")),
      levelBounds =
        Map("customer" -> Seq((Some("nation"), Some("nation")))))
    def members(c: BoundCube, lvl: String) =
      Query.from(c).columns("revenue")
        .rows(LevelMembers("customer", lvl))
        .execute().collect()
    // each bounded role alone hides the level outside its range...
    assert(members(cube.withRole(topOnly), "nation").isEmpty)
    assert(members(cube.withRole(midOnly), "region").isEmpty)
    // ...but their union admits both (never narrower than a member
    // role's grant — ADVICE r6 / Mondrian UnionRoleImpl)
    val u = Role.union(topOnly, midOnly)
    assert(members(cube.withRole(u), "nation").nonEmpty)
    assert(members(cube.withRole(u), "region")
      .map(_.getString(0)).toSet === Set("EUROPE"))
  }

  test("withRole rejects over-deep paths and unknown dimensions eagerly") {
    val deep = Role("deep", Seq("customer" -> Seq("EUROPE")),
      denies = Seq("customer" -> Seq("EUROPE", "FRANCE", "a", "b")))
    val e = intercept[IllegalArgumentException] { cube.withRole(deep) }
    assert(e.getMessage.contains("customer") &&
      e.getMessage.contains("4 deep"))
    val unknown = Role("ghost", Seq("nosuchdim" -> Seq("A")))
    val e2 = intercept[IllegalArgumentException] { cube.withRole(unknown) }
    assert(e2.getMessage.contains("nosuchdim"))
  }

  test("member properties surface the extra dimension columns") {
    val md = new CubeMetadata(cube)
    val nations = md.levelMembers("customer", "customer").limit(1)
      .collect()
    val path = nations.head.toSeq.take(3)
    val props = md.memberProperties("customer", path)
    assert(props.contains("c_mktsegment") && props.contains("c_acctbal"))
    assert(md.memberProperties("customer", Seq("NOWHERE")) === Map.empty)
  }

  test("drill-through respects role grants (role-filtered details)") {
    val granted = cube.withRole(Role("eu",
      Seq("customer" -> Seq("EUROPE"))))
    val rows = Query.from(granted)
      .executeDrillThrough(
        returnCols = Seq("l_orderkey", "cr_region"),
        dims = Map("customer" -> "region"))
      .select("cr_region").distinct()
      .collect().map(_.getString(0)).toSet
    assert(rows === Set("EUROPE"),
      "detail rows outside the granted subtree must not be visible")
  }

  test("member lookup by full MDX name") {
    val md = new CubeMetadata(cube)
    assert(md.member("[customer].[EUROPE]") === Some(Seq("EUROPE")))
    assert(md.member("[customer].[NOWHERE]") === None)
    assert(md.member("[time].[1995]") === Some(Seq(1995)))
    assert(md.member("[nope].[x]") === None)
  }
}
