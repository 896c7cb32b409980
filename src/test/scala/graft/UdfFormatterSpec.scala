package graft

import graft.olap._

/** Typed UDF declaration surface + named formatter registry — mirrors
  * the reference's schema_definition_test.rb:900-1139 ("User defined
  * functions and formatters in Ruby") and :1173-1258 (shared cell
  * formatter), re-expressed over the Sales cube.
  */
class UdfFormatterSpec extends SparkSpec {

  private lazy val cube = Cubes.sales(spark, Sf)
  private lazy val meta = new CubeMetadata(cube)

  // -- scalar function UDF ("should execute user defined function")

  test("function-syntax scalar UDF expands as a SQL macro") {
    val df = Mdx.execute(
      """WITH MEMBER [Measures].[fact6] AS 'Factorial(6)'
        |SELECT {[Measures].[fact6]} ON COLUMNS FROM [Sales]""".stripMargin,
      cube)
    assert(df.collect().head.getDouble(0) == 720.0)
  }

  test("scalar UDFs compose with measures and other functions") {
    val df = Mdx.execute(
      """WITH MEMBER [Measures].[p] AS
        |  'PctOf([Measures].[revenue], [Measures].[revenue])'
        |SELECT {[Measures].[p]} ON COLUMNS FROM [Sales]""".stripMargin,
      cube)
    assert(math.abs(df.collect().head.getDouble(0) - 100.0) < 1e-9)
  }

  // -- member-typed property/method UDFs

  test("member property UDF on CurrentMember uppercases the axis name") {
    val df = Mdx.execute(
      """WITH MEMBER [Measures].[un] AS '[customer].CurrentMember.UpperName'
        |SELECT {[Measures].[un]} ON COLUMNS,
        |  [customer].[region].Members ON ROWS
        |FROM [Sales]""".stripMargin, cube)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getString(1) ==
      r.getString(0).toUpperCase))
  }

  test("member method UDF takes trailing arguments") {
    val df = Mdx.execute(
      """WITH MEMBER [Measures].[un] AS
        |  '[customer].CurrentMember.toUpperName("dummy")'
        |SELECT {[Measures].[un]} ON COLUMNS,
        |  [customer].[region].Members ON ROWS
        |FROM [Sales]""".stripMargin, cube)
    df.collect().foreach(r =>
      assert(r.getString(1) == r.getString(0).toUpperCase))
  }

  test("property UDF on an explicit member path") {
    val df = Mdx.execute(
      """WITH MEMBER [Measures].[un] AS '[customer].[EUROPE].UpperName'
        |SELECT {[Measures].[un]} ON COLUMNS FROM [Sales]""".stripMargin,
      cube)
    assert(df.collect().head.getString(0) == "EUROPE")
  }

  // -- set-typed UDFs ("user defined property/method on set")

  test("set property UDF receives the set expression") {
    val df = Mdx.execute(
      """WITH MEMBER [Measures].[f] AS
        |  '{[customer].[region].Members}.firstUpperName'
        |SELECT {[Measures].[f]} ON COLUMNS FROM [Sales]""".stripMargin,
      cube)
    val first = new UdfContext(cube)
      .firstMemberName(LevelMembers("customer", "region")).toUpperCase
    assert(df.collect().head.getString(0) == first)
  }

  test("set method UDF with trailing argument") {
    val df = Mdx.execute(
      """WITH MEMBER [Measures].[f] AS
        |  '{[customer].[region].Members}.firstToUpperName("x")'
        |SELECT {[Measures].[f]} ON COLUMNS FROM [Sales]""".stripMargin,
      cube)
    assert(df.collect().head.getString(0).nonEmpty)
  }

  // -- hierarchy- and level-typed UDFs (evaluator access)

  test("hierarchy property UDF reads the schema through the context") {
    val df = Mdx.execute(
      """WITH MEMBER [Measures].[f] AS '[customer].firstChildUpperName'
        |SELECT {[Measures].[f]} ON COLUMNS FROM [Sales]""".stripMargin,
      cube)
    val expected = new UdfContext(cube)
      .childrenNames(cube.dim("customer"), Nil).head.toUpperCase
    assert(df.collect().head.getString(0) == expected)
  }

  test("level property UDF enumerates level members") {
    val df = Mdx.execute(
      """WITH MEMBER [Measures].[f] AS
        |  '[customer].[nation].firstLevelChildUpperName'
        |SELECT {[Measures].[f]} ON COLUMNS FROM [Sales]""".stripMargin,
      cube)
    val expected = new UdfContext(cube)
      .levelMemberNames(cube.dim("customer"), "nation").head.toUpperCase
    assert(df.collect().head.getString(0) == expected)
  }

  // -- set-returning UDF ("functions with a member set result")

  test("set-returning UDF composes with set operators on an axis") {
    val viaUdf = Mdx.execute(
      """SELECT {[Measures].[revenue]} ON COLUMNS,
        |  ChildrenSet([customer].[EUROPE]) ON ROWS
        |FROM [Sales]""".stripMargin, cube).collect()
    val direct = Query.from(cube).columns("revenue")
      .rows(Children("customer", Seq("EUROPE"))).execute().collect()
    assert(viaUdf.toSeq == direct.toSeq)
  }

  // -- cell formatter ("should execute user defined function" +
  // formatted_values %020d; "should get measure cell formatter name")

  test("CELL_FORMATTER applies in formattedValues and wins over toString") {
    val res = Query.from(cube)
      .columns("count_order", "pad")
      .rows(LevelMembers("customer", "region"))
      .withMember(CalcMember("pad", ExprCalc("count_order"),
        cellFormatter = Some("Pad20")))
      .executeResult()
    val pi = res.columnNames.indexOf("pad")
    val ci = res.columnNames.indexOf("count_order")
    res.formattedValues.zipWithIndex.foreach { case (row, i) =>
      val expected = "%020d".format(
        res.value(i, ci).asInstanceOf[Number].longValue())
      assert(row(pi) == expected)
      assert(row(pi).length == 20)
    }
  }

  test("MDX CELL_FORMATTER option parses, renders, and validates") {
    val ir = Mdx.parse(
      """WITH MEMBER [Measures].[p] AS '[Measures].[count_order]',
        |  SOLVE_ORDER = 2, CELL_FORMATTER = 'Pad20'
        |SELECT {[Measures].[p]} ON COLUMNS FROM [Sales]""".stripMargin,
      cube)
    val cm = ir.withMembers.find(_.name == "p").get
    assert(cm.cellFormatter.contains("Pad20"))
    assert(cm.solveOrder == 2)
    val mdx = Mdx.renderQuery(ir, cube.name)
    assert(mdx.contains("CELL_FORMATTER = 'Pad20'"))
    assert(mdx.contains("SOLVE_ORDER = 2"))
    val bad = intercept[Mdx.MdxException](Mdx.parse(
      """WITH MEMBER [Measures].[p] AS '1', CELL_FORMATTER = 'NoSuch'
        |SELECT {[Measures].[p]} ON COLUMNS FROM [Sales]""".stripMargin,
      cube))
    assert(bad.msg.contains("NoSuch"))
  }

  test("metadata exposes cell formatter name and format string") {
    val c2 = cube.copy(measures = cube.measures.map(m =>
      if (m.name == "count_order") m.copy(cellFormatter = Some("Pad20"))
      else m))
    val m2 = new CubeMetadata(c2)
    assert(m2.cellFormatterName("[Measures].[count_order]")
      .contains("Pad20"))
    assert(m2.cellFormatter("count_order").exists(_(7L) ==
      "%020d".format(7L)))
    assert(m2.cellFormatterName("[Measures].[revenue]").isEmpty)
    assert(m2.formatString("[Measures].[revenue]").contains("#,##0.00"))
    assert(m2.formatString("[Measures].[count_order]").isEmpty)
  }

  // -- member + property formatters ("should format members and
  // properties")

  test("member formatter formats axis captions") {
    val dims2 = cube.dims.map { d =>
      if (d.name != "customer") d
      else d.copy(levels = d.levels.map(l =>
        if (l.name == "nation") l.copy(memberFormatter = Some("UpperCaption"))
        else l))
    }
    val c2 = cube.copy(dims = dims2)
    val res = Query.from(c2).columns("revenue")
      .rows(LevelMembers("customer", "nation")).executeResult()
    val ni = res.rowAxisNames.indexOf("cr_nation")
    res.rowAxis.zip(res.formattedRowAxis).foreach { case (raw, fmt) =>
      assert(fmt(ni) == String.valueOf(raw(ni)).toUpperCase)
    }
    assert(res.memberCaption(0, ni) ==
      String.valueOf(res.rowAxis.head(ni)).toUpperCase)
  }

  test("property formatter formats member property values") {
    val dims2 = cube.dims.map { d =>
      if (d.name != "customer") d
      else d.copy(levels = d.levels.map(l =>
        if (l.name == "customer")
          l.copy(propertyFormatters = Map("c_mktsegment" -> "UpperProp"))
        else l))
    }
    val c2 = cube.copy(dims = dims2)
    val m2 = new CubeMetadata(c2)
    val nations = meta.levelMembers("customer", "nation").collect()
    val nation = nations.head.getAs[String]("cr_nation")
    val region = nations.head.getAs[String]("cr_region")
    val cust = new CubeMetadata(cube).children("customer",
      Seq(region, nation)).collect().head.getAs[String]("c_name")
    val path = Seq(region, nation, cust)
    val raw = m2.memberProperties("customer", path)("c_mktsegment")
    assert(m2.memberPropertyFormatted("customer", path, "c_mktsegment")
      .contains(String.valueOf(raw).toUpperCase))
    // unformatted property passes through
    assert(m2.memberPropertyFormatted("customer", path, "c_acctbal")
      .contains(String.valueOf(
        m2.memberProperties("customer", path)("c_acctbal"))))
  }

  test("unknown cell formatter fails at result materialization") {
    val err = intercept[IllegalArgumentException] {
      Query.from(cube).columns("x")
        .withMember(CalcMember("x", ExprCalc("1"),
          cellFormatter = Some("missing")))
        .executeResult()
    }
    assert(err.getMessage.contains("missing"))
  }
}
