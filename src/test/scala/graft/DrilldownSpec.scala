package graft

import graft.olap._

/** Drilldown family (SURVEY §2.8: DrilldownMember,
  * DrilldownLevelTop/Bottom, ToggleDrillState, Unorder) and
  * CurrentDateMember (§2.5, schema_definition_test.rb:577-597).
  */
class DrilldownSpec extends SparkSpec {

  private lazy val cube = Cubes.sales(spark, Sf)
  private val regions = LevelMembers("customer", "region")

  test("DrilldownMember inserts children under the drilled members only") {
    val rows = Query.from(cube).columns("count_order")
      .rows(DrilldownMember(regions,
        Members("customer", Seq(Seq("EUROPE"), Seq("ASIA")))))
      .execute().collect()
    val regionRows = rows.filter(_.isNullAt(1))
    val nationRows = rows.filterNot(_.isNullAt(1))
    assert(regionRows.length == 5)
    assert(nationRows.map(_.getString(0)).distinct.sorted.toSeq ==
      Seq("ASIA", "EUROPE"))
    // PRE order: each drilled region immediately followed by its nations
    val i = rows.indexWhere(r => r.getString(0) == "ASIA" && r.isNullAt(1))
    assert(rows(i + 1).getString(0) == "ASIA" && !rows(i + 1).isNullAt(1))
  }

  test("DrilldownMember of a leaf-level set is a no-op") {
    val leaf = Members("customer",
      Seq(Seq("EUROPE", "NATION_3", "CUSTOMER_1")))
    val base = Query.from(cube).columns("count_order").rows(leaf)
      .execute().collect()
    val drilled = Query.from(cube).columns("count_order")
      .rows(DrilldownMember(leaf, leaf)).execute().collect()
    assert(drilled.length == base.length)
  }

  test("DrilldownLevelTop keeps each parent plus its top-n children") {
    val rows = Query.from(cube).columns("revenue")
      .rows(DrilldownLevelTop(regions, 2, "revenue"))
      .execute().collect()
    val regionRows = rows.filter(_.isNullAt(1))
    val nationRows = rows.filterNot(_.isNullAt(1))
    assert(regionRows.length == 5)
    // exactly 2 children per region, and they are that region's top-2
    val byRegion = nationRows.groupBy(_.getString(0))
    assert(byRegion.values.forall(_.length == 2))
    val all = Query.from(cube).columns("revenue")
      .rows(LevelMembers("customer", "nation")).execute().collect()
    byRegion.foreach { case (reg, kept) =>
      val top2 = all.filter(_.getString(0) == reg)
        .sortBy(r => -r.getDecimal(2).doubleValue()).take(2)
        .map(_.getString(1)).toSet
      assert(kept.map(_.getString(1)).toSet == top2, s"region $reg")
    }
  }

  test("ToggleDrillState collapses drilled members and expands others") {
    val mixed = UnionSet(regions, Children("customer", Seq("EUROPE")),
      all = true)
    val rows = Query.from(cube).columns("count_order")
      .rows(ToggleDrillState(mixed,
        Members("customer", Seq(Seq("EUROPE"), Seq("ASIA")))))
      .execute().collect()
    val nationRows = rows.filterNot(_.isNullAt(1))
    // EUROPE was drilled -> collapsed; ASIA was not -> expanded
    assert(nationRows.map(_.getString(0)).distinct.toSeq == Seq("ASIA"))
    assert(rows.count(_.isNullAt(1)) == 5)
  }

  test("DrilldownLevel expands every member one level down") {
    val rows = Mdx.execute(
      """SELECT {[Measures].[count_order]} ON COLUMNS,
        |  DRILLDOWNLEVEL({[customer].[EUROPE], [customer].[ASIA]})
        |    ON ROWS
        |FROM [Sales]""".stripMargin, cube).collect()
    // 2 regions + their 2x5 nations
    assert(rows.length == 12)
    assert(rows.count(_.isNullAt(1)) == 2)
  }

  test("StrToTuple pins one member per hierarchy") {
    val rows = Mdx.execute(
      """SELECT {[Measures].[count_order]} ON COLUMNS,
        |  STRTOTUPLE('([customer].[EUROPE], [returnflag].[R])') ON ROWS
        |FROM [Sales]""".stripMargin, cube).collect()
    assert(rows.length == 1)
    assert(rows.head.getString(0) == "EUROPE")
  }

  test("Unorder parses and is a semantic no-op") {
    val rows = Mdx.execute(
      """SELECT {[Measures].[count_order]} ON COLUMNS,
        |  UNORDER([customer].[region].Members) ON ROWS
        |FROM [Sales]""".stripMargin, cube).collect()
    assert(rows.length == 5)
  }

  test("CurrentDateMember BEFORE finds the closest month at or before now") {
    spark.conf.set("spark.graft.now", "1996-07-15")
    val rows = Query.from(cube).columns("count_order")
      .rows(CurrentDateMember("time", "month", "BEFORE"))
      .execute().collect()
    assert(rows.length == 1)
    assert(rows.head.getString(2) == "1996-07")
  }

  test("CurrentDateMember falls back to the last member when now is beyond the data") {
    spark.conf.set("spark.graft.now", "2030-01-01")
    val rows = Query.from(cube).columns("count_order")
      .rows(CurrentDateMember("time", "year", "BEFORE"))
      .execute().collect()
    val maxYear = Tables.timeDim(spark, Sf)
      .agg(org.apache.spark.sql.functions.max("d_year"))
      .head().getInt(0)
    assert(rows.length == 1 && rows.head.getInt(0) == maxYear)
  }

  test("CurrentDateMember parses the reference format-string form") {
    spark.conf.set("spark.graft.now", "1996-07-15")
    val df = Mdx.execute(
      """SELECT {[Measures].[count_order]} ON COLUMNS,
        |  CURRENTDATEMEMBER([time], '[time].[yyyy].[Qq]', BEFORE) ON ROWS
        |FROM [Sales]""".stripMargin, cube)
    val rows = df.collect()
    assert(rows.length == 1)
    assert(rows.head.getString(1) == "1996-Q3")
  }

  test("drilldown set functions render back to MDX") {
    assert(Mdx.render(DrilldownMember(regions,
      Members("customer", Seq(Seq("EUROPE"))))) ==
      "DRILLDOWNMEMBER([customer].[region].Members, {[customer].[EUROPE]})")
    assert(Mdx.render(DrilldownLevelTop(regions, 2, "revenue")) ==
      "DRILLDOWNLEVELTOP([customer].[region].Members, 2, revenue)")
    assert(Mdx.render(UnorderSet(regions)) ==
      "UNORDER([customer].[region].Members)")
    assert(Mdx.render(CurrentDateMember("time", "month", "BEFORE")) ==
      "CURRENTDATEMEMBER([time].[month], BEFORE)")
  }
}
