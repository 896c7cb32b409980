package graft

import graft.olap._

/** Connection façade specs: cube registry routing, the four entry
  * points, cache control, and closed-connection errors.
  */
class ConnectionSpec extends SparkSpec {

  test("routes MDX to the cube named in FROM and exposes the builder") {
    val conn = Connection.create(spark, Sf)
    assert(conn.cubeNames === Seq("Events", "Sales"))
    val viaMdx = conn.execute(
      """SELECT {[Measures].[revenue]} ON COLUMNS,
        |  [customer].[region].Members ON ROWS
        |FROM [Sales]""".stripMargin).collect()
    assert(viaMdx.length === 5)
    val events = conn.execute(
      """SELECT {[Measures].[n_events]} ON COLUMNS,
        |  [event_type].[event_type].Members ON ROWS
        |FROM [Events]""".stripMargin).collect()
    assert(events.nonEmpty)
    assert(conn.from("Sales").columns("revenue").execute().count() === 1)
    assert(conn.metadata("Sales").measureNames.contains("revenue"))
    val e = intercept[Mdx.MdxException] {
      conn.execute("SELECT {[Measures].[x]} ON COLUMNS FROM [Nope]")
    }
    assert(e.msg.contains("not found"))
  }

  test("createFromCatalog binds an XML catalog with an attached role") {
    val catalog =
      """<Schema name="gx">
        |  <Cube name="OrdersCat">
        |    <Table name="orders"/>
        |    <Dimension name="customer" foreignKey="o_custkey">
        |      <Hierarchy hasAll="true" primaryKey="c_custkey">
        |        <Join leftKey="c_nationkey" rightKey="n_nationkey">
        |          <Table name="customer"/>
        |          <Join leftKey="n_regionkey" rightKey="r_regionkey">
        |            <Table name="nation"/>
        |            <Table name="region"/>
        |          </Join>
        |        </Join>
        |        <Level name="region" column="r_name"/>
        |        <Level name="nation" column="n_name"/>
        |      </Hierarchy>
        |    </Dimension>
        |    <Measure name="total" aggregator="sum">
        |      <MeasureExpression>
        |        <SQL>cast(o_totalprice as decimal(38,10))</SQL>
        |      </MeasureExpression>
        |    </Measure>
        |  </Cube>
        |  <Role name="euro">
        |    <SchemaGrant access="none">
        |      <CubeGrant cube="OrdersCat" access="all">
        |        <HierarchyGrant hierarchy="[customer]" access="custom"
        |                        rollupPolicy="partial">
        |          <MemberGrant member="[customer].[EUROPE]" access="all"/>
        |        </HierarchyGrant>
        |      </CubeGrant>
        |    </SchemaGrant>
        |  </Role>
        |</Schema>""".stripMargin
    val resolver = (name: String) => Tables.load(spark, Sf, name)
    val conn = Connection.createFromCatalog(spark, catalog, resolver,
      roleName = Some("euro"))
    val rows = conn.execute(
      """SELECT {[Measures].[total]} ON COLUMNS,
        |  [customer].[region].Members ON ROWS
        |FROM [OrdersCat]""".stripMargin).collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("EUROPE"),
      "the role must restrict the axis to granted members")
    val unknown = intercept[IllegalArgumentException] {
      Connection.createFromCatalog(spark, catalog, resolver,
        roleName = Some("nope"))
    }
    assert(unknown.getMessage.contains("nope"))
    conn.close()
  }

  test("content-checksum schema pool shares resolved cubes across connections") {
    Connection.flushSchemaPool()
    // two connections over INDEPENDENTLY built but equal-content cubes
    // must share one pooled instance (reference RolapSchemaPool:
    // equal schema content => same schema object)
    def freshCube() = {
      val t = Tables.load(spark, Sf, "lineitem")
      olap.BoundCube("PoolCube", t,
        dims = Seq(olap.BoundDim("returnflag",
          foreignKey = "l_returnflag", primaryKey = "l_returnflag",
          levels = Seq(olap.BoundLevel("returnflag", "l_returnflag")),
          df = t.select("l_returnflag").distinct(), degenerate = true)),
        measures = Seq(olap.Measure("sum_qty", olap.Agg.Sum, "l_quantity")))
    }
    val c1 = Connection.create(spark, Seq(freshCube()))
    val c2 = Connection.create(spark, Seq(freshCube()))
    assert(c1.cube("PoolCube") eq c2.cube("PoolCube"),
      "equal-content cubes must resolve to one pooled instance")
    assert(Connection.schemaPoolSize == 1)
    // different content (extra measure) => different pooled instance
    val changed = freshCube().copy(measures = Seq(
      olap.Measure("sum_qty", olap.Agg.Sum, "l_quantity"),
      olap.Measure("n", olap.Agg.Count, "1")))
    val c3 = Connection.create(spark, Seq(changed))
    assert(!(c3.cube("PoolCube") eq c1.cube("PoolCube")))
    assert(Connection.schemaPoolSize == 2)
    // flush empties the pool; the next connection re-resolves
    Connection.flushSchemaPool()
    assert(Connection.schemaPoolSize == 0)
    val c4 = Connection.create(spark, Seq(freshCube()))
    assert(!(c4.cube("PoolCube") eq c1.cube("PoolCube")))
  }

  test("close flushes segments and refuses further queries") {
    val conn = Connection.create(spark, Sf)
    conn.execute(
      """SELECT {[Measures].[revenue]} ON COLUMNS,
        |  [customer].[region].Members ON ROWS
        |FROM [Sales]""".stripMargin).collect()
    conn.close()
    assert(!conn.connected)
    intercept[IllegalStateException] { conn.from("Sales") }
    intercept[IllegalStateException] {
      conn.execute("SELECT {[Measures].[revenue]} ON COLUMNS FROM [Sales]")
    }
  }
}
