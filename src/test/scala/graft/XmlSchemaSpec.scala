package graft

import org.apache.spark.sql.functions._
import graft.olap._
import graft.sources.XmlSchema

/** Mondrian XML catalog reader specs: a reference user's <Schema>
  * binds to DataFrames and answers identically to a hand-built cube.
  */
class XmlSchemaSpec extends SparkSpec {

  private val catalog =
    """<Schema name="graft-test">
      |  <Dimension name="customer">
      |    <Hierarchy hasAll="true" primaryKey="c_custkey"
      |               uniqueKeyLevelName="customer">
      |      <Join leftKey="c_nationkey" rightKey="n_nationkey">
      |        <Table name="customer"/>
      |        <Join leftKey="n_regionkey" rightKey="r_regionkey">
      |          <Table name="nation"/>
      |          <Table name="region"/>
      |        </Join>
      |      </Join>
      |      <Level name="region" column="r_name"/>
      |      <Level name="nation" column="n_name"/>
      |      <Level name="customer" column="c_name">
      |        <Property name="segment" column="c_mktsegment"
      |                  dependsOnLevelValue="true"/>
      |      </Level>
      |    </Hierarchy>
      |  </Dimension>
      |  <Cube name="OrdersX" defaultMeasure="total">
      |    <Table name="orders"/>
      |    <DimensionUsage name="customer" source="customer"
      |                    foreignKey="o_custkey"/>
      |    <Dimension name="status" foreignKey="o_orderstatus">
      |      <Hierarchy hasAll="true">
      |        <Level name="status" column="o_orderstatus"/>
      |      </Hierarchy>
      |    </Dimension>
      |    <Measure name="total" column="o_totalprice" aggregator="sum"
      |             formatString="#,##0.00"/>
      |    <Measure name="n_orders" column="o_orderkey"
      |             aggregator="distinct-count"/>
      |    <Measure name="max_price" column="o_totalprice"
      |             aggregator="max"/>
      |    <CalculatedMember name="avg_order" dimension="Measures">
      |      <Formula>[Measures].[total] / [Measures].[n_orders]</Formula>
      |    </CalculatedMember>
      |  </Cube>
      |</Schema>""".stripMargin

  private lazy val cubes = XmlSchema.load(catalog,
    name => Tables.load(spark, Sf, name))
  private lazy val cube = cubes.head

  test("XML catalog binds: snowflake join, usage, degenerate, measures") {
    assert(cubes.map(_.name) === Seq("OrdersX"))
    assert(cube.dims.map(_.name) === Seq("customer", "status"))
    val cust = cube.dim("customer")
    assert(cust.levels.map(_.name) === Seq("region", "nation", "customer"))
    assert(cust.uniqueKeyLevel === Some("customer"))
    assert(cust.level("customer").dependentProps === Set("c_mktsegment"))
    assert(cube.dim("status").degenerate)
    assert(cube.measures.map(_.name) ===
      Seq("total", "n_orders", "max_price"))
    assert(cube.measure("total").formatString === Some("#,##0.00"))
    assert(cube.defaultMeasureName === "total")
    assert(cube.calcMembers.map(_.name) === Seq("avg_order"))
  }

  test("XML-bound cube answers identically to direct SQL") {
    val got = Query.from(cube)
      .columns("total", "n_orders", "max_price")
      .rows(LevelMembers("customer", "region"))
      .execute()
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .sortBy(_._1)
    val direct = Tables.load(spark, Sf, "orders")
      .join(Tables.load(spark, Sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.load(spark, Sf, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .join(Tables.load(spark, Sf, "region"),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(sum("o_totalprice").as("total"),
        countDistinct("o_orderkey").as("n_orders"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got.map(t => (t._1, t._3)) === direct.map(t => (t._1, t._3)))
    got.zip(direct).foreach { case (g, d) =>
      assert(math.abs(g._2 - d._2) < 1e-6 * math.abs(d._2)) }
    // the degenerate dimension slices the fact directly
    val sliced = Query.from(cube).columns("n_orders")
      .rows(LevelMembers("status", "status"))
      .execute().collect()
    assert(sliced.nonEmpty)
    // the translated calc member evaluates post-aggregation
    val calc = Query.from(cube).columns("total", "avg_order")
      .rows(LevelMembers("customer", "region"))
      .execute().collect()
    calc.foreach { r =>
      assert(r.getDouble(2) > 0 && r.getDouble(2) <= r.getDouble(1)) }
  }

  test("XML virtual cubes and roles bind to the engine surfaces") {
    val catalog2 =
      """<Schema name="g2">
        |  <Dimension name="customer">
        |    <Hierarchy hasAll="true" primaryKey="c_custkey">
        |      <Join leftKey="c_nationkey" rightKey="n_nationkey">
        |        <Table name="customer"/>
        |        <Join leftKey="n_regionkey" rightKey="r_regionkey">
        |          <Table name="nation"/>
        |          <Table name="region"/>
        |        </Join>
        |      </Join>
        |      <Level name="region" column="r_name"/>
        |      <Level name="nation" column="n_name"/>
        |    </Hierarchy>
        |  </Dimension>
        |  <Cube name="OrdersC">
        |    <Table name="orders"/>
        |    <DimensionUsage name="customer" source="customer"
        |                    foreignKey="o_custkey"/>
        |    <Measure name="total" aggregator="sum">
        |      <MeasureExpression>
        |        <SQL>cast(o_totalprice as decimal(38,10))</SQL>
        |      </MeasureExpression>
        |    </Measure>
        |  </Cube>
        |  <Cube name="CustomerC">
        |    <Table name="customer"/>
        |    <DimensionUsage name="customer" source="customer"
        |                    foreignKey="c_custkey"/>
        |    <Measure name="n_customers" column="c_custkey"
        |             aggregator="distinct-count"/>
        |  </Cube>
        |  <VirtualCube name="OrdersAndCustomers">
        |    <VirtualCubeDimension name="customer"/>
        |    <VirtualCubeMeasure cubeName="OrdersC"
        |                        name="[Measures].[total]"/>
        |    <VirtualCubeMeasure cubeName="CustomerC"
        |                        name="[Measures].[n_customers]"/>
        |  </VirtualCube>
        |  <Role name="euroAsia">
        |    <SchemaGrant access="none">
        |      <CubeGrant cube="OrdersC" access="all">
        |        <HierarchyGrant hierarchy="[customer]" access="custom"
        |                        rollupPolicy="partial">
        |          <MemberGrant member="[customer].[EUROPE]" access="all"/>
        |          <MemberGrant member="[customer].[ASIA]" access="all"/>
        |        </HierarchyGrant>
        |      </CubeGrant>
        |    </SchemaGrant>
        |  </Role>
        |</Schema>""".stripMargin
    val cat = XmlSchema.loadCatalog(catalog2,
      name => Tables.load(spark, Sf, name))
    assert(cat.cubes.map(_.name) === Seq("OrdersC", "CustomerC"))
    // virtual cube: both cubes' measures aligned at the conformed grain
    val vc = cat.virtualCubes.head
    assert(vc.name === "OrdersAndCustomers")
    val rows = vc.aggregate(Seq(("customer", "region"))).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      assert(!r.isNullAt(1) && !r.isNullAt(2),
        "every region has orders and customers at this SF") }
    // role: member grants restrict axes + totals (partial rollup)
    val role = cat.roles("euroAsia")
    assert(role.policyFor("customer") === RollupPolicy.Partial)
    val granted = Query.from(cat.cube("OrdersC").withRole(role))
      .columns("total")
      .rows(LevelMembers("customer", "region"))
      .execute().collect().map(_.getString(0)).sorted
    assert(granted === Array("ASIA", "EUROPE"))
  }

  private def roleCatalog(grants: String): String =
    s"""<Schema name="g3">
       |  <Cube name="O3">
       |    <Table name="orders"/>
       |    <Dimension name="status" foreignKey="o_orderstatus">
       |      <Hierarchy hasAll="true">
       |        <Level name="status" column="o_orderstatus"/>
       |      </Hierarchy>
       |    </Dimension>
       |    <Dimension name="priority" foreignKey="o_orderpriority">
       |      <Hierarchy hasAll="true">
       |        <Level name="priority" column="o_orderpriority"/>
       |      </Hierarchy>
       |    </Dimension>
       |    <Measure name="total" column="o_totalprice" aggregator="sum"/>
       |  </Cube>
       |  <Role name="r">
       |    <SchemaGrant access="none">
       |      <CubeGrant cube="O3" access="all">
       |$grants
       |      </CubeGrant>
       |    </SchemaGrant>
       |  </Role>
       |</Schema>""".stripMargin

  private def hierarchyGrant(policyAttr: String): String =
    s"""<HierarchyGrant hierarchy="[status]" access="custom"$policyAttr>
       |  <MemberGrant member="[status].[O]" access="all"/>
       |</HierarchyGrant>""".stripMargin

  test("rollupPolicy binds per hierarchy; absent defaults to full") {
    // Mondrian's default is "full": an absent attribute must not
    // silently switch totals to partial rollup
    val defaulted = XmlSchema.loadCatalog(roleCatalog(hierarchyGrant("")),
      name => Tables.load(spark, Sf, name))
    assert(defaulted.roles("r").policyFor("status") === RollupPolicy.Full)
    val explicit = XmlSchema.loadCatalog(
      roleCatalog(hierarchyGrant(""" rollupPolicy="partial"""")),
      name => Tables.load(spark, Sf, name))
    assert(explicit.roles("r").policyFor("status") === RollupPolicy.Partial)
    // Mondrian's third legal value stays loadable (binds as the
    // conservative Partial; documented divergence from null totals)
    val hidden = XmlSchema.loadCatalog(
      roleCatalog(hierarchyGrant(""" rollupPolicy="hidden"""")),
      name => Tables.load(spark, Sf, name))
    assert(hidden.roles("r").policyFor("status") === RollupPolicy.Partial)
    // MIXED policies bind per hierarchy (Mondrian's per-HierarchyGrant
    // attribute): partial on status filters totals, the defaulted-full
    // priority grant restricts only axis visibility
    val priorityGrant =
      """<HierarchyGrant hierarchy="[priority]" access="custom">
        |  <MemberGrant member="[priority].[1-URGENT]" access="all"/>
        |</HierarchyGrant>""".stripMargin
    val mixed = XmlSchema.loadCatalog(
      roleCatalog(hierarchyGrant(""" rollupPolicy="partial"""") + "\n" +
        priorityGrant),
      name => Tables.load(spark, Sf, name))
    val role = mixed.roles("r")
    assert(role.policyFor("status") === RollupPolicy.Partial)
    assert(role.policyFor("priority") === RollupPolicy.Full)
    // grand total = all 'O' orders at EVERY priority (full keeps the
    // data; partial slices), not just the 1-URGENT ones
    val got = Query.from(mixed.cube("O3").withRole(role))
      .columns("total").execute().collect()
    val want = Tables.load(spark, Sf, "orders")
      .filter(col("o_orderstatus") === "O")
      .agg(sum("o_totalprice")).collect().head.getDouble(0)
    assert(math.abs(got.head.getDouble(0) - want) < 1e-6 * want)
  }

  test("degenerate dimension binds without foreignKey; joins require it") {
    // real Mondrian catalogs omit foreignKey when level columns live
    // on the fact
    val noFk = catalog.replace(
      """<Dimension name="status" foreignKey="o_orderstatus">""",
      """<Dimension name="status">""")
    val bound = XmlSchema.load(noFk, name => Tables.load(spark, Sf, name))
      .head
    assert(bound.dim("status").degenerate)
    val sliced = Query.from(bound).columns("n_orders")
      .rows(LevelMembers("status", "status"))
      .execute().collect()
    assert(sliced.nonEmpty)
    // a dimension that joins a table still needs the fact-side key
    val joinedNoFk =
      """<Schema name="g4">
        |  <Cube name="O4">
        |    <Table name="orders"/>
        |    <Dimension name="customer">
        |      <Hierarchy hasAll="true" primaryKey="c_custkey">
        |        <Table name="customer"/>
        |        <Level name="segment" column="c_mktsegment"/>
        |      </Hierarchy>
        |    </Dimension>
        |    <Measure name="total" column="o_totalprice" aggregator="sum"/>
        |  </Cube>
        |</Schema>""".stripMargin
    val e = intercept[IllegalArgumentException] {
      XmlSchema.load(joinedNoFk, name => Tables.load(spark, Sf, name))
    }
    assert(e.getMessage.contains("needs foreignKey"))
  }

  test("calc-member formula rewrite survives $ in measure names") {
    // replaceAllIn's replacement string treats $ as a group reference
    // unless quoted — a measure named with $ must round-trip literally
    val dollar = catalog
      .replace("""<Measure name="total" column="o_totalprice"""",
        """<Measure name="usd$total" column="o_totalprice"""")
      .replace("defaultMeasure=\"total\"", "defaultMeasure=\"usd$total\"")
      .replace("<Formula>[Measures].[total] / [Measures].[n_orders]",
        "<Formula>[Measures].[usd$total] / [Measures].[n_orders]")
    val bound = XmlSchema.load(dollar,
      name => Tables.load(spark, Sf, name)).head
    assert(bound.calcMembers.head.calc ===
      ExprCalc("`usd$total` / `n_orders`"))
    val rows = Query.from(bound).columns("usd$total", "avg_order")
      .rows(LevelMembers("customer", "region"))
      .execute().collect()
    rows.foreach { r =>
      assert(r.getDouble(2) > 0 && r.getDouble(2) <= r.getDouble(1)) }
  }

  test("member revocations and level bounds restrict axes, totals, metadata") {
    // mirror connection_role_test.rb: grant a subtree, revoke a member
    // inside it, and bound the visible level range
    val catalog3 =
      """<Schema name="g5">
        |  <Dimension name="customer">
        |    <Hierarchy hasAll="true" primaryKey="c_custkey">
        |      <Join leftKey="c_nationkey" rightKey="n_nationkey">
        |        <Table name="customer"/>
        |        <Join leftKey="n_regionkey" rightKey="r_regionkey">
        |          <Table name="nation"/>
        |          <Table name="region"/>
        |        </Join>
        |      </Join>
        |      <Level name="region" column="r_name"/>
        |      <Level name="nation" column="n_name"/>
        |      <Level name="customer" column="c_name"/>
        |    </Hierarchy>
        |  </Dimension>
        |  <Cube name="O5">
        |    <Table name="orders"/>
        |    <DimensionUsage name="customer" source="customer"
        |                    foreignKey="o_custkey"/>
        |    <Measure name="total" column="o_totalprice" aggregator="sum"/>
        |  </Cube>
        |  <Role name="r5">
        |    <SchemaGrant access="none">
        |      <CubeGrant cube="O5" access="all">
        |        <HierarchyGrant hierarchy="[customer]" access="custom"
        |                        rollupPolicy="partial"
        |                        bottomLevel="[customer].[nation]">
        |          <MemberGrant member="[customer].[EUROPE]" access="all"/>
        |          <MemberGrant member="[customer].[EUROPE].[NATION_3]"
        |                       access="none"/>
        |        </HierarchyGrant>
        |      </CubeGrant>
        |    </SchemaGrant>
        |  </Role>
        |</Schema>""".stripMargin
    val cat = XmlSchema.loadCatalog(catalog3,
      name => Tables.load(spark, Sf, name))
    val role = cat.roles("r5")
    assert(role.denies === Seq("customer" -> Seq("EUROPE", "NATION_3")))
    assert(role.levelBounds("customer") === Seq((None, Some("nation"))))
    val secured = cat.cube("O5").withRole(role)
    // axes: EUROPE's nations minus the revoked one
    val nations = Query.from(secured).columns("total")
      .rows(LevelMembers("customer", "nation"))
      .execute().collect().map(_.getString(1))
    assert(nations.nonEmpty && !nations.contains("NATION_3"))
    // the level below bottomLevel has no visible members
    val customers = Query.from(secured).columns("total")
      .rows(LevelMembers("customer", "customer"))
      .execute().collect()
    assert(customers.isEmpty)
    // partial totals exclude the revoked subtree's rows
    val want = Tables.load(spark, Sf, "orders")
      .join(Tables.load(spark, Sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.load(spark, Sf, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .join(Tables.load(spark, Sf, "region"),
        col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "EUROPE" && col("n_name") =!= "NATION_3")
      .agg(sum("o_totalprice")).collect().head.getDouble(0)
    val got = Query.from(secured).columns("total")
      .execute().collect().head.getDouble(0)
    assert(math.abs(got - want) < 1e-6 * want)
    // metadata: the revoked member does not exist under the role
    val meta = new CubeMetadata(secured)
    assert(meta.member("[customer].[EUROPE].[NATION_3]").isEmpty)
    // any still-visible EUROPE nation resolves
    assert(meta.member(s"[customer].[EUROPE].[${nations.head}]").isDefined)
  }

  test("XML validation fails fast on broken bindings") {
    val bad = catalog.replace("""<Level name="nation" column="n_name"/>""",
      """<Level name="nation" column="n_nope"/>""")
    val e = intercept[IllegalArgumentException] {
      XmlSchema.load(bad, name => Tables.load(spark, Sf, name))
    }
    assert(e.getMessage.contains("n_nope"))
    // structural errors name the element
    val noFormula = catalog.replace(
      "<Formula>[Measures].[total] / [Measures].[n_orders]</Formula>", "")
    val e2 = intercept[IllegalArgumentException] {
      XmlSchema.load(noFormula, name => Tables.load(spark, Sf, name))
    }
    assert(e2.getMessage.contains("avg_order"))
  }
}
