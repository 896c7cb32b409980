package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Cubes, Tables}
import graft.olap._

/** Coverage extensions: drilldown family (§2.8), parent-child
  * hierarchies (§2.3), and the predicate/conditional scalar operators
  * (§2.2: CASE, Iif, CoalesceEmpty, IsEmpty, MATCHES).
  */
object OlapExtQueries {

  private def sales(s: SparkSession, dir: String) = Cubes.sales(s, dir)

  private val REV =
    "sum(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(38,10)))"
  private val LO = "FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
  private val CJOIN = s"$LO JOIN customer ON o_custkey = c_custkey " +
    "JOIN nation ON c_nationkey = n_nationkey " +
    "JOIN region ON n_regionkey = r_regionkey"
  private val MONTH = "strftime(o_orderdate, '%Y-%m')"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- DrilldownLevel (§2.8): regions + their nations, one fact pass
    // via rollup, parents (null child key) before children ------------
    "q_drilldown_level" -> ((s, dir) =>
      new Planner(sales(s, dir)).rollupAggregate(
          Seq(("customer", "nation")), Nil, Seq("revenue", "sum_qty"))
        .filter(col("cr_region").isNotNull)
        .orderBy(col("cr_region").asc, col("cr_nation").asc_nulls_first)),

    // -- parent-child hierarchy (§2.3): region→nation as a recursive
    // (id, parent) table; subtree totals via the materialized closure --
    "q_parentchild" -> ((s, dir) => {
      val n = Tables.load(s, dir, "nation")
      val r = Tables.load(s, dir, "region")
      val members = r.select(col("r_name").as("member"),
          lit(null).cast("string").as("parent"))
        .unionByName(
          n.join(r, n("n_regionkey") === r("r_regionkey"))
            .select(col("n_name").as("member"), col("r_name").as("parent")))
      val nationRev = Query.from(sales(s, dir))
        .columns("revenue")
        .rows(LevelMembers("customer", "nation"))
        .execute()
        .select(col("cr_nation").as("nation"), col("revenue"))
      ParentChild.subtreeTotals(members, "member", "parent",
        nationRev, "nation", sum(col("revenue")))
    }),

    // -- Extract (§2.7): project a crossjoin set onto one hierarchy --
    "q_extract" -> ((s, dir) =>
      Query.from(sales(s, dir))
        .columns("revenue")
        .rows(ExtractSet(
          NonEmptyCrossJoin(Children("customer", Seq("EUROPE")),
            LevelMembers("part", "brand")),
          Seq("part")))
        .execute()),

    // -- Generate string form (§2.7): per-region member-name join -----
    "q_generate_string" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val members = new CubeMetadata(sales(s, dir))
        .levelMembers("customer", "nation")
      members.groupBy(col("cr_region"))
        .agg(expr("array_join(sort_array(collect_list(cr_nation)), ', ')")
          .as("nations"))
    }),

    // -- second Time hierarchy (ISO weekly — Time.Weekly pattern) ------
    "q_weekly_agg" -> ((s, dir) =>
      Query.from(sales(s, dir))
        .columns("revenue", "count_order")
        .rows(LevelMembers("time_weekly", "week"))
        .where(MemberSlice("time_weekly", Seq(1995)))
        .nonempty()
        .execute()),

    // -- events cube (second base fact) --------------------------------
    "q_events_agg" -> ((s, dir) =>
      Query.from(Cubes.events(s, dir))
        .columns("n_events", "sum_value", "n_users")
        .rows(LevelMembers("event_type", "event_type"))
        .execute()),

    // -- JDBC dimension source (§2.1, connection.rb dialect parity):
    // the region dim round-trips through embedded Derby and answers
    // joined to the parquet nation table — same rows the oracle reads
    // straight from parquet ------------------------------------------
    "q_jdbc_dim" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val url =
        s"jdbc:derby:/tmp/graft_derby_${math.abs(dir.hashCode)};create=true"
      graft.sources.Sources.writeJdbc(Tables.load(s, dir, "region"),
        url, "region_jdbc",
        Map("createTableColumnTypes" -> "r_name VARCHAR(64)"))
      graft.sources.Sources.loadJdbc(s, url, "region_jdbc")
        .join(Tables.load(s, dir, "nation"),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_nations"))
        .select(col("r_name").as("region"), col("n_nations"))
    }),

    // -- Mondrian XML catalog (§2.1 catalog sources): a reference
    // user's <Schema> string binds to the parquet tables and answers
    // through the same planner — snowflake <Join>, DimensionUsage,
    // MeasureExpression, distinct-count ------------------------------
    "q_xml_catalog" -> ((s, dir) => {
      val catalog =
        """<Schema name="g">
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
          |  <Cube name="OrdersX">
          |    <Table name="orders"/>
          |    <DimensionUsage name="customer" source="customer"
          |                    foreignKey="o_custkey"/>
          |    <Measure name="total" aggregator="sum">
          |      <MeasureExpression>
          |        <SQL>cast(o_totalprice as decimal(38,10))</SQL>
          |      </MeasureExpression>
          |    </Measure>
          |    <Measure name="n_orders" column="o_orderkey"
          |             aggregator="distinct-count"/>
          |  </Cube>
          |</Schema>""".stripMargin
      val cube = graft.sources.XmlSchema
        .load(catalog, name => Tables.load(s, dir, name)).head
      Query.from(cube).columns("total", "n_orders")
        .rows(LevelMembers("customer", "region"))
        .execute()
    }),

    // -- approximate distinct (HLL sketch): oracled as an exact/approx
    // pair — the exact distinct count hash-matches DuckDB, and the
    // sketch is pinned by a relative-error bound (HLL++ default rsd
    // 0.05; we assert 3×rsd) the oracle states as a constant ----------
    "q_approx_distinct" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      Tables.load(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_orderkey")).as("exact_orders"),
          approx_count_distinct("l_orderkey").as("approx"))
        .select(col("l_returnflag"), col("exact_orders"),
          (abs(col("approx") - col("exact_orders"))
            <= col("exact_orders") * 0.15).as("approx_ok"))
    }),

    // -- stratified sampling for corpus curation: deterministic
    // hash-based Bernoulli per stratum (md5 of the stable doc_id, first
    // hex byte < threshold) — engine-independent, so DuckDB reproduces
    // the EXACT same sample: en keeps 50% ('80'/256), de keeps 25%
    // ('40'/256). At 100 TB this is a map-only filter + one partial agg.
    "q_sample_stratified" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val rate = map(lit("en"), lit("80"), lit("de"), lit("40"))
      Tables.load(s, dir, "documents")
        .filter(col("lang").isin("en", "de"))
        .filter(substring(md5(col("doc_id").cast("string")), 1, 2)
          < element_at(rate, col("lang")))
        .groupBy("lang").agg(count(lit(1)).as("n"),
          sum(col("n_chars")).as("sample_chars"))
    }),

    // -- mixed-depth member sets (§2.6): union of region- and
    // nation-level members on one axis; cells aggregate at each
    // member's OWN grain (query_test.rb:231-260 semantics) ------------
    "q_mixed_depth_union" -> ((s, dir) =>
      Mdx.execute(
        """SELECT {[Measures].[revenue], [Measures].[count_order]} ON COLUMNS,
          |  {[customer].[region].Members, [customer].[nation].Members}
          |    ON ROWS
          |FROM [Sales]""".stripMargin, sales(s, dir))),

    // -- Hierarchize POST on a mixed-depth set: children before their
    // parent; the engine's __ord is exposed so the oracle can check the
    // ORDER, not just the rows --------------------------------------
    "q_hierarchize_post" -> ((s, dir) => {
      val res = Query.from(sales(s, dir))
        .columns("count_order")
        .rows(Hierarchize(UnionSet(
          LevelMembers("customer", "region"),
          LevelMembers("customer", "nation"), all = true), post = true))
        .executeResult()
      val grid = res.rowAxis.zipWithIndex.map { case (ax, i) =>
        (i + 1, String.valueOf(ax(0)),
          Option(ax(1)).map(String.valueOf).orNull,
          res.value(i, 0).asInstanceOf[Number].longValue())
      }
      import s.implicits._
      grid.toDF("ord", "cr_region", "cr_nation", "count_order")
    }),

    // -- Filter set alias (§2.8 NamedSetCurrent/-OrdinalFunDef;
    // reference query_test.rb:635-655): S.CurrentOrdinal positions and
    // IsEmpty(S.Current) over the aliased set ------------------------
    "q_filter_alias" -> ((s, dir) =>
      Mdx.execute(
        """SELECT {[Measures].[revenue]} ON COLUMNS,
          |  Filter([customer].[nation].Members AS S,
          |    S.CurrentOrdinal < 10 AND NOT IsEmpty(S.Current)) ON ROWS
          |FROM [Sales]""".stripMargin, sales(s, dir))),

    // -- sibling navigation + Ancestors set form (§2.8): first/last
    // child of the member's parent, the region ancestor as a set ------
    "q_siblings" -> ((s, dir) =>
      Mdx.execute(
        """SELECT {[Measures].[count_order]} ON COLUMNS,
          |  {[customer].[AFRICA].[NATION_0].FirstSibling,
          |   [customer].[AFRICA].[NATION_0].LastSibling,
          |   Ancestors([customer].[AFRICA].[NATION_0],
          |     [customer].[region])} ON ROWS
          |FROM [Sales]""".stripMargin, sales(s, dir))),

    // -- typed UDF surface (§2.12, schema_udf.rb): scalar macro UDFs +
    // a member-typed property UDF, all through the MDX parser ----------
    "q_udf_scalar" -> ((s, dir) =>
      Mdx.execute(
        """WITH MEMBER [Measures].[nation_upper] AS
          |  '[customer].CurrentMember.UpperName'
          | MEMBER [Measures].[rev_pct] AS
          |  'PctOf([Measures].[revenue], [Measures].[sum_base_price])'
          | MEMBER [Measures].[fact5] AS 'Factorial(5)'
          |SELECT {[Measures].[revenue], [Measures].[nation_upper],
          |  [Measures].[rev_pct], [Measures].[fact5]} ON COLUMNS,
          |  [customer].[nation].Members ON ROWS
          |FROM [Sales]""".stripMargin, sales(s, dir))),

    // -- named cell formatter (§2.12): CELL_FORMATTER on a WITH MEMBER,
    // applied in Result.formattedValues, grid re-emitted as a frame so
    // the oracle can printf the same value -----------------------------
    "q_formatter_cell" -> ((s, dir) => {
      val res = Query.from(sales(s, dir))
        .columns("count_order", "pad_orders")
        .rows(LevelMembers("customer", "nation"))
        .withMember(CalcMember("pad_orders", ExprCalc("count_order"),
          cellFormatter = Some("Pad20")))
        .executeResult()
      val pi = res.columnNames.indexOf("pad_orders")
      val grid = res.rowAxis.zip(res.formattedValues).map { case (ax, vs) =>
        (String.valueOf(ax(0)), String.valueOf(ax(1)), vs(pi))
      }
      import s.implicits._
      grid.toDF("cr_region", "cr_nation", "pad_orders")
    }),

    // -- CurrentDateMember (§2.5): the member of the month level
    // containing the seeded "now" (deterministic via spark.graft.now;
    // reference schema_definition_test.rb:577-597) ---------------------
    "q_currentdate" -> ((s, dir) => {
      s.conf.set("spark.graft.now", "1996-07-15")
      Query.from(sales(s, dir))
        .columns("revenue")
        .rows(CurrentDateMember("time", "month", "BEFORE"))
        .execute()
    }),

    // -- Cousin (§2.8, CousinFunDef): the quarter of 1996 at the same
    // position 1995-Q2 holds under 1995 — positional, resolved from
    // data (through the raw-MDX surface) -------------------------------
    "q_cousin" -> ((s, dir) =>
      Mdx.execute(
        """SELECT {[Measures].[revenue]} ON COLUMNS,
          |  COUSIN([time].[1995].[1995-Q2], [time].[1996]) ON ROWS
          |FROM [Sales]""".stripMargin,
        sales(s, dir))),

    // -- Ascendants (§2.8, AscendantsFunDef): a month member and all
    // its ancestors — a mixed-depth axis -------------------------------
    "q_ascendants" -> ((s, dir) =>
      Mdx.execute(
        """SELECT {[Measures].[revenue]} ON COLUMNS,
          |  ASCENDANTS([time].[1995].[1995-Q2].[1995-05]) ON ROWS
          |FROM [Sales]""".stripMargin,
        sales(s, dir))),

    // -- DrilldownMember (§2.8): all regions, with the nations of
    // EUROPE and ASIA inserted under their parents ---------------------
    "q_drilldown_member" -> ((s, dir) =>
      Mdx.execute(
        """SELECT {[Measures].[revenue]} ON COLUMNS,
          |  DRILLDOWNMEMBER({[customer].[region].Members},
          |    {[customer].[EUROPE], [customer].[ASIA]}) ON ROWS
          |FROM [Sales]""".stripMargin, sales(s, dir))),

    // -- DrilldownLevelTop (§2.8): every region plus its top-2 nations
    // by revenue (rank window partitioned by the parent — no global
    // sort) ------------------------------------------------------------
    "q_drilldown_topn" -> ((s, dir) =>
      Query.from(sales(s, dir))
        .columns("revenue")
        .rows(DrilldownLevelTop(LevelMembers("customer", "region"), 2,
          "revenue"))
        .execute()),

    // -- ToggleDrillState (§2.8): EUROPE is already drilled (its
    // nations are in the set) so it collapses; ASIA is not, so it
    // expands ------------------------------------------------------------
    "q_toggle_drill" -> ((s, dir) =>
      Mdx.execute(
        """SELECT {[Measures].[revenue]} ON COLUMNS,
          |  TOGGLEDRILLSTATE(
          |    UNION({[customer].[region].Members},
          |      [customer].[EUROPE].Children, ALL),
          |    {[customer].[EUROPE], [customer].[ASIA]}) ON ROWS
          |FROM [Sales]""".stripMargin, sales(s, dir))),

    // -- member property in MDX scalar position (§2.8
    // PropertiesFunDef): the planner joins the dim's property column
    // in by the deepest level key -------------------------------------
    "q_member_props" -> ((s, dir) =>
      Mdx.execute(
        """WITH MEMBER [Measures].[segment] AS
          |    [customer].CurrentMember.Properties('c_mktsegment')
          |SELECT {[Measures].[revenue], [Measures].[segment]} ON COLUMNS,
          |  HEAD([customer].[customer].Members, 20) ON ROWS
          |FROM [Sales]""".stripMargin, sales(s, dir))),

    // -- five-axis grid (§2.1: COLUMNS/ROWS/PAGES/CHAPTERS/SECTIONS —
    // the reference's full AXIS_ALIASES surface; higher axes vary
    // slowest in the folded grid) --------------------------------------
    "q_mdx_chapters" -> ((s, dir) =>
      Mdx.execute(
        """SELECT {[Measures].[count_order], [Measures].[sum_qty]}
          |    ON COLUMNS,
          |  [returnflag].[returnflag].Members ON ROWS,
          |  [customer].[region].Members ON PAGES,
          |  [linestatus].[linestatus].Members ON CHAPTERS,
          |  [priority].[priority].Members ON SECTIONS
          |FROM [Sales]""".stripMargin, sales(s, dir))),

    // -- MDX string/conversion expressions (§2.8: Cast, Format,
    // SetToStr, TupleToStr — mondrian_test.rb:491-517) -----------------
    "q_mdx_strfns" -> ((s, dir) =>
      Mdx.execute(
        """WITH MEMBER [Measures].[cnt_dbl] AS
          |    Cast([Measures].[count_order] AS NUMERIC)
          |  MEMBER [Measures].[price_fmt] AS
          |    Format([Measures].[min_price], '#,##0.00')
          |  MEMBER [Measures].[set_str] AS
          |    SetToStr({[customer].[EUROPE], [customer].[ASIA]})
          |  MEMBER [Measures].[tup_str] AS
          |    TupleToStr(([customer].[EUROPE], [time].[1995]))
          |SELECT {[Measures].[count_order], [Measures].[cnt_dbl],
          |  [Measures].[price_fmt], [Measures].[set_str],
          |  [Measures].[tup_str]} ON COLUMNS,
          |  [customer].[region].Members ON ROWS
          |FROM [Sales]""".stripMargin, sales(s, dir))),

    // -- CASE / Iif / CoalesceEmpty / IsEmpty / MATCHES over cells with
    // genuine empties (crossjoin keeps null cells) ---------------------
    "q_predicates" -> ((s, dir) =>
      Query.from(sales(s, dir))
        .columns("revenue", "rev_band", "rev_nvl", "is_empty", "if_flag",
          "name_match")
        .rows(CrossJoin(Children("customer", Seq("EUROPE")),
          LevelMembers("part", "brand")))
        .where(MemberSlice("time", Seq(1995, "1995-Q1", "1995-01")))
        .withMember(CalcMember("rev_band", ExprCalc(
          "CASE WHEN revenue > 5000 THEN 'high' " +
            "WHEN revenue > 1000 THEN 'mid' ELSE 'low' END")))
        .withMember(CalcMember("rev_nvl", ExprCalc(
          "coalesce(revenue, CAST(0 AS DECIMAL(38,10)))")))
        .withMember(CalcMember("is_empty", ExprCalc("revenue IS NULL")))
        .withMember(CalcMember("if_flag", ExprCalc(
          "if(revenue IS NULL, 0, 1)")))
        .withMember(CalcMember("name_match", ExprCalc(
          "cr_nation rlike 'NATION_1[0-9]'")))
        .execute())
  )

  val oracleSql: Map[String, String] = Map(
    "q_member_props" ->
      s"""WITH m AS (
         |  SELECT r_name AS cr_region, n_name AS cr_nation, c_name,
         |    c_mktsegment,
         |    row_number() OVER (ORDER BY r_name, n_name, c_name) AS rk
         |  FROM customer JOIN nation ON c_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey),
         |agg AS (
         |  SELECT r_name, n_name, c_name, $REV AS revenue
         |  $CJOIN GROUP BY 1, 2, 3)
         |SELECT m.cr_region, m.cr_nation, m.c_name, a.revenue,
         |  m.c_mktsegment AS segment
         |FROM m LEFT JOIN agg a
         |  ON a.r_name = m.cr_region AND a.n_name = m.cr_nation
         |  AND a.c_name = m.c_name
         |WHERE m.rk <= 20""".stripMargin,

    "q_mdx_chapters" ->
      s"""WITH pr AS (SELECT DISTINCT o_orderpriority FROM orders),
         |ls AS (SELECT DISTINCT l_linestatus FROM lineitem),
         |rg AS (SELECT DISTINCT r_name FROM region),
         |rf AS (SELECT DISTINCT l_returnflag FROM lineitem),
         |agg AS (
         |  SELECT o_orderpriority, l_linestatus, r_name, l_returnflag,
         |    count(*) AS count_order, sum(l_quantity) AS sum_qty
         |  $CJOIN GROUP BY 1, 2, 3, 4)
         |SELECT pr.o_orderpriority, ls.l_linestatus,
         |  rg.r_name AS cr_region, rf.l_returnflag,
         |  a.count_order, a.sum_qty
         |FROM pr CROSS JOIN ls CROSS JOIN rg CROSS JOIN rf
         |LEFT JOIN agg a
         |  ON a.o_orderpriority = pr.o_orderpriority
         |  AND a.l_linestatus = ls.l_linestatus
         |  AND a.r_name = rg.r_name
         |  AND a.l_returnflag = rf.l_returnflag""".stripMargin,

    "q_approx_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_orderkey) AS exact_orders,
        |  TRUE AS approx_ok
        |FROM lineitem GROUP BY 1""".stripMargin,

    "q_sample_stratified" ->
      """SELECT lang, count(*) AS n,
      |  CAST(sum(n_chars) AS BIGINT) AS sample_chars
        |FROM documents
        |WHERE lang IN ('en', 'de')
        |  AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
        |    CASE lang WHEN 'en' THEN '80' ELSE '40' END
        |GROUP BY 1""".stripMargin,

    "q_mdx_strfns" ->
      s"""WITH cells AS (
         |  SELECT r_name AS cr_region, count(*) AS count_order,
         |    min(l_extendedprice) AS min_price
         |  $CJOIN GROUP BY 1)
         |SELECT cr_region, count_order,
         |  CAST(count_order AS DOUBLE) AS cnt_dbl,
         |  format('{:,}', CAST(floor(min_price) AS BIGINT)) || '.' ||
         |    lpad(CAST(CAST(min_price * 100 AS BIGINT) % 100
         |      AS VARCHAR), 2, '0') AS price_fmt,
         |  '{[customer].[EUROPE], [customer].[ASIA]}' AS set_str,
         |  '([customer].[EUROPE], [time].[1995])' AS tup_str
         |FROM cells""".stripMargin,

    "q_currentdate" ->
      s"""SELECT CAST(1996 AS INT) AS d_year, '1996-Q3' AS d_yq,
         |  '1996-07' AS d_ym, $REV AS revenue
         |$LO WHERE $MONTH = '1996-07'""".stripMargin,

    // positional mirror of CousinSet: sibling position by dense_rank
    // within the parent, transplanted under the new ancestor
    "q_cousin" ->
      s"""WITH t AS (
         |  SELECT DISTINCT CAST(year(o_orderdate) AS INTEGER) AS d_year,
         |    CAST(year(o_orderdate) AS VARCHAR) || '-Q' ||
         |      CAST(quarter(o_orderdate) AS VARCHAR) AS d_yq
         |  FROM orders),
         |pos AS (
         |  SELECT d_year, d_yq,
         |    dense_rank() OVER (PARTITION BY d_year ORDER BY d_yq) AS p
         |  FROM t),
         |tgt AS (
         |  SELECT pos.d_year, pos.d_yq FROM pos
         |  JOIN (SELECT p FROM pos WHERE d_yq = '1995-Q2') s USING (p)
         |  WHERE pos.d_year = 1996)
         |SELECT tgt.d_year, tgt.d_yq, $REV AS revenue
         |FROM tgt, lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE CAST(year(o_orderdate) AS VARCHAR) || '-Q' ||
         |  CAST(quarter(o_orderdate) AS VARCHAR) = tgt.d_yq
         |GROUP BY 1, 2""".stripMargin,

    "q_ascendants" ->
      s"""SELECT CAST(1995 AS INT) AS d_year,
         |  CAST('1995-Q2' AS VARCHAR) AS d_yq,
         |  CAST('1995-05' AS VARCHAR) AS d_ym, $REV AS revenue
         |$LO WHERE $MONTH = '1995-05'
         |UNION ALL
         |SELECT 1995, '1995-Q2', CAST(NULL AS VARCHAR), $REV
         |$LO WHERE year(o_orderdate) = 1995 AND quarter(o_orderdate) = 2
         |UNION ALL
         |SELECT 1995, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), $REV
         |$LO WHERE year(o_orderdate) = 1995""".stripMargin,

    "q_drilldown_member" ->
      s"""SELECT r_name AS cr_region, CAST(NULL AS VARCHAR) AS cr_nation,
         |  $REV AS revenue
         |$CJOIN GROUP BY 1
         |UNION ALL
         |SELECT r_name, n_name, $REV
         |$CJOIN WHERE r_name IN ('EUROPE', 'ASIA') GROUP BY 1, 2"""
        .stripMargin,

    "q_drilldown_topn" ->
      s"""WITH nat AS (
         |  SELECT r_name AS cr_region, n_name AS cr_nation,
         |    $REV AS revenue
         |  $CJOIN GROUP BY 1, 2),
         |ranked AS (
         |  SELECT cr_region, cr_nation, revenue, row_number() OVER (
         |    PARTITION BY cr_region
         |    ORDER BY revenue DESC, cr_nation) AS rk
         |  FROM nat)
         |SELECT r_name AS cr_region, CAST(NULL AS VARCHAR) AS cr_nation,
         |  $REV AS revenue
         |$CJOIN GROUP BY 1
         |UNION ALL
         |SELECT cr_region, cr_nation, revenue FROM ranked
         |WHERE rk <= 2""".stripMargin,

    "q_toggle_drill" ->
      s"""SELECT r_name AS cr_region, CAST(NULL AS VARCHAR) AS cr_nation,
         |  $REV AS revenue
         |$CJOIN GROUP BY 1
         |UNION ALL
         |SELECT r_name, n_name, $REV
         |$CJOIN WHERE r_name = 'ASIA' GROUP BY 1, 2""".stripMargin,

    "q_mixed_depth_union" ->
      s"""SELECT r_name AS cr_region, n_name AS cr_nation,
         |  $REV AS revenue, count(*) AS count_order
         |$CJOIN
         |GROUP BY GROUPING SETS ((r_name), (r_name, n_name))"""
        .stripMargin,

    // hierarchical order = (region, nation); first 10 positions with a
    // non-empty revenue cell
    "q_filter_alias" ->
      s"""WITH cells AS (
         |  SELECT r_name AS cr_region, n_name AS cr_nation,
         |    $REV AS revenue
         |  $CJOIN
         |  GROUP BY 1, 2),
         |pos AS (
         |  SELECT n.n_name AS cr_nation, r.r_name AS cr_region,
         |    row_number() OVER (ORDER BY r.r_name, n.n_name) - 1 AS ord
         |  FROM nation n JOIN region r ON n_regionkey = r_regionkey)
         |SELECT c.cr_region, c.cr_nation, c.revenue FROM cells c
         |JOIN pos p ON c.cr_nation = p.cr_nation
         |WHERE p.ord < 10 AND c.revenue IS NOT NULL""".stripMargin,

    // first/last sibling = min/max nation name under AFRICA (member
    // ordinal = name); members enumerate from the dim, so LEFT JOIN
    // keeps them even with no fact rows
    "q_siblings" ->
      s"""WITH afr AS (
         |  SELECT n_name FROM nation
         |  JOIN region ON n_regionkey = r_regionkey
         |  WHERE r_name = 'AFRICA'),
         |mems AS (
         |  SELECT 'AFRICA' AS cr_region, min(n_name) AS cr_nation FROM afr
         |  UNION ALL SELECT 'AFRICA', max(n_name) FROM afr
         |  UNION ALL SELECT 'AFRICA', NULL),
         |cells AS (
         |  SELECT r_name AS cr_region, n_name AS cr_nation,
         |    count(*) AS count_order
         |  $CJOIN
         |  GROUP BY GROUPING SETS ((r_name), (r_name, n_name)))
         |SELECT m.cr_region, m.cr_nation, c.count_order
         |FROM mems m LEFT JOIN cells c
         |  ON m.cr_region = c.cr_region
         |  AND m.cr_nation IS NOT DISTINCT FROM c.cr_nation""".stripMargin,

    // POST order: within a region, nations (ordered) first, then the
    // region's own row
    "q_hierarchize_post" ->
      s"""WITH cells AS (
         |  SELECT r_name AS cr_region, n_name AS cr_nation,
         |    count(*) AS count_order
         |  $CJOIN
         |  GROUP BY GROUPING SETS ((r_name), (r_name, n_name)))
         |SELECT CAST(row_number() OVER (ORDER BY cr_region,
         |    CASE WHEN cr_nation IS NULL THEN 1 ELSE 0 END, cr_nation)
         |    AS INT) AS ord,
         |  cr_region, cr_nation, count_order
         |FROM cells""".stripMargin,

    "q_udf_scalar" ->
      s"""SELECT r_name AS cr_region, n_name AS cr_nation,
         |  $REV AS revenue,
         |  upper(n_name) AS nation_upper,
         |  100.0 * CAST($REV AS DOUBLE)
         |    / CAST(sum(CAST(l_extendedprice AS DECIMAL(38,10))) AS DOUBLE)
         |    AS rev_pct,
         |  CAST(120 AS DOUBLE) AS fact5
         |$CJOIN
         |GROUP BY 1, 2""".stripMargin,

    "q_formatter_cell" ->
      s"""SELECT r_name AS cr_region, n_name AS cr_nation,
         |  printf('%020d', count(*)) AS pad_orders
         |$CJOIN
         |GROUP BY 1, 2""".stripMargin,

    "q_drilldown_level" ->
      s"""SELECT r_name AS cr_region, n_name AS cr_nation,
         |  $REV AS revenue, sum(l_quantity) AS sum_qty
         |$CJOIN
         |GROUP BY GROUPING SETS ((r_name), (r_name, n_name))"""
        .stripMargin,

    "q_parentchild" ->
      s"""WITH RECURSIVE memb(member, parent) AS (
         |  SELECT r_name, CAST(NULL AS VARCHAR) FROM region
         |  UNION ALL
         |  SELECT n_name, r_name FROM nation
         |  JOIN region ON n_regionkey = r_regionkey),
         |cl(anc, des) AS (
         |  SELECT member, member FROM memb
         |  UNION ALL
         |  SELECT cl.anc, m.member FROM cl
         |  JOIN memb m ON m.parent = cl.des),
         |rev AS (
         |  SELECT n_name AS nation, $REV AS revenue
         |  $CJOIN GROUP BY 1)
         |SELECT cl.anc AS member, sum(rev.revenue) AS subtree_total
         |FROM cl JOIN rev ON rev.nation = cl.des
         |GROUP BY 1""".stripMargin,

    // Extract projects the NECJ set onto brands; cells then aggregate
    // in the full query context (no slicer), so revenue is the TOTAL
    // per brand, limited to brands that co-occur with EUROPE customers
    "q_extract" ->
      s"""SELECT p_brand, $REV AS revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE p_brand IN (
         |  SELECT DISTINCT p_brand
         |  $CJOIN JOIN part ON l_partkey = p_partkey
         |  WHERE r_name = 'EUROPE')
         |GROUP BY 1""".stripMargin,

    "q_generate_string" ->
      """SELECT cr_region,
        |  string_agg(cr_nation, ', ' ORDER BY cr_nation) AS nations
        |FROM (
        |  SELECT DISTINCT r_name AS cr_region, n_name AS cr_nation
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey)
        |GROUP BY 1""".stripMargin,

    "q_weekly_agg" ->
      s"""SELECT CAST(isoyear(o_orderdate) AS INT) AS w_year,
         |  CAST(isoyear(o_orderdate) * 100 + weekofyear(o_orderdate)
         |    AS INT) AS w_week,
         |  $REV AS revenue, count(*) AS count_order
         |$LO WHERE isoyear(o_orderdate) = 1995
         |GROUP BY 1, 2""".stripMargin,

    "q_events_agg" ->
      """SELECT event_type, count(*) AS n_events,
        |  sum(CAST(value AS DECIMAL(38,10))) AS sum_value,
        |  count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1""".stripMargin,

    "q_jdbc_dim" ->
      """SELECT r_name AS region, count(*) AS n_nations
        |FROM region JOIN nation ON n_regionkey = r_regionkey
        |GROUP BY 1""".stripMargin,

    "q_xml_catalog" ->
      """SELECT r_name, sum(CAST(o_totalprice AS DECIMAL(38,10))) AS total,
        |  count(DISTINCT o_orderkey) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1""".stripMargin,

    "q_predicates" ->
      s"""WITH nations AS (
         |  SELECT DISTINCT r_name AS cr_region, n_name AS cr_nation
         |  FROM customer JOIN nation ON c_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |  WHERE r_name = 'EUROPE'),
         |brands AS (SELECT DISTINCT p_brand FROM part),
         |agg AS (
         |  SELECT n_name AS cr_nation, p_brand, $REV AS revenue
         |  $CJOIN JOIN part ON l_partkey = p_partkey
         |  WHERE r_name = 'EUROPE' AND $MONTH = '1995-01'
         |  GROUP BY 1, 2),
         |cells AS (
         |  SELECT n.cr_region, n.cr_nation, b.p_brand, a.revenue
         |  FROM nations n CROSS JOIN brands b
         |  LEFT JOIN agg a
         |    ON a.cr_nation = n.cr_nation AND a.p_brand = b.p_brand)
         |SELECT cr_region, cr_nation, p_brand, revenue,
         |  CASE WHEN revenue > 5000 THEN 'high'
         |    WHEN revenue > 1000 THEN 'mid' ELSE 'low' END AS rev_band,
         |  coalesce(revenue, CAST(0 AS DECIMAL(38,10))) AS rev_nvl,
         |  revenue IS NULL AS is_empty,
         |  CASE WHEN revenue IS NULL THEN 0 ELSE 1 END AS if_flag,
         |  regexp_matches(cr_nation, 'NATION_1[0-9]') AS name_match
         |FROM cells""".stripMargin
  )
}
