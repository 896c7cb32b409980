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

    // -- approximate distinct (HLL sketch — no exact oracle, the
    // driver records a rows-only check) --------------------------------
    "q_approx_distinct" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      Tables.load(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(approx_count_distinct("l_orderkey").as("approx_orders"))
    }),

    // -- stratified sampling for corpus curation (seeded, deterministic
    // within Spark; no cross-engine oracle) ----------------------------
    "q_sample_stratified" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      Tables.load(s, dir, "documents")
        .stat.sampleBy("lang", Map("en" -> 0.5, "de" -> 0.5), 42L)
        .groupBy("lang").agg(count(lit(1)).as("n"))
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
    "q_mixed_depth_union" ->
      s"""SELECT r_name AS cr_region, n_name AS cr_nation,
         |  $REV AS revenue, count(*) AS count_order
         |$CJOIN
         |GROUP BY GROUPING SETS ((r_name), (r_name, n_name))"""
        .stripMargin,

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
