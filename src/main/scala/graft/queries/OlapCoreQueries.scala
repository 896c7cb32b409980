package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Cubes
import graft.olap._

/** Core OLAP operator battery (SURVEY §2.1-2.4, §2.6-2.8): every query is
  * built through the engine (Query builder → IR → Planner) and paired with
  * an equivalent DuckDB oracle SQL over the same parquet tables.
  *
  * Column-name discipline: the Spark result columns and the oracle SQL
  * aliases must match exactly (the driver sorts columns by name before
  * hashing).
  */
object OlapCoreQueries {

  private def sales(s: SparkSession, dir: String) = Cubes.sales(s, dir)

  // shared SQL fragments for the oracles
  private val REV =
    "sum(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(38,10)))"
  private val LO = "FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
  private val CJOIN = s"$LO JOIN customer ON o_custkey = c_custkey " +
    "JOIN nation ON c_nationkey = n_nationkey " +
    "JOIN region ON n_regionkey = r_regionkey"
  private val PJOIN = "FROM lineitem JOIN part ON l_partkey = p_partkey"
  private val MONTH = "strftime(o_orderdate, '%Y-%m')"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- aggregation (§2.4) --------------------------------------------
    "q1_agg" -> ((s, dir) =>
      Query.from(sales(s, dir))
        .columns("sum_qty")
        .rows(LevelMembers("returnflag", "returnflag"))
        .execute()),

    "q_agg_all6" -> ((s, dir) =>
      Query.from(sales(s, dir))
        .columns("sum_qty", "avg_qty", "min_price", "max_price",
          "count_order", "n_orders")
        .rows(CrossJoin(LevelMembers("returnflag", "returnflag"),
          LevelMembers("linestatus", "linestatus")))
        .nonempty()
        .execute()),

    "q_measure_expr" -> ((s, dir) =>
      Query.from(sales(s, dir))
        .columns("revenue", "charge")
        .rows(LevelMembers("returnflag", "returnflag"))
        .execute()),

    "q_distinct_count" -> ((s, dir) =>
      Query.from(sales(s, dir))
        .columns("n_orders", "n_custs", "n_bulk_parts")
        .rows(LevelMembers("priority", "priority"))
        .execute()),

    "q_grand_total" -> ((s, dir) =>
      Query.from(sales(s, dir))
        .columns("revenue", "sum_qty", "n_orders")
        .execute()),

    "q_calc_member" -> ((s, dir) =>
      Query.from(sales(s, dir))
        .columns("revenue", "sum_base_price", "margin")
        .rows(LevelMembers("returnflag", "returnflag"))
        .execute()),

    // -- star / snowflake joins (§2.3) ---------------------------------
    "q_star_region" -> ((s, dir) =>
      Query.from(sales(s, dir))
        .columns("revenue")
        .rows(LevelMembers("customer", "region"))
        .execute()),

    "q_snowflake_supplier" -> ((s, dir) =>
      Query.from(sales(s, dir))
        .columns("revenue")
        .rows(LevelMembers("supplier", "nation"))
        .execute()),

    // -- slicer (§2.2) -------------------------------------------------
    "q_slicer_tuple" -> ((s, dir) =>
      Query.from(sales(s, dir))
        .columns("revenue")
        .rows(LevelMembers("supplier", "nation"))
        .where(MemberSlice("customer", Seq("EUROPE")),
          MemberSlice("time", Seq(1995)))
        .execute()),

    "q_slicer_set" -> ((s, dir) =>
      Query.from(sales(s, dir))
        .columns("revenue")
        .rows(LevelMembers("part", "brand"))
        .where(SetSlice("customer", Seq(Seq("ASIA"), Seq("EUROPE"))))
        .execute()),

    // -- member navigation (§2.8) --------------------------------------
    "q_children" -> ((s, dir) =>
      Query.from(sales(s, dir))
        .columns("sum_qty", "revenue")
        .rows(Children("customer", Seq("EUROPE")))
        .execute()),

    "q_members" -> ((s, dir) =>
      new CubeMetadata(sales(s, dir)).levelMembers("customer", "nation")),

    // -- filter / HAVING (§2.2) ----------------------------------------
    "q_filter_having" -> ((s, dir) =>
      Query.from(sales(s, dir))
        .columns("avg_qty", "revenue")
        .rows(LevelMembers("customer", "nation"))
        .filter("avg_qty > 25")
        .execute()),

    // -- top-k family (§2.6) -------------------------------------------
    "q_topcount" -> ((s, dir) =>
      Query.from(sales(s, dir))
        .columns("revenue")
        .rows(LevelMembers("part", "brand"))
        .topCount(5, "revenue")
        .execute()),

    "q_bottomcount" -> ((s, dir) =>
      Query.from(sales(s, dir))
        .columns("revenue")
        .rows(LevelMembers("customer", "nation"))
        .bottomCount(3, "revenue")
        .execute()),

    "q_toppercent" -> ((s, dir) =>
      Query.from(sales(s, dir))
        .columns("revenue")
        .rows(LevelMembers("part", "brand"))
        .topPercent(30.0, "revenue")
        .execute()),

    "q_topsum" -> ((s, dir) =>
      Query.from(sales(s, dir))
        .columns("revenue")
        .rows(LevelMembers("part", "brand"))
        .topSum(1000.0, "revenue")
        .execute()),

    "q_head" -> ((s, dir) =>
      Query.from(sales(s, dir))
        .columns("revenue")
        .rows(LevelMembers("customer", "nation"))
        .order("revenue", SortDir.BDesc)
        .head(4)
        .execute()),

    "q_subset" -> ((s, dir) =>
      Query.from(sales(s, dir))
        .columns("revenue")
        .rows(LevelMembers("customer", "nation"))
        .order("revenue", SortDir.BDesc)
        .subset(5, 5)
        .execute()),

    "q_tail" -> ((s, dir) =>
      Query.from(sales(s, dir))
        .columns("revenue")
        .rows(LevelMembers("customer", "nation"))
        .order("revenue", SortDir.BDesc)
        .tail(3)
        .execute()),

    "q_order_bdesc" -> ((s, dir) =>
      Query.from(sales(s, dir))
        .columns("revenue")
        .rows(LevelMembers("customer", "nation"))
        .order("revenue", SortDir.BDesc)
        .execute()),

    // -- set operations (§2.7) -----------------------------------------
    "q_except" -> ((s, dir) =>
      Query.from(sales(s, dir))
        .columns("revenue")
        .rows(LevelMembers("customer", "nation"))
        .except(Children("customer", Seq("EUROPE")))
        .execute()),

    "q_intersect" -> ((s, dir) =>
      Query.from(sales(s, dir))
        .columns("revenue")
        .rows(Children("customer", Seq("EUROPE")))
        .intersect(Members("customer", Seq(
          Seq("EUROPE", "NATION_13"), Seq("EUROPE", "NATION_3"),
          Seq("ASIA", "NATION_2"))))
        .execute()),

    "q_union" -> ((s, dir) =>
      Query.from(sales(s, dir))
        .columns("revenue")
        .rows(Children("customer", Seq("EUROPE")))
        .union(Children("customer", Seq("ASIA")))
        .execute()),

    "q_range" -> ((s, dir) =>
      Query.from(sales(s, dir))
        .columns("revenue")
        .rows(MemberRange("time", "month", "1995-01", "1995-06"))
        .execute()),

    "q_namedset" -> ((s, dir) =>
      Query.from(sales(s, dir))
        .columns("revenue", "sum_qty")
        .withSet("top3_brands",
          TopCount(LevelMembers("part", "brand"), 3, "revenue"))
        .rows(NamedSetRef("top3_brands"))
        .execute()),

    // -- crossjoin & empty-cell semantics (§2.3, §7.4#4) ---------------
    "q_crossjoin" -> ((s, dir) =>
      Query.from(sales(s, dir))
        .columns("revenue")
        .rows(CrossJoin(Children("customer", Seq("EUROPE")),
          LevelMembers("part", "brand")))
        .where(MemberSlice("time", Seq(1995, "1995-Q1", "1995-01")))
        .execute()),

    "q_nonempty" -> ((s, dir) =>
      Query.from(sales(s, dir))
        .columns("revenue")
        .rows(CrossJoin(Children("customer", Seq("EUROPE")),
          LevelMembers("part", "brand")))
        .where(MemberSlice("time", Seq(1995, "1995-Q1", "1995-01")))
        .nonempty()
        .execute()),

    "q_nonempty_crossjoin" -> ((s, dir) =>
      Query.from(sales(s, dir))
        .columns("revenue")
        .rows(NonEmptyCrossJoin(Children("customer", Seq("EUROPE")),
          LevelMembers("part", "brand")))
        .where(MemberSlice("time", Seq(1995, "1995-Q1", "1995-01")))
        .execute())
  )

  val oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      s"""SELECT l_returnflag, sum(l_quantity) AS sum_qty
         |FROM lineitem GROUP BY 1""".stripMargin,

    "q_agg_all6" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  sum(l_quantity) AS sum_qty, avg(l_quantity) AS avg_qty,
         |  min(l_extendedprice) AS min_price,
         |  max(l_extendedprice) AS max_price,
         |  count(*) AS count_order,
         |  count(DISTINCT l_orderkey) AS n_orders
         |FROM lineitem GROUP BY 1, 2""".stripMargin,

    "q_measure_expr" ->
      s"""SELECT l_returnflag, $REV AS revenue,
         |  sum(CAST((l_extendedprice * (1 - l_discount) * (1 + l_tax))
         |    AS DECIMAL(38,10))) AS charge
         |FROM lineitem GROUP BY 1""".stripMargin,

    "q_distinct_count" ->
      s"""SELECT o_orderpriority,
         |  count(DISTINCT l_orderkey) AS n_orders,
         |  count(DISTINCT o_custkey) AS n_custs,
         |  count(DISTINCT CASE WHEN l_quantity > 30 THEN l_partkey END)
         |    AS n_bulk_parts
         |$LO GROUP BY 1""".stripMargin,

    "q_grand_total" ->
      s"""SELECT $REV AS revenue, sum(l_quantity) AS sum_qty,
         |  count(DISTINCT l_orderkey) AS n_orders
         |FROM lineitem""".stripMargin,

    "q_calc_member" ->
      s"""SELECT l_returnflag, $REV AS revenue,
         |  sum(CAST(l_extendedprice AS DECIMAL(38,10))) AS sum_base_price,
         |  CAST($REV AS DOUBLE) /
         |    CAST(sum(CAST(l_extendedprice AS DECIMAL(38,10))) AS DOUBLE) AS margin
         |FROM lineitem GROUP BY 1""".stripMargin,

    "q_star_region" ->
      s"""SELECT r_name AS cr_region, $REV AS revenue
         |$CJOIN GROUP BY 1""".stripMargin,

    "q_snowflake_supplier" ->
      s"""SELECT sr.r_name AS sr_region, sn.n_name AS sr_nation,
         |  $REV AS revenue
         |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation sn ON s_nationkey = sn.n_nationkey
         |JOIN region sr ON sn.n_regionkey = sr.r_regionkey
         |GROUP BY 1, 2""".stripMargin,

    "q_slicer_tuple" ->
      s"""SELECT sr.r_name AS sr_region, sn.n_name AS sr_nation,
         |  $REV AS revenue
         |$LO
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation cn ON c_nationkey = cn.n_nationkey
         |JOIN region cr ON cn.n_regionkey = cr.r_regionkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation sn ON s_nationkey = sn.n_nationkey
         |JOIN region sr ON sn.n_regionkey = sr.r_regionkey
         |WHERE cr.r_name = 'EUROPE' AND year(o_orderdate) = 1995
         |GROUP BY 1, 2""".stripMargin,

    "q_slicer_set" ->
      s"""SELECT p_brand, $REV AS revenue
         |$CJOIN JOIN part ON l_partkey = p_partkey
         |WHERE r_name IN ('ASIA', 'EUROPE') GROUP BY 1""".stripMargin,

    "q_children" ->
      s"""SELECT r_name AS cr_region, n_name AS cr_nation,
         |  sum(l_quantity) AS sum_qty, $REV AS revenue
         |$CJOIN WHERE r_name = 'EUROPE' GROUP BY 1, 2""".stripMargin,

    "q_members" ->
      s"""SELECT DISTINCT r_name AS cr_region, n_name AS cr_nation
         |FROM customer JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey""".stripMargin,

    "q_filter_having" ->
      s"""SELECT r_name AS cr_region, n_name AS cr_nation,
         |  avg(l_quantity) AS avg_qty, $REV AS revenue
         |$CJOIN GROUP BY 1, 2 HAVING avg(l_quantity) > 25""".stripMargin,

    "q_topcount" ->
      s"""SELECT p_brand, $REV AS revenue
         |$PJOIN GROUP BY 1 ORDER BY revenue DESC, p_brand LIMIT 5""".stripMargin,

    "q_bottomcount" ->
      s"""SELECT r_name AS cr_region, n_name AS cr_nation, $REV AS revenue
         |$CJOIN GROUP BY 1, 2 ORDER BY revenue ASC, cr_region, cr_nation LIMIT 3""".stripMargin,

    "q_toppercent" ->
      s"""WITH b AS (
         |  SELECT p_brand, $REV AS revenue $PJOIN GROUP BY 1),
         |c AS (
         |  SELECT p_brand, revenue,
         |    sum(revenue) OVER (ORDER BY revenue DESC, p_brand
         |      ROWS UNBOUNDED PRECEDING) AS cum,
         |    sum(revenue) OVER () AS tot
         |  FROM b)
         |SELECT p_brand, revenue FROM c
         |WHERE cum - revenue < 0.30 * tot""".stripMargin,

    "q_topsum" ->
      s"""WITH b AS (
         |  SELECT p_brand, $REV AS revenue $PJOIN GROUP BY 1),
         |c AS (
         |  SELECT p_brand, revenue,
         |    sum(revenue) OVER (ORDER BY revenue DESC, p_brand
         |      ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM b)
         |SELECT p_brand, revenue FROM c
         |WHERE cum - revenue < 1000.0""".stripMargin,

    "q_head" ->
      s"""SELECT r_name AS cr_region, n_name AS cr_nation, $REV AS revenue
         |$CJOIN GROUP BY 1, 2 ORDER BY revenue DESC, cr_region, cr_nation LIMIT 4""".stripMargin,

    "q_subset" ->
      s"""SELECT r_name AS cr_region, n_name AS cr_nation, $REV AS revenue
         |$CJOIN GROUP BY 1, 2
         |ORDER BY revenue DESC, cr_region, cr_nation LIMIT 5 OFFSET 5""".stripMargin,

    "q_tail" ->
      s"""SELECT r_name AS cr_region, n_name AS cr_nation, $REV AS revenue
         |$CJOIN GROUP BY 1, 2 ORDER BY revenue ASC, cr_region, cr_nation LIMIT 3""".stripMargin,

    "q_order_bdesc" ->
      s"""SELECT r_name AS cr_region, n_name AS cr_nation, $REV AS revenue
         |$CJOIN GROUP BY 1, 2 ORDER BY revenue DESC""".stripMargin,

    "q_except" ->
      s"""SELECT r_name AS cr_region, n_name AS cr_nation, $REV AS revenue
         |$CJOIN WHERE r_name <> 'EUROPE' GROUP BY 1, 2""".stripMargin,

    "q_intersect" ->
      s"""SELECT r_name AS cr_region, n_name AS cr_nation, $REV AS revenue
         |$CJOIN WHERE r_name = 'EUROPE'
         |  AND n_name IN ('NATION_13', 'NATION_3')
         |GROUP BY 1, 2""".stripMargin,

    "q_union" ->
      s"""SELECT r_name AS cr_region, n_name AS cr_nation, $REV AS revenue
         |$CJOIN WHERE r_name IN ('EUROPE', 'ASIA') GROUP BY 1, 2"""
        .stripMargin,

    "q_range" ->
      s"""SELECT CAST(year(o_orderdate) AS INTEGER) AS d_year,
         |  CAST(year(o_orderdate) AS VARCHAR) || '-Q' ||
         |    CAST(quarter(o_orderdate) AS VARCHAR) AS d_yq,
         |  $MONTH AS d_ym, $REV AS revenue
         |$LO WHERE $MONTH BETWEEN '1995-01' AND '1995-06'
         |GROUP BY 1, 2, 3""".stripMargin,

    "q_namedset" ->
      s"""SELECT p_brand, $REV AS revenue, sum(l_quantity) AS sum_qty
         |$PJOIN GROUP BY 1 ORDER BY revenue DESC, p_brand LIMIT 3""".stripMargin,

    "q_crossjoin" ->
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
         |  GROUP BY 1, 2)
         |SELECT n.cr_region, n.cr_nation, b.p_brand, a.revenue
         |FROM nations n CROSS JOIN brands b
         |LEFT JOIN agg a
         |  ON a.cr_nation = n.cr_nation AND a.p_brand = b.p_brand"""
        .stripMargin,

    "q_nonempty" ->
      s"""SELECT r_name AS cr_region, n_name AS cr_nation, p_brand,
         |  $REV AS revenue
         |$CJOIN JOIN part ON l_partkey = p_partkey
         |WHERE r_name = 'EUROPE' AND $MONTH = '1995-01'
         |GROUP BY 1, 2, 3""".stripMargin,

    "q_nonempty_crossjoin" ->
      s"""SELECT r_name AS cr_region, n_name AS cr_nation, p_brand,
         |  $REV AS revenue
         |$CJOIN JOIN part ON l_partkey = p_partkey
         |WHERE r_name = 'EUROPE' AND $MONTH = '1995-01'
         |GROUP BY 1, 2, 3""".stripMargin
  )
}
