package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Cubes
import graft.olap._

/** Time intelligence / windows (SURVEY §2.5), statistics (§2.4), rollup &
  * grouping sets (§2.4 #3), VisualTotals/roles (§2.4), virtual cube
  * (§2.3), drill-through (§2.11), Generate (§2.7) — engine-built queries
  * paired with DuckDB oracles.
  */
object OlapWindowQueries {

  private def sales(s: SparkSession, dir: String) = Cubes.sales(s, dir)

  private val REV =
    "sum(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(38,10)))"
  private val LO = "FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
  private val CJOIN = s"$LO JOIN customer ON o_custkey = c_custkey " +
    "JOIN nation ON c_nationkey = n_nationkey " +
    "JOIN region ON n_regionkey = r_regionkey"
  private val MONTH = "strftime(o_orderdate, '%Y-%m')"
  /** Month-grain aggregate CTE reused by the time-navigation oracles. */
  private val MCTE =
    s"""WITH m AS (
       |  SELECT CAST(year(o_orderdate) AS INTEGER) AS d_year,
       |    CAST(year(o_orderdate) AS VARCHAR) || '-Q' ||
       |      CAST(quarter(o_orderdate) AS VARCHAR) AS d_yq,
       |    $MONTH AS d_ym, $REV AS revenue
       |  $LO GROUP BY 1, 2, 3)""".stripMargin

  private def monthRows(s: SparkSession, dir: String): Query =
    Query.from(sales(s, dir)).rows(LevelMembers("time", "month"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- time navigation windows (§2.5) --------------------------------
    "q_prev_growth" -> ((s, dir) =>
      monthRows(s, dir)
        .columns("revenue", "prev_rev", "rev_growth")
        .withMember(CalcMember("prev_rev",
          WindowCalc("revenue", WinKind.LagK(1), "time")))
        .withMember(CalcMember("rev_growth",
          ExprCalc("CAST((revenue - prev_rev) AS DOUBLE)" +
            " / CAST(prev_rev AS DOUBLE)"), solveOrder = 1))
        .execute()),

    "q_ytd" -> ((s, dir) =>
      monthRows(s, dir)
        .columns("revenue", "ytd_rev")
        .withMember(CalcMember("ytd_rev",
          WindowCalc("revenue", WinKind.RunningSum, "time", Some("year"))))
        .execute()),

    "q_parallelperiod" -> ((s, dir) =>
      monthRows(s, dir)
        .columns("revenue", "yoy_rev")
        .withMember(CalcMember("yoy_rev",
          WindowCalc("revenue", WinKind.LagK(12), "time")))
        .execute()),

    "q_lastperiods" -> ((s, dir) =>
      monthRows(s, dir)
        .columns("revenue", "rev_3m")
        .withMember(CalcMember("rev_3m",
          WindowCalc("revenue", WinKind.MovingSum(3), "time")))
        .execute()),

    "q_openclose" -> ((s, dir) =>
      monthRows(s, dir)
        .columns("revenue", "opening_rev", "closing_rev")
        .withMember(CalcMember("opening_rev",
          WindowCalc("revenue", WinKind.FirstVal, "time", Some("year"))))
        .withMember(CalcMember("closing_rev",
          WindowCalc("revenue", WinKind.LastVal, "time", Some("year"))))
        .execute()),

    "q_rank" -> ((s, dir) =>
      Query.from(sales(s, dir))
        .columns("revenue", "rank_in_region")
        .rows(LevelMembers("customer", "nation"))
        .withMember(CalcMember("rank_in_region",
          WindowCalc("revenue", WinKind.RankDesc, "customer",
            Some("region"))))
        .execute()),

    // -- statistics (§2.4) ---------------------------------------------
    "q_stats_dispersion" -> ((s, dir) =>
      Query.from(sales(s, dir))
        .columns("stdev_qty", "stdevp_qty", "var_qty", "varp_qty")
        .rows(LevelMembers("returnflag", "returnflag"))
        .execute()),

    "q_stats_bivariate" -> ((s, dir) =>
      Query.from(sales(s, dir))
        .columns("corr_qty_price", "covar_qty_price", "covarp_qty_price")
        .rows(LevelMembers("returnflag", "returnflag"))
        .execute()),

    "q_percentile" -> ((s, dir) =>
      Query.from(sales(s, dir))
        .columns("median_price", "p90_price", "q1_price", "q3_price")
        .rows(LevelMembers("returnflag", "returnflag"))
        .execute()),

    // the two intercept-derived columns are emitted at 6 dp: the
    // engines' double-moment regression folds legitimately differ at
    // ~2e-14 RELATIVE, which on a ~5e4-magnitude intercept is ~1e-9
    // absolute — right on the 9-dp boundary grid, so the battery-wide
    // 9-dp convention can land them in adjacent cells. 6 dp keeps 11
    // significant digits here and puts the grid 1000× coarser than
    // the disagreement.
    "q_linreg" -> ((s, dir) =>
      Query.from(sales(s, dir))
        .columns("slope_price_qty", "icept_price_qty", "r2_price_qty",
          "var_price_qty", "point_price_q25")
        .rows(LevelMembers("returnflag", "returnflag"))
        .execute()
        .withColumn("icept_price_qty", round(col("icept_price_qty"), 6))
        .withColumn("var_price_qty", round(col("var_price_qty"), 3))
        .withColumn("point_price_q25", round(col("point_price_q25"), 6))),

    // -- aggregate-table routing (§4 #6): the query is answered from a
    // registered nation×month rollup, never touching the fact ---------
    "q_aggroute" -> ((s, dir) =>
      Query.from(Cubes.salesWithAgg(s, dir))
        .columns("revenue", "sum_qty")
        .rows(LevelMembers("customer", "region"))
        .where(MemberSlice("time", Seq(1995)))
        .execute()),

    // -- rollup / grouping sets (§2.4 #3, "all" member = grand total) --
    "q_rollup" -> ((s, dir) =>
      new Planner(sales(s, dir)).rollupAggregate(
        Seq(("customer", "nation")), Nil, Seq("revenue", "n_orders"))),

    "q_cube_gs" -> ((s, dir) =>
      new Planner(sales(s, dir)).rollupAggregate(
        Seq(("returnflag", "returnflag"), ("linestatus", "linestatus")),
        Nil, Seq("sum_qty", "count_order"), mode = "cube")),

    // -- VisualTotals / Aggregate over a set / roles (§2.4) ------------
    "q_visualtotals" -> ((s, dir) =>
      Query.from(sales(s, dir))
        .columns("revenue")
        .rows(LevelMembers("customer", "region"))
        .where(SetSlice("customer", Seq(
          Seq("EUROPE", "NATION_13"), Seq("EUROPE", "NATION_3"))))
        .nonempty()
        .execute()),

    "q_aggregate_set" -> ((s, dir) =>
      Query.from(sales(s, dir))
        .columns("revenue", "sum_qty")
        .where(SetSlice("customer", Seq(
          Seq("EUROPE", "NATION_13"), Seq("ASIA", "NATION_2"))))
        .execute()),

    "q_role" -> ((s, dir) =>
      Query.from(sales(s, dir)
          .withRole(Role("EUROPE manager",
            Seq("customer" -> Seq("EUROPE")))))
        .columns("revenue")
        .rows(LevelMembers("customer", "nation"))
        .execute()),

    // -- virtual cube (§2.3): conformed time dim over Sales + Events ---
    "q_virtual" -> ((s, dir) =>
      new VirtualCube("SalesAndEvents", Seq(
        Cubes.sales(s, dir) -> Seq("revenue"),
        Cubes.events(s, dir) -> Seq("n_events", "sum_value")))
        .aggregate(Seq(("time", "month")))
        .select("d_ym", "revenue", "n_events", "sum_value")),

    // -- drill-through (§2.11) -----------------------------------------
    "q_drill_cell" -> ((s, dir) =>
      Query.from(sales(s, dir))
        .where(MemberSlice("customer", Seq("EUROPE", "NATION_13")),
          MemberSlice("time", Seq(1995, "1995-Q1", "1995-03")))
        .executeDrillThrough(
          returnCols = Seq("l_orderkey", "l_linenumber", "l_quantity",
            "l_extendedprice", "cr_nation", "d_ym"),
          dims = Map("customer" -> "nation", "time" -> "month"))),

    "q_drill_groupby" -> ((s, dir) =>
      Query.from(sales(s, dir))
        .where(MemberSlice("customer", Seq("EUROPE", "NATION_13")),
          MemberSlice("time", Seq(1995)))
        .executeDrillThrough(
          returnCols = Seq("cr_nation", "d_ym", "sum_qty", "revenue"),
          dims = Map("customer" -> "nation", "time" -> "month"),
          groupBy = true)),

    // -- Generate(set, expr) string form (§2.7) ------------------------
    "q_generate" -> ((s, dir) =>
      new CubeMetadata(sales(s, dir)).levelMembers("customer", "nation")
        .groupBy(col("cr_region"))
        .agg(array_join(array_sort(collect_list(col("cr_nation"))), ",")
          .as("nations")))
  )

  val oracleSql: Map[String, String] = Map(
    "q_prev_growth" ->
      s"""$MCTE
         |SELECT d_year, d_yq, d_ym, revenue,
         |  lag(revenue) OVER w AS prev_rev,
         |  CAST((revenue - lag(revenue) OVER w) AS DOUBLE)
         |    / CAST(lag(revenue) OVER w AS DOUBLE) AS rev_growth
         |FROM m WINDOW w AS (ORDER BY d_ym)""".stripMargin,

    "q_ytd" ->
      s"""$MCTE
         |SELECT d_year, d_yq, d_ym, revenue,
         |  sum(revenue) OVER (PARTITION BY d_year ORDER BY d_ym
         |    ROWS UNBOUNDED PRECEDING) AS ytd_rev
         |FROM m""".stripMargin,

    "q_parallelperiod" ->
      s"""$MCTE
         |SELECT d_year, d_yq, d_ym, revenue,
         |  lag(revenue, 12) OVER (ORDER BY d_ym) AS yoy_rev
         |FROM m""".stripMargin,

    "q_lastperiods" ->
      s"""$MCTE
         |SELECT d_year, d_yq, d_ym, revenue,
         |  sum(revenue) OVER (ORDER BY d_ym
         |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS rev_3m
         |FROM m""".stripMargin,

    "q_openclose" ->
      s"""$MCTE
         |SELECT d_year, d_yq, d_ym, revenue,
         |  first_value(revenue) OVER w AS opening_rev,
         |  last_value(revenue) OVER w AS closing_rev
         |FROM m WINDOW w AS (PARTITION BY d_year ORDER BY d_ym
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"""
        .stripMargin,

    "q_rank" ->
      s"""WITH n AS (
         |  SELECT r_name AS cr_region, n_name AS cr_nation,
         |    $REV AS revenue
         |  $CJOIN GROUP BY 1, 2)
         |SELECT cr_region, cr_nation, revenue,
         |  CAST(rank() OVER (PARTITION BY cr_region
         |    ORDER BY revenue DESC) AS INTEGER) AS rank_in_region
         |FROM n""".stripMargin,

    "q_stats_dispersion" ->
      s"""SELECT l_returnflag,
         |  stddev_samp(l_quantity) AS stdev_qty,
         |  stddev_pop(l_quantity) AS stdevp_qty,
         |  var_samp(l_quantity) AS var_qty,
         |  var_pop(l_quantity) AS varp_qty
         |FROM lineitem GROUP BY 1""".stripMargin,

    "q_stats_bivariate" ->
      s"""SELECT l_returnflag,
         |  corr(l_quantity, l_extendedprice) AS corr_qty_price,
         |  covar_samp(l_quantity, l_extendedprice) AS covar_qty_price,
         |  covar_pop(l_quantity, l_extendedprice) AS covarp_qty_price
         |FROM lineitem GROUP BY 1""".stripMargin,

    "q_percentile" ->
      s"""SELECT l_returnflag,
         |  quantile_cont(l_extendedprice, 0.5) AS median_price,
         |  quantile_cont(l_extendedprice, 0.9) AS p90_price,
         |  quantile_cont(l_extendedprice, 0.25) AS q1_price,
         |  quantile_cont(l_extendedprice, 0.75) AS q3_price
         |FROM lineitem GROUP BY 1""".stripMargin,

    "q_linreg" ->
      s"""SELECT l_returnflag,
         |  regr_slope(l_extendedprice, l_quantity) AS slope_price_qty,
         |  round(regr_intercept(l_extendedprice, l_quantity), 6)
         |    AS icept_price_qty,
         |  regr_r2(l_extendedprice, l_quantity) AS r2_price_qty,
         |  round(regr_syy(l_extendedprice, l_quantity)
         |    * (1.0 - regr_r2(l_extendedprice, l_quantity))
         |    / (regr_count(l_extendedprice, l_quantity) - 2), 3)
         |    AS var_price_qty,
         |  round(regr_slope(l_extendedprice, l_quantity)
         |    * CAST(25.0 AS DOUBLE)
         |    + regr_intercept(l_extendedprice, l_quantity), 6)
         |    AS point_price_q25
         |FROM lineitem GROUP BY 1""".stripMargin,

    "q_aggroute" ->
      s"""SELECT r_name AS cr_region, $REV AS revenue,
         |  sum(l_quantity) AS sum_qty
         |$CJOIN WHERE year(o_orderdate) = 1995
         |GROUP BY 1""".stripMargin,

    "q_rollup" ->
      s"""SELECT r_name AS cr_region, n_name AS cr_nation,
         |  $REV AS revenue, count(DISTINCT l_orderkey) AS n_orders
         |$CJOIN GROUP BY ROLLUP (r_name, n_name)""".stripMargin,

    "q_cube_gs" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  sum(l_quantity) AS sum_qty, count(*) AS count_order
         |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)"""
        .stripMargin,

    "q_visualtotals" ->
      s"""SELECT r_name AS cr_region, $REV AS revenue
         |$CJOIN WHERE n_name IN ('NATION_13', 'NATION_3')
         |GROUP BY 1""".stripMargin,

    "q_aggregate_set" ->
      s"""SELECT $REV AS revenue, sum(l_quantity) AS sum_qty
         |$CJOIN WHERE n_name IN ('NATION_13', 'NATION_2')""".stripMargin,

    "q_role" ->
      s"""SELECT r_name AS cr_region, n_name AS cr_nation, $REV AS revenue
         |$CJOIN WHERE r_name = 'EUROPE' GROUP BY 1, 2""".stripMargin,

    "q_virtual" ->
      s"""WITH a AS (
         |  SELECT $MONTH AS d_ym, $REV AS revenue $LO GROUP BY 1),
         |b AS (
         |  SELECT strftime(ts, '%Y-%m') AS d_ym, count(*) AS n_events,
         |    sum(CAST(value AS DECIMAL(38,10))) AS sum_value
         |  FROM events GROUP BY 1)
         |SELECT d_ym, revenue, n_events, sum_value
         |FROM a FULL JOIN b USING (d_ym)""".stripMargin,

    "q_drill_cell" ->
      s"""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
         |  n_name AS cr_nation, $MONTH AS d_ym
         |$CJOIN
         |WHERE r_name = 'EUROPE' AND n_name = 'NATION_13'
         |  AND $MONTH = '1995-03'""".stripMargin,

    "q_drill_groupby" ->
      s"""SELECT n_name AS cr_nation, $MONTH AS d_ym,
         |  sum(l_quantity) AS sum_qty, $REV AS revenue
         |$CJOIN
         |WHERE r_name = 'EUROPE' AND n_name = 'NATION_13'
         |  AND year(o_orderdate) = 1995
         |GROUP BY 1, 2""".stripMargin,

    "q_generate" ->
      s"""SELECT cr_region, string_agg(cr_nation, ',' ORDER BY cr_nation)
         |    AS nations
         |FROM (SELECT DISTINCT r_name AS cr_region, n_name AS cr_nation
         |      FROM customer JOIN nation ON c_nationkey = n_nationkey
         |      JOIN region ON n_regionkey = r_regionkey)
         |GROUP BY 1""".stripMargin
  )
}
