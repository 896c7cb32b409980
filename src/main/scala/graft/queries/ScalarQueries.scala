package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{FormatString, Vba}

/** Scalar-function battery (SURVEY §2.9 VBA/Excel pack, §2.12 format
  * strings): per-row column expressions over the part/orders tables,
  * oracle-checked against the equivalent DuckDB scalar functions. All
  * pure codegen'd expressions — no shuffle, no UDFs.
  */
object ScalarQueries {

  private def part(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "part")
  private def orders(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_scalar_string" -> ((s, dir) =>
      part(s, dir).select(
        col("p_partkey"),
        Vba.uCase(col("p_name")).as("uname"),
        Vba.left(col("p_name"), 5).as("l5"),
        Vba.right(col("p_name"), 3).as("r3"),
        Vba.inStr(col("p_name"), lit("a")).as("pos_a"),
        Vba.replace(col("p_name"), " ", "_").as("unders"),
        Vba.strReverse(col("p_name")).as("rev"),
        Vba.len(col("p_name")).as("nlen"),
        Vba.asc(col("p_name")).as("first_code"),
        Vba.ascB(col("p_name")).as("first_byte"),
        Vba.ascW(col("p_name")).as("first_cp"),
        Vba.chrW(col("p_size") + 64).as("chr_size"))),

    "q_scalar_math" -> ((s, dir) =>
      part(s, dir).select(
        col("p_partkey"),
        Vba.abs(col("p_size") - 25).as("abs_off"),
        Vba.sgn(col("p_size") - 25).cast("int").as("sgn_off"),
        Vba.sqr(col("p_size").cast("double")).as("sqrt_size"),
        Vba.power(col("p_size").cast("double"), lit(2.0)).as("size_sq"),
        Vba.mod(col("p_size"), lit(7)).as("size_mod7"),
        Vba.fix(lit(-1) * col("p_retailprice") / 100).cast("long")
          .as("fix_neg"),
        Vba.int(col("p_retailprice") / 100).cast("long").as("int_pos"),
        Vba.round(col("p_retailprice").cast("decimal(12,2)"), 1)
          .as("round1"))),

    "q_scalar_date" -> ((s, dir) =>
      orders(s, dir).select(
        col("o_orderkey"),
        Vba.year(col("o_orderdate")).as("y"),
        Vba.month(col("o_orderdate")).as("m"),
        Vba.day(col("o_orderdate")).as("d"),
        Vba.weekday(col("o_orderdate")).as("wd"),
        Vba.monthName(col("o_orderdate")).as("mname"),
        Vba.dateAdd("d", 30, col("o_orderdate")).as("plus30"),
        Vba.dateAdd("m", 1, to_date(col("o_orderdate"))).as("plus1m"),
        Vba.dateDiff("d", to_date(col("o_orderdate")),
          lit("1998-01-01").cast("date")).as("days_to_98"),
        Vba.dateSerial(Vba.year(col("o_orderdate")),
          Vba.month(col("o_orderdate")), lit(1)).as("month_start"),
        Vba.datePart("q", col("o_orderdate")).as("dp_quarter"),
        Vba.datePart("y", col("o_orderdate")).as("dp_doy"))),

    "q_scalar_financial" -> ((s, dir) =>
      part(s, dir).select(
        col("p_partkey"),
        Vba.pmt(lit(0.05 / 12), lit(36.0),
          col("p_retailprice")).as("pmt36"),
        Vba.fV(lit(0.05 / 12), lit(36.0), lit(-100.0),
          col("p_retailprice")).as("fv36"),
        Vba.pV(lit(0.05 / 12), lit(36.0), lit(-100.0),
          lit(0.0)).as("pv100"),
        Vba.sLN(col("p_retailprice"), lit(50.0), lit(5.0)).as("sln5"),
        Vba.sYD(col("p_retailprice"), lit(50.0), lit(5.0),
          lit(2.0)).as("syd2"),
        Vba.nPV(lit(0.08), array(lit(-1000.0), col("p_retailprice"),
          col("p_retailprice"), lit(500.0))).as("npv"),
        Vba.mIRR(array(lit(-1000.0), col("p_retailprice"), lit(500.0)),
          lit(0.10), lit(0.12)).as("mirr"))),

    // -- VBA casts + time + IsDate + Format* family (§2.9 remainder) --
    "q_scalar_casts" -> ((s, dir) => {
      val p = part(s, dir)
      p.select(
        col("p_partkey"),
        Vba.cInt(col("p_retailprice") / 7).as("cint7"),
        Vba.cLng(col("p_retailprice") * 3).as("clng3"),
        Vba.cCur(col("p_retailprice") / 3).as("ccur3"),
        Vba.cDbl(col("p_size")).as("cdbl"),
        Vba.cStr(col("p_size")).as("cstr"),
        Vba.cBool(col("p_size") % 2).as("cbool"),
        Vba.timeSerial(col("p_size") % 24, (col("p_size") * 7) % 60,
          (col("p_size") * 13) % 60).as("tserial"),
        Vba.timeValue(timestamp_seconds(col("p_partkey") % 86400))
          .as("tvalue"),
        Vba.isDate(concat(lit("1995-01-"),
          lpad((col("p_size") % 28 + 1).cast("string"), 2, "0")))
          .as("is_date_y"),
        Vba.isDate(col("p_name")).as("is_date_n"),
        Vba.typeName(p.schema("p_retailprice").dataType).as("tn_price"),
        Vba.typeName(p.schema("p_name").dataType).as("tn_name"),
        Vba.formatNumber(col("p_retailprice"), 2).as("fnum"),
        Vba.formatCurrency(col("p_retailprice"), 2).as("fcur"),
        Vba.formatPercent(col("p_size") / lit(200.0), 2).as("fpct"))
    }),

    "q_scalar_format" -> ((s, dir) =>
      part(s, dir).select(
        col("p_partkey"),
        FormatString.toColumn(
          col("p_retailprice").cast("decimal(12,2)"), "#,##0.00")
          .as("std"),
        FormatString.toColumn(
          col("p_retailprice").cast("decimal(12,2)"), "$#,##0.00")
          .as("cur"),
        FormatString.toColumn(
          (col("p_size") / lit(100)).cast("decimal(8,4)"), "0.00%")
          .as("pct"))),

    "q_scalar_format_date" -> ((s, dir) =>
      orders(s, dir).select(
        col("o_orderkey"),
        FormatString.toColumn(to_date(col("o_orderdate")), "dd.mm.yyyy")
          .as("dmy"),
        FormatString.toColumn(to_date(col("o_orderdate")), "yyyy-mm-dd")
          .as("iso")))
  )

  val oracleSql: Map[String, String] = Map(
    "q_scalar_string" ->
      """SELECT p_partkey, upper(p_name) AS uname,
        |  left(p_name, 5) AS l5, right(p_name, 3) AS r3,
        |  CAST(strpos(p_name, 'a') AS INT) AS pos_a,
        |  replace(p_name, ' ', '_') AS unders,
        |  reverse(p_name) AS rev,
        |  CAST(length(p_name) AS INT) AS nlen,
        |  CAST(ascii(p_name) AS INT) AS first_code,
        |  CAST(ascii(p_name) AS INT) AS first_byte,
        |  CAST(ascii(p_name) AS INT) AS first_cp,
        |  chr(p_size + 64) AS chr_size
        |FROM part""".stripMargin,

    "q_scalar_math" ->
      """SELECT p_partkey,
        |  abs(p_size - 25) AS abs_off,
        |  CAST(sign(p_size - 25) AS INT) AS sgn_off,
        |  sqrt(CAST(p_size AS DOUBLE)) AS sqrt_size,
        |  pow(CAST(p_size AS DOUBLE), 2.0) AS size_sq,
        |  p_size % 7 AS size_mod7,
        |  CAST(ceil(-1 * p_retailprice / 100) AS BIGINT) AS fix_neg,
        |  CAST(floor(p_retailprice / 100) AS BIGINT) AS int_pos,
        |  round(CAST(p_retailprice AS DECIMAL(12,2)), 1) AS round1
        |FROM part""".stripMargin,

    "q_scalar_date" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS y,
        |  CAST(month(o_orderdate) AS INT) AS m,
        |  CAST(day(o_orderdate) AS INT) AS d,
        |  CAST(dayofweek(o_orderdate) + 1 AS INT) AS wd,
        |  monthname(o_orderdate) AS mname,
        |  CAST(CAST(o_orderdate AS DATE) + 30 AS DATE) AS plus30,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE)
        |    AS plus1m,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE),
        |    DATE '1998-01-01') AS INT) AS days_to_98,
        |  make_date(CAST(year(o_orderdate) AS INT),
        |    CAST(month(o_orderdate) AS INT), 1) AS month_start,
        |  CAST(quarter(o_orderdate) AS INT) AS dp_quarter,
        |  CAST(dayofyear(o_orderdate) AS INT) AS dp_doy
        |FROM orders""".stripMargin,

    "q_scalar_casts" ->
      """WITH g AS (
        |  SELECT p_partkey, p_name, p_size, p_retailprice,
        |    (p_size / 200.0) * 100 AS pctv
        |  FROM part),
        |f AS (
        |  SELECT *,
        |    format('{:,}', CAST(floor(p_retailprice) AS BIGINT)) || '.' ||
        |      lpad(CAST(CAST(p_retailprice * 100 AS BIGINT) % 100
        |        AS VARCHAR), 2, '0') AS grouped
        |  FROM g)
        |SELECT p_partkey,
        |  CAST(round_even(p_retailprice / 7, 0) AS INTEGER) AS cint7,
        |  CAST(round_even(p_retailprice * 3, 0) AS BIGINT) AS clng3,
        |  CAST(p_retailprice / 3 AS DECIMAL(19,4)) AS ccur3,
        |  CAST(p_size AS DOUBLE) AS cdbl,
        |  CAST(p_size AS VARCHAR) AS cstr,
        |  CAST(p_size % 2 AS BOOLEAN) AS cbool,
        |  printf('%02d:%02d:%02d', p_size % 24, (p_size * 7) % 60,
        |    (p_size * 13) % 60) AS tserial,
        |  strftime(epoch_ms((p_partkey % 86400) * 1000), '%H:%M:%S')
        |    AS tvalue,
        |  TRY_CAST('1995-01-' ||
        |    lpad(CAST(p_size % 28 + 1 AS VARCHAR), 2, '0') AS TIMESTAMP)
        |    IS NOT NULL AS is_date_y,
        |  TRY_CAST(p_name AS TIMESTAMP) IS NOT NULL AS is_date_n,
        |  'Double' AS tn_price,
        |  'String' AS tn_name,
        |  grouped AS fnum,
        |  '$' || grouped AS fcur,
        |  format('{:.2f}', pctv) || '%' AS fpct
        |FROM f""".stripMargin,

    "q_scalar_financial" ->
      """SELECT p_partkey,
        |  -(p_retailprice * pow(1.0 + 0.05/12, 36.0) + 0.0)
        |    * (0.05/12) / (1.0 * (pow(1.0 + 0.05/12, 36.0) - 1.0))
        |    AS pmt36,
        |  -(p_retailprice * pow(1.0 + 0.05/12, 36.0)
        |    + (-100.0) * 1.0 * (pow(1.0 + 0.05/12, 36.0) - 1.0)
        |      / (0.05/12)) AS fv36,
        |  -(0.0 + (-100.0) * 1.0 * (pow(1.0 + 0.05/12, 36.0) - 1.0)
        |      / (0.05/12)) / pow(1.0 + 0.05/12, 36.0) AS pv100,
        |  (p_retailprice - 50.0) / 5.0 AS sln5,
        |  (p_retailprice - 50.0) * (5.0 - 2.0 + 1.0) * 2.0
        |    / (5.0 * (5.0 + 1.0)) AS syd2,
        |  (-1000.0) / pow(1.08, 1.0) + p_retailprice / pow(1.08, 2.0)
        |    + p_retailprice / pow(1.08, 3.0) + 500.0 / pow(1.08, 4.0)
        |    AS npv,
        |  pow(
        |    -(p_retailprice / pow(1.0 + 0.12, 1.0)
        |        + 500.0 / pow(1.0 + 0.12, 2.0))
        |      * pow(1.0 + 0.12, 3.0 - 1.0)
        |      / (-1000.0),
        |    1.0 / (3.0 - 1.0)) - 1.0 AS mirr
        |FROM part""".stripMargin,

    "q_scalar_format" ->
      """WITH g AS (
        |  SELECT p_partkey, CAST(p_retailprice AS DECIMAL(12,2)) AS x,
        |    p_size FROM part),
        |f AS (
        |  SELECT p_partkey, p_size,
        |    format('{:,}', CAST(floor(x) AS BIGINT)) || '.' ||
        |      lpad(CAST(CAST(x * 100 AS BIGINT) % 100 AS VARCHAR), 2, '0')
        |      AS grouped
        |  FROM g)
        |SELECT p_partkey,
        |  grouped AS std,
        |  '$' || grouped AS cur,
        |  format('{:.2f}', CAST(CAST(p_size AS DECIMAL(8,4)) / 100
        |    AS DECIMAL(8,4)) * 100) || '%' AS pct
        |FROM f""".stripMargin,

    "q_scalar_format_date" ->
      """SELECT o_orderkey,
        |  strftime(CAST(o_orderdate AS DATE), '%d.%m.%Y') AS dmy,
        |  strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS iso
        |FROM orders""".stripMargin
  )
}
