package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** VBA-compatible scalar library (SURVEY §2.9) — the reference embeds a
  * VBA/Excel function pack in its MDX expression language (jar classes
  * mondrian/olap/fun/vba/Vba and vba/Excel; behaviors pinned by
  * mondrian_test.rb:108-114,255-270,491-530,781-788).
  *
  * Nearly everything lowers to a codegen'd Spark built-in Column — no
  * UDFs in the scalar path, so these stay inside whole-stage codegen at
  * any scale. The financial family has no Spark built-in: closed-form
  * members are expressed algebraically over Columns; the iterative ones
  * (IRR, Rate) are the only UDF-backed functions in the engine.
  */
object Vba {

  // ---- math (Vba + Excel) -------------------------------------------
  def abs(c: Column): Column = org.apache.spark.sql.functions.abs(c)
  def sgn(c: Column): Column = signum(c)
  def sqr(c: Column): Column = sqrt(c) // VBA Sqr = square root
  def fix(c: Column): Column = // truncate toward zero
    when(c >= 0, floor(c)).otherwise(ceil(c))
  def int(c: Column): Column = floor(c) // VBA Int = floor
  def exp(c: Column): Column = org.apache.spark.sql.functions.exp(c)
  def log(c: Column): Column = org.apache.spark.sql.functions.log(c)
  def log10(c: Column): Column = org.apache.spark.sql.functions.log10(c)
  def atn(c: Column): Column = atan(c)
  def atan2(y: Column, x: Column): Column =
    org.apache.spark.sql.functions.atan2(y, x)
  def cos(c: Column): Column = org.apache.spark.sql.functions.cos(c)
  def sin(c: Column): Column = org.apache.spark.sql.functions.sin(c)
  def tan(c: Column): Column = org.apache.spark.sql.functions.tan(c)
  def cosh(c: Column): Column = org.apache.spark.sql.functions.cosh(c)
  def sinh(c: Column): Column = org.apache.spark.sql.functions.sinh(c)
  def tanh(c: Column): Column = org.apache.spark.sql.functions.tanh(c)
  def acos(c: Column): Column = org.apache.spark.sql.functions.acos(c)
  def asin(c: Column): Column = org.apache.spark.sql.functions.asin(c)
  def acosh(c: Column): Column = org.apache.spark.sql.functions.acosh(c)
  def asinh(c: Column): Column = org.apache.spark.sql.functions.asinh(c)
  def atanh(c: Column): Column = org.apache.spark.sql.functions.atanh(c)
  def degrees(c: Column): Column = org.apache.spark.sql.functions.degrees(c)
  def radians(c: Column): Column = org.apache.spark.sql.functions.radians(c)
  def pi: Column = lit(math.Pi)
  def power(b: Column, e: Column): Column = pow(b, e)
  def mod(a: Column, b: Column): Column = a % b
  def sqrtPi(c: Column): Column = sqrt(c * math.Pi)
  def round(c: Column, digits: Int = 0): Column =
    org.apache.spark.sql.functions.round(c, digits)
  def hex(c: Column): Column = upper(org.apache.spark.sql.functions.hex(c))
  def oct(c: Column): Column = conv(c.cast("string"), 10, 8)

  // ---- strings -------------------------------------------------------
  def asc(c: Column): Column = org.apache.spark.sql.functions.ascii(c)
  def chr(c: Column): Column = char(c)
  /** AscB: first byte of the string's UTF-8 encoding (binary substring
    * → hex → base-10); AscW: first Unicode code point, which Spark's
    * `ascii` already returns. ChrB wraps the code into one byte; ChrW
    * is code-point chr.
    */
  def ascB(c: Column): Column =
    conv(hex(substring(encode(c, "UTF-8"), 1, 1)), 16, 10).cast("int")
  def ascW(c: Column): Column = org.apache.spark.sql.functions.ascii(c)
  def chrB(c: Column): Column = char(pmod(c, lit(256)))
  def chrW(c: Column): Column = char(c)
  def lCase(c: Column): Column = lower(c)
  def uCase(c: Column): Column = upper(c)
  def lTrim(c: Column): Column = ltrim(c)
  def rTrim(c: Column): Column = rtrim(c)
  def trim(c: Column): Column = org.apache.spark.sql.functions.trim(c)
  def left(c: Column, n: Int): Column = substring(c, 1, n)
  def right(c: Column, n: Int): Column = substring(c, -n, n)
  def mid(c: Column, start: Int, len: Int): Column = substring(c, start, len)
  def len(c: Column): Column = length(c)
  def inStr(haystack: Column, needle: Column): Column =
    instr(haystack, needle)
  def inStrRev(haystack: Column, needle: String): Column =
    when(instr(haystack, needle) === 0, 0).otherwise(
      length(haystack) - length(substring_index(haystack, needle, -1))
        - lit(needle.length) + 1)
  def replace(c: Column, find: String, repl: String): Column =
    org.apache.spark.sql.functions.replace(c, lit(find), lit(repl))
  def space(n: Column): Column = repeat(lit(" "), n.cast("int"))
  def strReverse(c: Column): Column = reverse(c)
  def string(n: Column, ch: String): Column = repeat(lit(ch), n.cast("int"))
  def strComp(a: Column, b: Column): Column =
    when(a < b, -1).when(a > b, 1).otherwise(0)
  def str(c: Column): Column = // VBA Str: leading space for positives
    when(c >= 0, concat(lit(" "), c.cast("string")))
      .otherwise(c.cast("string"))
  def valOf(c: Column): Column = // VBA Val: leading numeric prefix
    regexp_extract(org.apache.spark.sql.functions.trim(c),
      "^[-+]?[0-9]*\\.?[0-9]+", 0).cast("double")

  // ---- dates ---------------------------------------------------------
  def year(c: Column): Column = org.apache.spark.sql.functions.year(c)
  def month(c: Column): Column = org.apache.spark.sql.functions.month(c)
  def day(c: Column): Column = dayofmonth(c)
  def hour(c: Column): Column = org.apache.spark.sql.functions.hour(c)
  def minute(c: Column): Column = org.apache.spark.sql.functions.minute(c)
  def second(c: Column): Column = org.apache.spark.sql.functions.second(c)
  /** VBA Weekday with default vbSunday: Sunday=1..Saturday=7. */
  def weekday(c: Column): Column = dayofweek(c)
  def monthName(c: Column): Column = date_format(c, "MMMM")
  def weekdayName(c: Column): Column = date_format(c, "EEEE")
  def dateSerial(y: Column, m: Column, d: Column): Column =
    make_date(y, m, d)
  /** VBA DateAdd intervals: yyyy year, q quarter, m month, ww week,
    * d/y/w day, h hour, n minute, s second.
    */
  def dateAdd(interval: String, n: Int, c: Column): Column =
    interval match {
      case "d" | "y" | "w" => date_add(c, n)
      case "ww" => date_add(c, n * 7)
      case "m" => add_months(c, n)
      case "q" => add_months(c, n * 3)
      case "yyyy" => add_months(c, n * 12)
      case "h" => c.cast("timestamp") +
        make_dt_interval(lit(0), lit(n), lit(0), lit(0))
      case "n" => c.cast("timestamp") +
        make_dt_interval(lit(0), lit(0), lit(n), lit(0))
      case "s" => c.cast("timestamp") +
        make_dt_interval(lit(0), lit(0), lit(0), lit(n))
      case other =>
        throw new IllegalArgumentException(s"DateAdd interval '$other'")
    }
  /** VBA DateDiff: boundary-counting for yyyy/q/m (VBA counts calendar
    * boundaries crossed, not elapsed periods), elapsed units for
    * d/ww/h/n/s.
    */
  def dateDiff(interval: String, a: Column, b: Column): Column =
    interval match {
      case "d" | "y" | "w" => datediff(b, a)
      case "ww" => floor(datediff(b, a) / 7).cast("int")
      case "m" =>
        (org.apache.spark.sql.functions.year(b) * 12 +
          org.apache.spark.sql.functions.month(b)) -
          (org.apache.spark.sql.functions.year(a) * 12 +
            org.apache.spark.sql.functions.month(a))
      case "q" =>
        (org.apache.spark.sql.functions.year(b) * 4 + quarter(b)) -
          (org.apache.spark.sql.functions.year(a) * 4 + quarter(a))
      case "yyyy" =>
        org.apache.spark.sql.functions.year(b) -
          org.apache.spark.sql.functions.year(a)
      case "h" => ((unix_timestamp(b) - unix_timestamp(a)) / 3600)
        .cast("int")
      case "n" => ((unix_timestamp(b) - unix_timestamp(a)) / 60)
        .cast("int")
      case "s" => (unix_timestamp(b) - unix_timestamp(a)).cast("int")
      case other =>
        throw new IllegalArgumentException(s"DateDiff interval '$other'")
    }
  def now(): Column = current_timestamp()
  /** VBA Date / Time: the current date / the current clock reading
    * (rendered HH:mm:ss, consistent with [[timeValue]]).
    */
  def dateFn(): Column = current_date()
  def timeFn(): Column = date_format(current_timestamp(), "HH:mm:ss")
  /** VBA DatePart(interval, date): the component DateAdd/DateDiff
    * address by the same interval codes.
    */
  def datePart(interval: String, c: Column): Column = interval match {
    case "yyyy" => org.apache.spark.sql.functions.year(c)
    case "q"    => quarter(c)
    case "m"    => org.apache.spark.sql.functions.month(c)
    case "y"    => dayofyear(c)
    case "d"    => dayofmonth(c)
    case "w"    => dayofweek(c)
    case "ww"   => weekofyear(c)
    case "h"    => org.apache.spark.sql.functions.hour(c)
    case "n"    => org.apache.spark.sql.functions.minute(c)
    case "s"    => org.apache.spark.sql.functions.second(c)
    case other =>
      throw new IllegalArgumentException(s"DatePart interval '$other'")
  }
  def dateValue(c: Column): Column = to_date(c)
  /** VBA TimeSerial(h, m, s) rendered as HH:mm:ss (VBA's fractional-day
    * Date is meaningless in a date-typed engine; the clock string is
    * the observable the reference tests compare).
    */
  def timeSerial(h: Column, m: Column, s: Column): Column =
    format_string("%02d:%02d:%02d",
      h.cast("int"), m.cast("int"), s.cast("int"))
  /** VBA TimeValue: the time-of-day part of a date/timestamp. */
  def timeValue(c: Column): Column = date_format(c, "HH:mm:ss")
  /** VBA Timer: seconds since midnight of the given timestamp (the
    * argless VBA form reads the wall clock — pass Vba.now() for that).
    */
  def timer(ts: Column): Column =
    org.apache.spark.sql.functions.hour(ts) * 3600 +
      org.apache.spark.sql.functions.minute(ts) * 60 +
      org.apache.spark.sql.functions.second(ts)
  /** VBA IsDate: does the value parse as a date/timestamp? (try_ parse —
    * never throws, ANSI-safe.)
    */
  def isDate(c: Column): Column =
    try_to_timestamp(c.cast("string")).isNotNull

  // ---- VBA type casts (cBool, cByte, cCur, cDbl, cInt, cLng, cSng,
  // cStr, cDate). cInt/cLng use banker's rounding (VBA rounds to even),
  // which Spark's bround implements exactly.
  def cBool(c: Column): Column = c.cast("boolean")
  def cByte(c: Column): Column = bround(c).cast("tinyint")
  /** VBA Currency: fixed-point with 4 decimal places. */
  def cCur(c: Column): Column = c.cast("decimal(19,4)")
  def cDbl(c: Column): Column = c.cast("double")
  def cInt(c: Column): Column = bround(c).cast("int")
  def cLng(c: Column): Column = bround(c).cast("bigint")
  def cSng(c: Column): Column = c.cast("float")
  def cStr(c: Column): Column = c.cast("string")
  def cDate(c: Column): Column = c.cast("date")
  /** VBA TypeName of a column's Spark type (plan-time metadata — the
    * engine analog of VBA's runtime type inspection).
    */
  def typeName(dt: org.apache.spark.sql.types.DataType): Column = {
    import org.apache.spark.sql.types._
    lit(dt match {
      case DoubleType => "Double"
      case FloatType => "Single"
      case LongType => "Long"
      case IntegerType | ShortType | ByteType => "Integer"
      case StringType => "String"
      case BooleanType => "Boolean"
      case DateType | TimestampType => "Date"
      case _: DecimalType => "Currency"
      case other => other.simpleString.capitalize
    })
  }

  // ---- VB Format* convenience formatters (reference formatCurrency/
  // formatDateTime/formatNumber/formatPercent) — all codegen'd builtins.
  def formatNumber(c: Column, decimals: Int = 2): Column =
    format_number(c, decimals)
  def formatCurrency(c: Column, decimals: Int = 2): Column =
    concat(lit("$"), format_number(c, decimals))
  def formatPercent(c: Column, decimals: Int = 2): Column =
    concat(format_number(c * 100, decimals), lit("%"))
  /** vbGeneralDate(0) | vbLongDate(1) | vbShortDate(2) | vbLongTime(3)
    * | vbShortTime(4).
    */
  def formatDateTime(c: Column, mode: Int = 0): Column = mode match {
    case 0 => date_format(c, "M/d/yyyy h:mm:ss a")
    case 1 => date_format(c, "EEEE, MMMM d, yyyy")
    case 2 => date_format(c, "M/d/yyyy")
    case 3 => date_format(c, "h:mm:ss a")
    case 4 => date_format(c, "HH:mm")
    case other =>
      throw new IllegalArgumentException(s"FormatDateTime mode $other")
  }

  // ---- financial (no Spark built-ins) --------------------------------
  // Closed forms follow the standard annuity algebra; all double math.

  /** Future value of an annuity: rate per period, nper periods, pmt per
    * period, present value, due (payments at period start).
    */
  def fV(rate: Column, nper: Column, pmt: Column, pv: Column,
      due: Boolean = false): Column = {
    val f = pow(lit(1.0) + rate, nper)
    val adj = if (due) (lit(1.0) + rate) else lit(1.0)
    -(pv * f + pmt * adj * (f - lit(1.0)) / rate)
  }

  /** Present value of an annuity. */
  def pV(rate: Column, nper: Column, pmt: Column, fv: Column,
      due: Boolean = false): Column = {
    val f = pow(lit(1.0) + rate, nper)
    val adj = if (due) (lit(1.0) + rate) else lit(1.0)
    -(fv + pmt * adj * (f - lit(1.0)) / rate) / f
  }

  /** Payment for a loan: standard annuity formula. */
  def pmt(rate: Column, nper: Column, pv: Column,
      fv: Column = lit(0.0), due: Boolean = false): Column = {
    val f = pow(lit(1.0) + rate, nper)
    val adj = if (due) (lit(1.0) + rate) else lit(1.0)
    -(pv * f + fv) * rate / (adj * (f - lit(1.0)))
  }

  /** Interest portion of payment `per`. */
  def iPmt(rate: Column, per: Column, nper: Column, pv: Column): Column = {
    // balance after (per-1) payments, times rate
    val p = pmt(rate, nper, pv)
    val fPrev = pow(lit(1.0) + rate, per - lit(1.0))
    val balance = pv * fPrev + p * (fPrev - lit(1.0)) / rate
    -balance * rate
  }

  /** Principal portion of payment `per`. */
  def pPmt(rate: Column, per: Column, nper: Column, pv: Column): Column =
    pmt(rate, nper, pv) - iPmt(rate, per, nper, pv)

  /** Periods to pay off (fv=0, end-of-period payments): log solve of
    * the annuity equation.
    */
  def nPer(rate: Column, pmt: Column, pv: Column): Column =
    org.apache.spark.sql.functions.log(pmt / (pmt + pv * rate)) /
      org.apache.spark.sql.functions.log(lit(1.0) + rate)

  /** Straight-line depreciation. */
  def sLN(cost: Column, salvage: Column, life: Column): Column =
    (cost - salvage) / life

  /** Sum-of-years'-digits depreciation for period `per`. */
  def sYD(cost: Column, salvage: Column, life: Column,
      per: Column): Column =
    (cost - salvage) * (life - per + lit(1.0)) * lit(2.0) /
      (life * (life + lit(1.0)))

  /** Double-declining-balance depreciation for integer period `per`. */
  def dDB(cost: Column, salvage: Column, life: Column,
      per: Column): Column = {
    val r = lit(2.0) / life
    val prev = cost * pow(lit(1.0) - r, per - lit(1.0))
    val curr = cost * pow(lit(1.0) - r, per)
    greatest(least(prev - greatest(curr, salvage), prev), lit(0.0))
  }

  /** Net present value of a cashflow array column at `rate`. */
  def nPV(rate: Column, flows: Column): Column =
    aggregate(
      zip_with(flows, sequence(lit(1), size(flows)),
        (v, i) => v.cast("double") / pow(lit(1.0) + rate, i.cast("double"))),
      lit(0.0), (acc, v) => acc + v)

  /** Modified IRR over a cashflow array column: closed form (no
    * iteration) — positive flows compound at the reinvest rate, negative
    * flows discount at the finance rate.
    */
  def mIRR(flows: Column, financeRate: Column,
      reinvestRate: Column): Column = {
    val n = size(flows).cast("double")
    val idx = sequence(lit(0), size(flows) - 1)
    def npvOf(pred: Column => Column, rate: Column): Column =
      aggregate(
        zip_with(flows, idx, (v, i) =>
          when(pred(v), v.cast("double") /
            pow(lit(1.0) + rate, i.cast("double"))).otherwise(lit(0.0))),
        lit(0.0), (acc, v) => acc + v)
    // with 0-indexed discounting, FV(positives at period n-1)
    // = npvPos · (1+rr)^(n-1) and PV(negatives) = -npvNeg — the
    // Excel/VBA MIRR definition
    val npvPos = npvOf(_ > 0, reinvestRate)
    val npvNeg = npvOf(_ < 0, financeRate)
    pow(-npvPos * pow(lit(1.0) + reinvestRate, n - lit(1.0)) / npvNeg,
      lit(1.0) / (n - lit(1.0))) - lit(1.0)
  }

  /** IRR over a cashflow array — iterative (Newton) driver-side scalar,
    * exposed as the engine's only UDF pair with Rate.
    */
  val irrUdf = udf { (flows: Seq[Double]) =>
    def npv(r: Double) =
      flows.zipWithIndex.map { case (v, i) => v / math.pow(1 + r, i) }.sum
    var r = 0.1
    var i = 0
    while (i < 100) {
      val f = npv(r)
      val df = (npv(r + 1e-7) - f) / 1e-7
      if (math.abs(df) < 1e-12) i = 100
      else {
        val next = r - f / df
        if (math.abs(next - r) < 1e-10) { r = next; i = 100 }
        else { r = next; i += 1 }
      }
    }
    r
  }

  /** Rate per period solving the annuity equation — Newton iteration. */
  val rateUdf = udf { (nper: Double, pmtV: Double, pv: Double) =>
    def f(r: Double) = {
      val fac = math.pow(1 + r, nper)
      pv * fac + pmtV * (fac - 1) / r
    }
    var r = 0.1
    var i = 0
    while (i < 100) {
      val y = f(r)
      val dy = (f(r + 1e-8) - y) / 1e-8
      val next = r - y / dy
      if (math.abs(next - r) < 1e-12) { r = next; i = 100 }
      else { r = next; i += 1 }
    }
    r
  }
}
