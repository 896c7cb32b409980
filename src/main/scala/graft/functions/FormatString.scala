package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import java.time.format.DateTimeFormatter
import java.time.{LocalDate, LocalDateTime}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** VB-style format-string engine (SURVEY §2.12) — the reference applies
  * measure/calc-member `format_string`s ('#,###.00', '$#,##0.00',
  * '0.0%', 'Percent', 'Standard', 'dd.mm.yyyy') when producing
  * formatted_values (schema.rb:296-297; MondrianTest.xml:97-128;
  * jar mondrian/util/Format).
  *
  * Two surfaces:
  *  - `format(value, fmt)`: driver-side Any => String for Result
  *    formatted-values materialization (small cell grids).
  *  - `toColumn(col, fmt)`: the same semantics as a codegen'd Column
  *    (format_number / date_format / concat), for formatting whole
  *    columns at scale without a UDF.
  */
object FormatString {

  private val named: Map[String, String] = Map(
    "standard" -> "#,##0.00",
    "fixed" -> "0.00",
    "general number" -> "",
    "percent" -> "0.00%",
    "currency" -> "$#,##0.00")

  private def canonical(fmt: String): String =
    named.getOrElse(fmt.toLowerCase, fmt)

  /** Decompose a numeric VB pattern into (prefix, decimals, grouping,
    * percent, suffix).
    */
  private final case class NumPat(prefix: String, decimals: Int,
      grouping: Boolean, percent: Boolean, suffix: String)

  private def numPat(fmt0: String): Option[NumPat] = {
    val fmt = canonical(fmt0)
    if (fmt.isEmpty) return None
    val core = "[#0,]+(?:\\.(0+|#+))?".r
    core.findFirstMatchIn(fmt).map { m =>
      NumPat(
        prefix = fmt.substring(0, m.start),
        decimals = Option(m.group(1)).map(_.length).getOrElse(0),
        grouping = m.matched.contains(","),
        percent = fmt.substring(m.end).contains("%"),
        suffix = fmt.substring(m.end))
    }
  }

  private def isDatePattern(fmt: String): Boolean =
    fmt.exists(c => "ymdhs".contains(c.toLower)) &&
      !fmt.exists(c => "#0".contains(c))

  /** VB date tokens → java.time pattern (dd.mm.yyyy → dd.MM.yyyy). */
  private def datePattern(fmt: String): String =
    fmt.replace("mm", "MM").replace("hh", "HH").replace("nn", "mm")

  /** Driver-side formatter for cell values (en-US separators — the
    * Column path's format_number locale).
    */
  def format(value: Any, fmt: String): String =
    format(value, fmt, java.util.Locale.US)

  /** Locale-aware driver-side formatter (the reference's connection
    * locale, connection.rb:213-223: setLocale changes number/date
    * rendering): grouping and decimal separators come from `locale`,
    * e.g. "1.234.567,50" under Locale.GERMANY.
    */
  def format(value: Any, fmt: String,
      locale: java.util.Locale): String = value match {
    case null => ""
    // VB sign sections 'positive;negative[;zero]': pick the section by
    // the value's sign, formatting the magnitude (the negative section
    // supplies its own sign marks, e.g. parentheses)
    case n: Number if canonical(fmt).contains(';') =>
      val sections = canonical(fmt).split(";", -1)
      val v = new JBigDecimal(n.toString)
      val (section, mag) = v.signum() match {
        case s if s < 0 => (sections(1), v.negate())
        case 0 if sections.length > 2 => (sections(2), v)
        case _ => (sections(0), v)
      }
      // a section without digit placeholders is a literal (VB: e.g. a
      // zero section of just "-")
      if (!section.exists(c => c == '#' || c == '0')) section
      else format(mag, section, locale)
    case d: LocalDate =>
      d.format(DateTimeFormatter.ofPattern(datePattern(fmt)))
    case d: java.sql.Date =>
      d.toLocalDate.format(DateTimeFormatter.ofPattern(datePattern(fmt)))
    case t: LocalDateTime =>
      t.format(DateTimeFormatter.ofPattern(datePattern(fmt)))
    case n: Number =>
      numPat(fmt) match {
        case None => n.toString
        case Some(p) =>
          val scaled =
            if (p.percent) new JBigDecimal(n.toString)
              .multiply(new JBigDecimal(100))
            else new JBigDecimal(n.toString)
          val rounded = scaled.setScale(p.decimals, RoundingMode.HALF_EVEN)
          val body =
            if (p.grouping) {
              // Locale-pinned (never the JVM default — a de_DE JVM
              // would silently emit "1.234.567,50" for en-US callers),
              // formatting the BigDecimal directly — no double
              // round-trip re-round.
              val sym = new java.text.DecimalFormatSymbols(locale)
              val df = new java.text.DecimalFormat("#,##0", sym)
              df.setMinimumFractionDigits(p.decimals)
              df.setMaximumFractionDigits(p.decimals)
              df.format(rounded)
            } else if (locale == java.util.Locale.US) rounded.toPlainString
            else {
              val sym = new java.text.DecimalFormatSymbols(locale)
              val df = new java.text.DecimalFormat("0", sym)
              df.setMinimumFractionDigits(p.decimals)
              df.setMaximumFractionDigits(p.decimals)
              df.setGroupingUsed(false)
              df.format(rounded)
            }
          p.prefix + body + p.suffix
      }
    case other => other.toString
  }

  /** Column-level formatter: same pattern semantics lowered to
    * format_number / date_format expressions (no UDF).
    */
  def toColumn(c: Column, fmt: String): Column = {
    val f = canonical(fmt)
    if (isDatePattern(f)) date_format(c, datePattern(f))
    else numPat(f) match {
      case None => c.cast("string")
      case Some(p) =>
        val scaled = if (p.percent) c * 100 else c
        val body =
          if (p.grouping) format_number(scaled, p.decimals)
          else format_number(scaled, p.decimals).replaceAll(",", "")
        val withSuffix =
          if (p.suffix.nonEmpty) concat(body, lit(p.suffix)) else body
        if (p.prefix.nonEmpty) concat(lit(p.prefix), withSuffix)
        else withSuffix
    }
  }

  private implicit class ColOps(c: Column) {
    def replaceAll(find: String, repl: String): Column =
      regexp_replace(c, java.util.regex.Pattern.quote(find), repl)
  }

  /** The same lowering as [[toColumn]], emitted as a Spark SQL fragment
    * over an inner SQL expression — for callers that splice formatting
    * into a larger SQL string (the MDX Format() expression).
    */
  def sqlFor(inner: String, fmt: String): String = {
    def esc(s: String): String = s.replace("'", "''")
    val f = canonical(fmt)
    if (isDatePattern(f)) s"date_format($inner, '${esc(datePattern(f))}')"
    else numPat(f) match {
      case None => s"CAST(($inner) AS STRING)"
      case Some(p) =>
        val scaled = if (p.percent) s"(($inner) * 100)" else s"($inner)"
        val body0 = s"format_number($scaled, ${p.decimals})"
        val body =
          if (p.grouping) body0
          else s"regexp_replace($body0, ',', '')"
        val withSuffix =
          if (p.suffix.nonEmpty) s"concat($body, '${esc(p.suffix)}')"
          else body
        if (p.prefix.nonEmpty) s"concat('${esc(p.prefix)}', $withSuffix)"
        else withSuffix
    }
  }
}
