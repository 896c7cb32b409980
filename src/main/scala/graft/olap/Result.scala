package graft.olap

import org.apache.spark.sql.DataFrame

import graft.functions.FormatString

/** Result / cell-set sink (reference lib/mondrian/olap/result.rb:8-110,
  * 606-650): axis positions, the cell grid, axis-order transposition
  * (`values(axesOrder*)` = recursive_values), formatted values through
  * the measure format strings, and an HTML table rendering.
  *
  * Axis grids are presentation-sized by construction (dimension-scale,
  * never fact-scale), so collecting to the driver here is the same
  * boundary the reference crosses when materializing a CellSet.
  */
final class Result(
    val columnNames: Seq[String],   // measure/calc names (COLUMNS axis)
    val rowAxis: Seq[Seq[Any]],     // row-axis member tuples, in order
    val rowAxisNames: Seq[String],  // level column names of the row axis
    cells: Seq[Seq[Any]],           // cells(rowIdx)(colIdx)
    formats: Map[String, String],
    /** PAGES level columns (prefix of rowAxisNames) when the query had
      * a third axis — pages fold into the row grid page-major.
      */
    val pageAxisNames: Seq[String] = Nil,
    /** Named cell formatters resolved per output column — take
      * precedence over format strings (reference CellFormatter;
      * schema_definition_test.rb:1229-1235).
      */
    cellFmts: Map[String, Any => String] = Map.empty,
    /** Member formatters resolved per axis column: format the member
      * caption (reference MemberFormatter, schema_definition_test.rb
      * "should format members").
      */
    memberFmts: Map[String, Any => String] = Map.empty,
    /** Display captions for column members that declared one
      * ($caption on a calc member — reference member.getCaption,
      * cube.rb:392-393): column NAME stays the addressable identity,
      * the caption is presentation only.
      */
    columnCaptions: Map[String, String] = Map.empty) {

  def rowCount: Int = rowAxis.length
  def columnCount: Int = columnNames.length

  /** Distinct page tuples, in grid (page-major) order. */
  def pageAxis: Seq[Seq[Any]] = {
    val k = pageAxisNames.length
    if (k == 0) Nil else rowAxis.map(_.take(k)).distinct
  }
  def pageCount: Int = pageAxis.length

  /** The 2-axis sub-Result of one page (axis(2) ordinal `i`). */
  def page(i: Int): Result = {
    val k = pageAxisNames.length
    require(k > 0, "no PAGES axis on this result")
    val key = pageAxis(i)
    val keep = rowAxis.zipWithIndex.filter(_._1.take(k) == key)
    new Result(columnNames,
      keep.map(_._1.drop(k)),
      rowAxisNames.drop(k),
      keep.map { case (_, idx) => cells(idx) },
      formats, cellFmts = cellFmts, memberFmts = memberFmts,
      columnCaptions = columnCaptions)
  }

  /** Cell value at (row, column). */
  def value(row: Int, column: Int): Any = cells(row)(column)

  /** values(0) = rows of column-vectors; values(1) (default) = rows of
    * row-vectors — the reference's axes_sequence transposition
    * (result.rb:48-63,639-650).
    */
  def values(axesOrder: Int*): Seq[Seq[Any]] = {
    val order = if (axesOrder.isEmpty) Seq(1) else axesOrder
    order.head match {
      case 1 => cells
      case 0 => cells.transpose
      case other =>
        throw new IllegalArgumentException(s"axis $other out of range")
    }
  }

  /** Formatted cell grid: a named cell formatter wins over the VB
    * format string (result.rb formatted_values through Mondrian's
    * CellFormatter; '' for empty cells).
    */
  def formattedValues: Seq[Seq[String]] =
    cells.map(_.zip(columnNames).map { case (v, name) =>
      if (v == null) ""
      else cellFmts.get(name) match {
        case Some(cf) => cf(v)
        case None => formats.get(name) match {
          case Some(f) => FormatString.format(v, f)
          case None => v.toString
        }
      }
    })

  /** Row-axis member captions through each level's member formatter
    * (reference member.caption; unformatted levels pass through).
    */
  def formattedRowAxis: Seq[Seq[String]] =
    rowAxis.map(_.zip(rowAxisNames).map { case (m, axisCol) =>
      memberFmts.get(axisCol) match {
        case Some(mf) => mf(m)
        case None => String.valueOf(m)
      }
    })

  /** Formatted caption of one row-axis member (row, axis column). */
  def memberCaption(row: Int, axisCol: Int): String =
    formattedRowAxis(row)(axisCol)

  /** Display caption of a column member: its declared $caption, else
    * its name (reference member.caption falls back to the name).
    */
  def columnCaption(name: String): String =
    columnCaptions.getOrElse(name, name)

  /** Simple 2-axis HTML table (result.rb:66-110). */
  def toHtml: String = {
    val sb = new StringBuilder("<table><thead><tr>")
    rowAxisNames.foreach(n => sb.append(s"<th>$n</th>"))
    columnNames.foreach(n => sb.append(s"<th>${columnCaption(n)}</th>"))
    sb.append("</tr></thead><tbody>")
    formattedRowAxis.zip(formattedValues).foreach { case (members, vals) =>
      sb.append("<tr>")
      members.foreach(m => sb.append(s"<td>$m</td>"))
      vals.foreach(v => sb.append(s"<td>$v</td>"))
      sb.append("</tr>")
    }
    sb.append("</tbody></table>").toString
  }
}

object Result {

  /** Materialize an executed query DataFrame into a Result: the first
    * columns are the row-axis level keys (everything not a measure),
    * the rest the measure cells.
    */
  def fromDataFrame(df: DataFrame, measures: Seq[String],
      cube: BoundCube, pageCols: Seq[String] = Nil,
      queryCalcs: Seq[CalcMember] = Nil): Result = {
    val all = df.columns.toSeq
    val axisCols = all.filterNot(measures.contains)
    val rows = df.collect().toSeq
    val axisIdx = axisCols.map(all.indexOf)
    val cellIdx = measures.map(all.indexOf)
    // query-level WITH MEMBERs carry format strings / cell formatters
    // too (reference: with_member(...).as(..., format_string:,
    // cell_formatter:))
    val calcs = cube.calcMembers ++ queryCalcs
    val formats = (cube.measures.flatMap(m =>
      m.formatString.map(m.name -> _)) ++
      calcs.flatMap(c => c.formatString.map(c.name -> _))).toMap
    // resolve named formatters once, at materialization: unknown names
    // fail here (the reference fails at schema load), not per cell
    def resolveCell(owner: String, n: String): (String, Any => String) =
      owner -> cube.funcs.cellFormatter(n).getOrElse(
        throw new IllegalArgumentException(
          s"cell formatter '$n' is not registered in cube '${cube.name}'"))
    val cellFmts = (cube.measures.flatMap(m =>
      m.cellFormatter.map(resolveCell(m.name, _))) ++
      calcs.flatMap(c =>
        c.cellFormatter.map(resolveCell(c.name, _)))).toMap
    val memberFmts = (for {
      d <- cube.dims; l <- d.levels; fn <- l.memberFormatter
      f <- cube.funcs.memberFormatter(fn)
    } yield l.col -> ((v: Any) => f(MemberView(d.name, l.name, v)))).toMap
    new Result(
      columnNames = measures,
      rowAxis = rows.map(r => axisIdx.map(r.get)),
      rowAxisNames = axisCols,
      cells = rows.map(r => cellIdx.map(r.get)),
      formats = formats,
      pageAxisNames = pageCols.filter(axisCols.contains),
      cellFmts = cellFmts,
      memberFmts = memberFmts,
      columnCaptions = calcs.flatMap(c =>
        c.properties.collectFirst {
          case (k, v) if k.equalsIgnoreCase("caption") => c.name -> v
        }).toMap)
  }
}
