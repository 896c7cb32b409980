package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Decimal normalization: the driver's hash compare normalizes FLOAT
  * values on both sides but stringifies DECIMALs raw, so a Spark
  * DECIMAL(38,10) result never hash-matches a DuckDB DECIMAL(38,2)
  * oracle even when numerically identical (r2: all 40 hash_match=false
  * queries had a decimal output column; all double-only queries
  * matched). Internally the engine keeps exact decimal sums; here, at
  * the verify boundary only, every decimal output column is cast to
  * DOUBLE on the Spark side AND the oracle SQL is wrapped with the
  * matching CAST(... AS DOUBLE) — both engines cast the same exact
  * decimal, so the doubles are bit-identical. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query names (dev iteration —
    // the driver always invokes with exactly two)
    val (sfDir, outDir) = (args(0), args(1))
    val only: Set[String] =
      if (args.length > 2) args(2).split(",").toSet else Set.empty
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Decimal output columns per query, collected while writing — used
    // below to wrap the corresponding oracle SQL with identical casts.
    val decimalCols = scala.collection.mutable.Map.empty[String, Seq[String]]
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      // Pins.scoped: the write (the query's action) runs inside the
      // scope, so each query's load-bearing persists release as soon as
      // its parquet is on disk — storage stays bounded by one query's
      // working set across the whole 140-query dump.
      try graft.olap.Pins.scoped {
        val raw = fn(spark, sfDir)
        val decs = raw.schema.fields.collect {
          case f if f.dataType.isInstanceOf[DecimalType] => f.name
        }.toSeq
        decimalCols(name) = decs
        val out = if (decs.isEmpty) raw else raw.select(raw.columns.map { c =>
          if (decs.contains(c)) col(c).cast(DoubleType).as(c) else col(c)
        }.toIndexedSeq: _*)
        out.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Wrap each oracle whose Spark result had decimal columns so DuckDB
    // casts the same columns to DOUBLE; all other columns pass through.
    def wrap(name: String, sql: String): String =
      decimalCols.getOrElse(name, Nil) match {
        case Nil => sql
        case decs =>
          // Via VARCHAR: DuckDB's direct decimal→double cast divides the
          // int128 mantissa in floating point and can be 1 ulp off the
          // correctly-rounded value (e.g. 57930166.7369 →
          // …6.736899994); string→double parsing is correctly rounded
          // and therefore bit-identical to Spark's BigDecimal
          // .doubleValue() of the same exact decimal.
          val casts =
            decs.map(c => s"""CAST(CAST("$c" AS VARCHAR) AS DOUBLE) AS "$c"""")
          s"""SELECT * REPLACE (${casts.mkString(", ")}) FROM ($sql) __graft_t"""
      }
    // restrict to the filtered set: an unfiltered query's decimalCols
    // was never populated, so emitting its oracle here would skip the
    // decimal->double wrap and hash-mismatch downstream tooling
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.isEmpty || only(k) }
      .map { case (k, v) => s"${q(k)}: ${q(wrap(k, v))}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
