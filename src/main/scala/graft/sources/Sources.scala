package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Format-agnostic table sources — the Spark analog of the reference's
  * multi-database connectivity (connection.rb registers mysql /
  * postgres / oracle / mssql / vertica / snowflake JDBC drivers; one
  * schema definition then runs against any of them). Here one cube
  * definition runs over any Spark DataSource: the cube binds to
  * DataFrames, so swapping parquet for CSV, JSON-lines, ORC (or JDBC
  * in a connected deployment — not exercised in this zero-egress
  * environment) changes only the load call, never the cube schema or
  * the queries.
  *
  * Scale notes per format: parquet/ORC scans push filters + prune
  * columns (PlanSpec asserts PushedFilters); CSV/JSON are row-oriented
  * — Spark still prunes projected columns but predicates filter
  * post-parse, so at 100 TB they are landing/interchange formats that
  * a pipeline compacts to parquet (ideally bucketed — BucketingSpec)
  * before heavy OLAP.
  */
object Sources {

  /** Infer format from the path extension; explicit `format` wins. */
  def load(spark: SparkSession, path: String,
      format: Option[String] = None,
      schema: Option[StructType] = None): DataFrame = {
    val fmt = format.getOrElse(path.replaceAll(".*\\.", "").toLowerCase)
    val reader0 = spark.read
    val reader = schema.map(reader0.schema).getOrElse(reader0)
    fmt match {
      case "parquet" => reader.parquet(path)
      case "orc" => reader.orc(path)
      case "csv" =>
        // header row always written by `write`; types come from the
        // caller's schema (preferred — exact) or are inferred
        val r = reader.option("header", "true")
        (if (schema.isEmpty) r.option("inferSchema", "true") else r)
          .csv(path)
      case "json" | "jsonl" => reader.json(path)
      case other => throw new IllegalArgumentException(
        s"unsupported source format '$other' (parquet|orc|csv|json)")
    }
  }

  /** JDBC table source — the Spark analog of the reference's
    * dialect-keyed JDBC connectivity (connection.rb:323-457 registers
    * nine dialect builders; the engine-side parity is Spark's own
    * JdbcDialects registry, which already covers the same databases).
    * `options` passes through any spark-jdbc option; the scale path is
    * partitioned reads (partitionColumn/lowerBound/upperBound/
    * numPartitions → one parallel query per stride) and automatic
    * predicate/column pushdown into the remote database. Exercised
    * against embedded Derby (on the Spark classpath) since this
    * environment has no network databases.
    */
  def loadJdbc(spark: SparkSession, url: String, table: String,
      options: Map[String, String] = Map.empty): DataFrame =
    options.foldLeft(
        spark.read.format("jdbc").option("url", url)
          .option("dbtable", table)) {
      case (r, (k, v)) => r.option(k, v)
    }.load()

  /** Seed/replace a JDBC table from a DataFrame (test fixture + the
    * write half of JDBC round-trips).
    */
  def writeJdbc(df: DataFrame, url: String, table: String,
      options: Map[String, String] = Map.empty): Unit =
    options.foldLeft(
        df.write.format("jdbc").option("url", url)
          .option("dbtable", table)) {
      case (w, (k, v)) => w.option(k, v)
    }.mode("overwrite").save()

  /** Write a frame out in the given format (round-trip helper for
    * interchange and the format-parity spec).
    */
  def write(df: DataFrame, path: String, format: String): Unit = {
    val w = df.write.mode("overwrite")
    format match {
      case "parquet" => w.parquet(path)
      case "orc" => w.orc(path)
      case "csv" => w.option("header", "true").csv(path)
      case "json" => w.json(path)
      case other => throw new IllegalArgumentException(
        s"unsupported sink format '$other'")
    }
  }
}
