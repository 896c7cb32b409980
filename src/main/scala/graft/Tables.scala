package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loader for the driver-generated TPC-H-ish star (TESTDATA.md).
  *
  * All tables are read straight from parquet so Catalyst can push filters
  * and prune columns into the scan. Dimension tables (region, nation,
  * supplier, part, customer) are small relative to the fact at every scale
  * factor, so star joins against them are broadcast by the planner — at
  * 100 TB the same shape holds (dims ~GBs vs fact ~TBs), which keeps every
  * star join shuffle-free on the fact side.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts has shipped as both INT64 TIMESTAMP(NANOS) (which Spark 4
      // rejects outright unless read as a raw long) and TIMESTAMP(MICROS)
      // NTZ, depending on the generator version. Read with nanosAsLong on —
      // a no-op for micros files — then normalize whatever arrived.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      normalizeEventTs(spark.read.parquet(s"$sfDir/$name.parquet"))
    } else spark.read.parquet(s"$sfDir/$name.parquet")

  /** Normalize an events frame's `ts` to a session-zone TimestampType at
    * microsecond precision, whichever parquet variant it was read from.
    * The ONE copy of this logic — the batch loader above and the
    * streaming reader (`StreamingCube.eventStream`) both call it, so the
    * two paths cannot drift (the r7 regression was exactly a reader pair
    * hand-synced to different generator variants).
    */
  def normalizeEventTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // nanos-as-long
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ => // TIMESTAMP(MICROS); NTZ wall-clock == UTC session zone
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }

  /** Register every table as a temp view named after the table, so both the
    * DataFrame API and spark.sql(...) paths see the same catalog. Idempotent.
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n => load(spark, sfDir, n).createOrReplaceTempView(n) }

  /** Time dimension derived from orders.o_orderdate (FIXTURES.md §B):
    * Year / Quarter / Month / Day levels with ordinal columns.
    * Small (≤ a few thousand rows at any SF) → always broadcastable.
    */
  def timeDim(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "orders")
      .select(to_date(col("o_orderdate")).as("d_date"))
      .distinct()
      .withColumn("d_year", year(col("d_date")))
      .withColumn("d_quarter", quarter(col("d_date")))
      .withColumn("d_month", month(col("d_date")))
      .withColumn("d_day", dayofmonth(col("d_date")))
      .withColumn("d_yq", concat(col("d_year"), lit("-Q"), col("d_quarter")))
      .withColumn("d_ym", date_format(col("d_date"), "yyyy-MM"))
}
