package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.olap._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are contributed by the per-area batteries under graft.queries;
  * each name has BOTH a Spark implementation (through the OLAP engine or
  * the pipeline operators) and, where SQL-expressible, a DuckDB oracle.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001 (driver smoke-checks rows>0):
    * the reference's README star query re-expressed — revenue by customer
    * region for 1995, through the full engine path (star join + slicer +
    * groupBy).
    */
  def entry(spark: SparkSession): DataFrame =
    Query.from(Cubes.sales(spark, "/root/testdata/sf0.001"))
      .columns("revenue", "sum_qty")
      .rows(LevelMembers("customer", "region"))
      .where(MemberSlice("time", Seq(1995)))
      .execute()

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    OlapCoreQueries.queries ++ OlapWindowQueries.queries ++
      PipelineQueries.queries ++ StreamingQueries.queries ++
      MdxQueries.queries ++ ScalarQueries.queries ++
      OlapExtQueries.queries ++ FeatureQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    OlapCoreQueries.oracleSql ++ OlapWindowQueries.oracleSql ++
      PipelineQueries.oracleSql ++ StreamingQueries.oracleSql ++
      MdxQueries.oracleSql ++ ScalarQueries.oracleSql ++
      OlapExtQueries.oracleSql ++ FeatureQueries.oracleSql
}
