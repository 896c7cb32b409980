package graft

import org.apache.spark.sql.functions._
import graft.plans.GraftExtensions

/** Catalyst extension specs: declared-FK join elimination must drop
  * the join for fact-only projections (matching the join's exact
  * semantics), keep it when the PK side is referenced, and agree with
  * the joined results.
  */
class ExtensionsSpec extends SparkSpec {

  test("declared-FK inner join is eliminated for fact-only queries") {
    GraftExtensions.install(spark)
    GraftExtensions.declareFk("l_orderkey", "o_orderkey")
    Tables.registerAll(spark, Sf)
    try {
      val q = spark.sql(
        """SELECT l_returnflag, sum(l_quantity) AS sq
          |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          |GROUP BY l_returnflag""".stripMargin)
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("Join"),
        s"declared-FK join must be eliminated:\n$optimized")
      // semantics preserved: same result as the real join computes
      val viaJoin = Tables.load(spark, Sf, "lineitem").as("l")
        .join(Tables.load(spark, Sf, "orders").as("o"),
          col("l.l_orderkey") === col("o.o_orderkey"))
        .groupBy("l_returnflag")
        .agg(sum("l_quantity").as("sq"))
      assert(q.collect().sortBy(_.getString(0)).toSeq ===
        viaJoin.collect().sortBy(_.getString(0)).toSeq)

      // referencing the PK side keeps the join
      val q2 = spark.sql(
        """SELECT o_orderpriority, count(*) AS n
          |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          |GROUP BY o_orderpriority""".stripMargin)
      assert(q2.queryExecution.optimizedPlan.toString.contains("Join"))

      // undeclared keys keep the join
      GraftExtensions.clearFks()
      val q3 = spark.sql(
        """SELECT l_returnflag, count(*) AS n
          |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          |GROUP BY l_returnflag""".stripMargin)
      assert(q3.queryExecution.optimizedPlan.toString.contains("Join"))
    } finally GraftExtensions.clearFks()
  }
}
