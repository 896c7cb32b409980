package graft

import org.apache.spark.sql.functions._

/** Bucketed-write / co-located-join spec — the 100 TB story for the
  * lineitem⋈orders fact view (Cubes.salesFact): on a real cluster both
  * big tables are bucketed by orderkey, so the fact-side join needs no
  * shuffle. This spec proves the mechanism end-to-end on local data:
  * write both tables bucketed by the join key, join the bucketed reads,
  * and assert the plan contains no Exchange on either join input.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join without a shuffle") {
    val li = Tables.load(spark, Sf, "lineitem")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val o = Tables.load(spark, Sf, "orders")
      .select("o_orderkey", "o_orderdate")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("o_bucketed")

    val joined = spark.table("li_bucketed")
      .join(spark.table("o_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(year(col("o_orderdate")).as("y"))
      .agg(sum("l_quantity").as("q"))

    val plan = joined.queryExecution.executedPlan.toString
    val joinSection = plan.split("HashAggregate").last
    // the join inputs must read bucket files directly — no Exchange
    // between the scans and the SortMergeJoin
    val exchangesBelowJoin = "Exchange hashpartitioning"
      .r.findAllIn(joinSection).length
    assert(exchangesBelowJoin === 0,
      s"bucketed join must not shuffle either side:\n$plan")
    // and the result matches the unbucketed computation
    val expect = Tables.load(spark, Sf, "lineitem")
      .join(Tables.load(spark, Sf, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(year(col("o_orderdate")).as("y"))
      .agg(sum("l_quantity").as("q"))
    assert(joined.collect().toSet === expect.collect().toSet)

    spark.sql("DROP TABLE li_bucketed")
    spark.sql("DROP TABLE o_bucketed")
  }
}
