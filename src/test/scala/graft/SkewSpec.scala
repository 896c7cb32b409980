package graft

import org.apache.spark.sql.functions._
import graft.ops.SkewOps

/** Salted-aggregation / salted-join correctness: skew mitigation must
  * be value-neutral.
  */
class SkewSpec extends SparkSpec {

  private lazy val li = Tables.load(spark, Sf, "lineitem")

  test("salted two-phase aggregation equals the direct aggregate") {
    val direct = li.groupBy("l_returnflag")
      .agg(sum(expr("cast(l_quantity as decimal(38,10))")).as("q"),
        count(lit(1)).as("n"), max("l_extendedprice").as("mx"))
      .collect().map(r => r.getString(0) ->
        (r.getDecimal(1), r.getLong(2), r.getDouble(3))).toMap
    val salted = SkewOps.saltedAgg(li, Seq("l_returnflag"),
      Map(
        "q" -> (sum(expr("cast(l_quantity as decimal(38,10))")), "sum"),
        "n" -> (count(lit(1)), "sum"),
        "mx" -> (max(col("l_extendedprice")), "max")),
      buckets = 8)
      .collect().map(r => r.getString(0) ->
        (r.getDecimal(1), r.getLong(2), r.getDouble(3))).toMap
    assert(salted === direct)
  }

  test("salted broadcast join equals the plain join") {
    val o = Tables.load(spark, Sf, "orders")
      .select("o_orderkey", "o_orderpriority")
    val plain = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = SkewOps.saltedJoin(li, o, "l_orderkey", "o_orderkey", 4)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
  }
}
