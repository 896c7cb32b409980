package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the hand-rolled complements to AQE's
  * runtime skew-join splitting (which handles sort-merge joins but not
  * hot-key aggregations or broadcast-side explosions).
  *
  * Shapes:
  *  - Salted two-phase aggregation: a hot grouping key (one member
  *    holding half the fact) serializes its whole group through one
  *    reducer. Salting splits each key into `buckets` sub-groups for
  *    the partial phase; the final phase merges `buckets` rows per key
  *    — bounded reducer input regardless of skew.
  *  - Salted broadcast-replicated join: for a skewed equi-join where
  *    the small side fits broadcast, replicate the small side per salt
  *    so the big side's hot key spreads over `buckets` partitions.
  *
  * Only decomposable aggregates can two-phase (same rule as the
  * agg-table router): sum/count/min/max re-aggregate from partials;
  * avg decomposes as (sum, count).
  */
object SkewOps {

  /** groupBy(keys).agg(sum-like measures) with per-key salting.
    * `aggs` maps output name -> (aggregated expression, merge kind),
    * merge kind ∈ sum | min | max.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String],
      aggs: Map[String, (Column, String)], buckets: Int): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(buckets)))
    val partial = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(aggs.head._2._1.as(aggs.head._1),
        aggs.tail.map { case (n, (c, _)) => c.as(n) }.toSeq: _*)
    val merged = aggs.map { case (n, (_, kind)) =>
      (kind match {
        case "sum" => sum(col(n))
        case "min" => min(col(n))
        case "max" => max(col(n))
        case other =>
          throw new IllegalArgumentException(s"merge kind '$other'")
      }).as(n)
    }.toSeq
    partial.groupBy(keys.map(col): _*)
      .agg(merged.head, merged.tail: _*)
  }

  /** Skewed equi-join: big side salted (random bucket per row), small
    * side replicated across all buckets, join on (key, salt). The
    * small side must be broadcastable; the big side's hot keys spread
    * over `buckets` tasks.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, buckets: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(buckets)))
    val replicated = small
      .withColumn("__salt", explode(expr(
        s"sequence(0, ${buckets - 1})")))
      .withColumn("__salt", col("__salt").cast("long"))
    saltedBig.join(broadcast(replicated),
        saltedBig(bigKey) === replicated(smallKey) &&
          saltedBig("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
