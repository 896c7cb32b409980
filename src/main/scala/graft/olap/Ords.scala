package graft.olap

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Global row-numbering over a sort order, scale-guarded.
  *
  * A bare `Window.orderBy(...)` plans an Exchange to ONE partition —
  * fine for dimension-bounded axis frames (tens..thousands of rows),
  * fatal for a high-cardinality axis (a 100M-member level would
  * single-thread and OOM one task). This helper keeps the cheap
  * single-partition window for small frames (by Catalyst's plan-size
  * estimate) and switches to a distributed two-phase numbering above
  * the threshold:
  *
  *   1. range-repartition by the sort key (parallel range sort),
  *   2. per-partition `row_number` (window partitioned by partition id),
  *   3. add per-partition offsets — a partition-count-sized prefix-sum
  *      frame, broadcast back. No driver-side action anywhere.
  *
  * The result is the same 1..n numbering a global window produces, at
  * any cardinality.
  */
object Ords {

  /** Plan-size threshold: below this the single-partition window wins
    * (two extra shuffles + a range-sampling pass aren't worth it).
    * Overridable for tests via spark conf `spark.graft.ord.smallBytes`.
    */
  val DefaultSmallBytes: Long = 64L << 20

  private def smallBytes(df: DataFrame): Long =
    df.sparkSession.conf.getOption("spark.graft.ord.smallBytes")
      .map(_.toLong).getOrElse(DefaultSmallBytes)

  /** Plan-size estimate for the Auto hint: the root estimate, corrected
    * by the summed leaf estimate when that is smaller — join-selectivity
    * guesses inflate root sizeInBytes multiplicatively, and the frames
    * routed here are projections/key-joins of their leaves (leaf totals
    * bound the output), so the smaller of the two is the honest figure.
    * Materialized caches (InMemoryRelation) make the leaf side exact.
    * The leaf-sum correction is SKIPPED for row-expanding plans
    * (explode/posexplode — a Generate node): there the leaves do NOT
    * bound the output, and the min would under-estimate a corpus-scale
    * frame onto the single-partition path (ADVICE r6).
    */
  private def estimatedBytes(df: DataFrame): BigInt = {
    val plan = df.queryExecution.optimizedPlan
    val expanding = plan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
    }.nonEmpty
    if (expanding) plan.stats.sizeInBytes
    else plan.stats.sizeInBytes.min(
      plan.collectLeaves().map(_.stats.sizeInBytes).sum)
  }

  /** Caller knowledge about the frame's cardinality. The Planner knows
    * whether an axis frame is dimension-bounded (every dim enumerable —
    * the reference's default, where member caches exist) or involves a
    * `high_cardinality` dimension (the reference's opt-out hint,
    * README.md): Catalyst's sizeInBytes estimate for a post-aggregate
    * frame is fact-sized and useless for this call, so the hint beats
    * the estimate whenever the caller has one.
    */
  sealed trait SizeHint
  case object Small extends SizeHint   // dimension-bounded: single window
  case object Large extends SizeHint   // high-cardinality: distributed
  case object Auto extends SizeHint    // no knowledge: plan-size estimate

  /** `df` + `out` = 1..n row number in `sort` order. */
  def rowNumber(df: DataFrame, sort: Seq[Column], out: String,
      hint: SizeHint = Auto): DataFrame = {
    require(sort.nonEmpty, "rowNumber needs a sort order")
    val small = hint match {
      case Small => true
      case Large => false
      case Auto => estimatedBytes(df) <= smallBytes(df)
    }
    if (small)
      df.withColumn(out, row_number().over(Window.orderBy(sort: _*)))
    else distributed(df, sort, out)
  }

  /** Numbering-frame lifecycle: delegated to [[Pins]] (query-scoped
    * release, or a materialize-then-FIFO global fallback). NOT free-run
    * FIFO eviction: unpinning a frame whose lazy consumers have not
    * executed would let the two subtrees of the offsets join resample
    * range bounds independently — the exact wrong-ordinal bug the
    * persist prevents (ADVICE r6). See [[Pins]] for the contract.
    */
  private def pin(df: DataFrame): DataFrame = Pins.pin(df)

  /** Release every globally pinned frame (cache flush / teardown). */
  def releaseAll(): Unit = Pins.releaseAll()

  private def distributed(df: DataFrame, sort: Seq[Column],
      out: String): DataFrame = {
    // monotonically_increasing_id() = (partitionId << 33) + rowIndex,
    // and after sortWithinPartitions the row index follows the sort
    // order — so the within-partition rank costs NO window and NO
    // second shuffle of the data.
    //
    // PERSISTED, not shared-by-ReuseExchange: the rows branch and the
    // per-partition-count branch below both consume this frame, and as
    // two independent materializations each would run its own
    // RangePartitioner sampling with a different per-RDD seed —
    // slightly different range bounds, so the counts would describe a
    // DIFFERENT partitioning than the rows they offset (observed: 1..n
    // drifts from the third partition on at 10M rows). The persist
    // pins one lineage — both branches read the one cached
    // materialization — which is exactly why release must wait for the
    // consumers to execute (Pins' contract). Global numbering
    // inherently takes two passes over the frame; materializing it
    // once is that cost, spill-backed at scale.
    val parted = pin(df.repartitionByRange(sort: _*)
      .sortWithinPartitions(sort: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__mid", monotonically_increasing_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val within = parted.withColumn("__rn",
      col("__mid") - shiftleft(col("__pid").cast("long"), 33))
    // per-partition counts → prefix-sum offsets: a frame with one row
    // per partition, the only single-partition hop in the plan
    val offsets = parted.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(
        sum(col("__cnt")).over(Window.orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__off"))
    within.join(broadcast(offsets), "__pid")
      .withColumn(out, (col("__rn") + col("__off") + 1L).cast("int"))
      .drop("__pid", "__mid", "__rn", "__off")
  }

  /** `df` + `out` = inclusive running sum of `value` in `sort` order,
    * scale-guarded like [[rowNumber]]: small frames keep the cheap
    * single-partition window; large frames run a two-phase
    * range-partitioned prefix sum — per-partition running sums plus a
    * broadcast partition-offset join, so no data-sized frame ever
    * exchanges to one partition. `value` is accumulated as long.
    *
    * The sort keys must form a TOTAL order (unique): with ties, the
    * per-row cumulative value depends on tie order, which differs
    * between the two paths and across materializations of the
    * range-partitioned one.
    */
  def runningSum(df: DataFrame, sort: Seq[Column], value: Column,
      out: String, hint: SizeHint = Auto): DataFrame = {
    require(sort.nonEmpty, "runningSum needs a sort order")
    val small = hint match {
      case Small => true
      case Large => false
      case Auto => estimatedBytes(df) <= smallBytes(df)
    }
    if (small)
      df.withColumn(out, sum(value.cast("long"))
        .over(Window.orderBy(sort: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    else distributedSum(df, sort, value, out)
  }

  private def distributedSum(df: DataFrame, sort: Seq[Column],
      value: Column, out: String): DataFrame = {
    // Same persisted-range-partition skeleton as [[distributed]] (one
    // RangePartitioner sampling shared by both consumers). Unlike
    // row-numbering there is no window-free trick for a running sum, so
    // the within-partition prefix costs one extra hash exchange on
    // __pid — paid by the NARROW (sort key, value) frame a caller
    // passes here, never the full rows, and every hop stays parallel.
    val parted = pin(df.repartitionByRange(sort: _*)
      .sortWithinPartitions(sort: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__v", value.cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val within = parted.withColumn("__ps",
      sum(col("__v")).over(Window.partitionBy(col("__pid"))
        .orderBy(sort: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // one row per partition → exclusive prefix of partition totals;
    // the only single-partition hop in the plan
    val offsets = parted.groupBy(col("__pid"))
      .agg(sum(col("__v")).as("__cnt"))
      .withColumn("__off", coalesce(
        sum(col("__cnt")).over(Window.orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__off"))
    within.join(broadcast(offsets), "__pid")
      .withColumn(out, col("__ps") + col("__off"))
      .drop("__pid", "__v", "__ps", "__off")
  }

  /** Scalar total row count joined in as a broadcast column — replaces
    * `count(*) over ()` (which also exchanges to one partition).
    */
  def withTotal(df: DataFrame, out: String): DataFrame =
    df.crossJoin(broadcast(df.agg(count(lit(1)).as(out))))
}
