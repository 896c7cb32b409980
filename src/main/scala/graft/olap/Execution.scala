package graft.olap

import java.util.concurrent.{Executors, TimeUnit, TimeoutException}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Execution control (SURVEY §2.13): per-query timeout and profiling —
  * the analogs of the reference's `execute(timeout:)` (query.rb:239-241,
  * 0.1s timeout aborts a 5s query, query_test.rb:1325-1331) and
  * `execute(profiling: true)` (plan text + per-phase timings,
  * connection.rb:510-539, result.rb:112-137).
  */
object Execution {

  final case class Profile(
      logicalPlan: String,
      physicalPlan: String,
      planMs: Long,
      executeMs: Long,
      totalMs: Long,
      marks: Seq[(String, Long)])

  final case class ProfiledResult(rows: Seq[Row], profile: Profile)

  final case class QueryTimeoutException(seconds: Double)
      extends RuntimeException(
        s"Query timed out after $seconds seconds")

  /** Run `df.collect()` with a wall-clock timeout; on expiry the Spark
    * job group is cancelled (executors stop working — the analog of
    * Mondrian's RolapResultShepherd abort) and QueryTimeoutException is
    * thrown.
    */
  def collectWithTimeout(spark: SparkSession, df: DataFrame,
      seconds: Double): Array[Row] = {
    val group = s"graft-timeout-${System.nanoTime()}"
    val sc = spark.sparkContext
    val pool = Executors.newSingleThreadExecutor()
    try {
      val fut = pool.submit(new java.util.concurrent.Callable[Array[Row]] {
        def call(): Array[Row] = {
          sc.setJobGroup(group, "graft query", interruptOnCancel = true)
          try df.collect() finally sc.clearJobGroup()
        }
      })
      try fut.get((seconds * 1000).toLong, TimeUnit.MILLISECONDS)
      catch {
        case _: TimeoutException =>
          sc.cancelJobGroup(group)
          fut.cancel(true)
          throw QueryTimeoutException(seconds)
      }
    } finally pool.shutdown()
  }

  /** Execute with profiling: returns rows + the logical/physical plan
    * text and phase timings (plan vs execute), mirroring the
    * reference's profiling handler output shape.
    */
  def profiled(df: DataFrame,
      marks: Seq[(String, Long)] = Nil): ProfiledResult = {
    val t0 = System.nanoTime()
    val qe = df.queryExecution
    val logical = qe.optimizedPlan.toString
    val physical = qe.executedPlan.toString
    val t1 = System.nanoTime()
    val rows = df.collect().toSeq
    val t2 = System.nanoTime()
    ProfiledResult(rows, Profile(
      logicalPlan = logical,
      physicalPlan = physical,
      planMs = (t1 - t0) / 1000000,
      executeMs = (t2 - t1) / 1000000,
      totalMs = (t2 - t0) / 1000000,
      marks = marks))
  }
}
