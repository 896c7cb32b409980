package graft.olap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Lifecycle manager for load-bearing persisted intermediates (the
  * range-partitioned numbering frames in [[Ords]], the shingle /
  * candidate / band frames in `graft.ops.DedupOps`) AND for eager
  * lineage-cut checkpoints (the iterative CC / closure / k-means round
  * frames).
  *
  * These persists are correctness-critical, not just caches: each frame
  * feeds 2+ consumers inside one query plan, and if the frame is NOT in
  * the cache when a consumer executes, the consumers replan with fresh
  * exchanges whose RangePartitioner sampling derives from new RDD ids —
  * the two subtrees of an offsets join can then see DIFFERENT partition
  * bounds and produce wrong ordinals (the nondeterministic-
  * exchange-reuse bug the persists exist to prevent). So the safe
  * release point is "after the consuming query has executed", never
  * "when a FIFO cap overflows" (ADVICE r6: a cap-eviction racing an
  * unexecuted lazy consumer silently corrupts results).
  *
  * Checkpoints need the same management for a different reason:
  * `localCheckpoint` persists its RDD OUTSIDE the SQL CacheManager, so
  * `DataFrame.unpersist` cannot free it — un-released, every iterative
  * operator leaks one executor-memory RDD per call until a GC-driven
  * ContextCleaner sweep happens to collect it (observed: one resident
  * frame per `CleanPipeline.clean` call). [[freeCut]] frees the
  * checkpoint blocks directly via the plan's [[LogicalRDD]] leaves.
  *
  * Two registration modes:
  *
  *  - '''Scoped''' (the query-boundary mode `Bench`/`Verify` and the
  *    engine's execute path use): `Pins.scoped { build-and-collect }`
  *    registers every pin/cut created on this thread inside the block
  *    and releases them all when the block exits — by which point the
  *    query's actions have run, so release is unconditionally safe, and
  *    storage occupancy across a query sequence is bounded by ONE
  *    query's working set instead of growing with session age (the
  *    r6 official bench carried dozens of stale frames from earlier
  *    queries into `q_pipeline_curate`, 5×-ing it).
  *
  *  - '''Global fallback''' (no scope on the thread — ad-hoc library
  *    use): a FIFO registry bounded at [[MaxGlobal]]. To keep cap
  *    eviction out of the unsafe window, `pin` EAGERLY materializes the
  *    frame (one count over the to-be-cached data, work the first
  *    consumer would do anyway), so by the time a frame can be evicted
  *    its cache entry is fully built and, in sequential use, its
  *    consumers have long since run. The residual constraint — do not
  *    re-collect a consumer of a frame after [[MaxGlobal]] further pins
  *    or [[releaseAll]] — is inherent to cap-based release (for an
  *    evicted persist it costs a deterministic recompute; for an
  *    evicted local checkpoint it fails LOUDLY with a missing-block
  *    error, never silently); long-lived servers should wrap query
  *    execution in [[scoped]] instead.
  */
object Pins {

  private val MaxGlobal = 32
  private val global = new java.util.ArrayDeque[() => Unit]

  // Stack of open scopes for the current thread (scopes may nest:
  // a pipeline query scoped by Bench may itself open one). Each scope
  // holds the release thunks of the frames registered inside it.
  private val scopes =
    new ThreadLocal[java.util.ArrayDeque[java.util.ArrayList[() => Unit]]] {
      override def initialValue() =
        new java.util.ArrayDeque[java.util.ArrayList[() => Unit]]
    }

  private def register(df: DataFrame, release: () => Unit,
      materialize: () => Unit): DataFrame = {
    val stack = scopes.get()
    if (!stack.isEmpty) { stack.peekLast().add(release); df }
    else {
      // materialize BEFORE the frame becomes eviction-eligible: the
      // cache entry is complete, so a later cap eviction can only cost
      // a recompute of an already-consumed frame, never hand two lazy
      // consumers differently-sampled range bounds
      materialize()
      global.synchronized {
        global.addLast(release)
        while (global.size > MaxGlobal) global.pollFirst().apply()
      }
      df
    }
  }

  /** Register a `.persist()`ed frame for release at the current scope's
    * exit (innermost scope wins), or in the bounded global registry
    * when no scope is open on this thread. Returns `df`.
    */
  def pin(df: DataFrame): DataFrame =
    register(df, () => df.unpersist(blocking = false), () => df.count())

  /** Eager lineage cut, UNREGISTERED: a reliable checkpoint
    * (HDFS/object store — survives executor loss, the right mode on a
    * real cluster) when the session has a checkpoint dir configured,
    * an executor-local checkpoint otherwise (lineage-free and fast,
    * but a lost executor mid-iteration fails the job for a retry;
    * acceptable in local/test runs with nowhere reliable to write).
    * Callers own the blocks: iterative loops free superseded rounds
    * with [[freeCut]] and register their final frame via [[adopt]].
    * (Reliable-checkpoint FILES are cleaned by the ContextCleaner only
    * with `spark.cleaner.referenceTracking.cleanCheckpoints=true`;
    * [[freeCut]] frees block-manager storage, which reliable mode does
    * not occupy.)
    */
  def rawCut(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)

  /** [[rawCut]] + [[adopt]]: the one-shot form for a non-loop
    * lineage cut whose consumers run inside the current scope.
    */
  def cut(df: DataFrame): DataFrame = adopt(rawCut(df))

  /** Register an already-materialized checkpoint frame (a [[rawCut]]
    * survivor) for scope-exit / global-FIFO release. No re-count: the
    * eager checkpoint already materialized it.
    */
  def adopt(df: DataFrame): DataFrame =
    register(df, () => freeCut(df), () => ())

  /** Free the executor blocks behind a checkpointed frame NOW — the
    * plan's [[LogicalRDD]] leaves are unpersisted directly, which is
    * the only release path that works for checkpoints (they bypass the
    * SQL CacheManager, so `DataFrame.unpersist` is a no-op on them).
    * Idempotent. Call only on frames whose consumers have executed and
    * whose plan the caller OWNS (a shared upstream checkpoint leaf
    * would be freed too).
    */
  def freeCut(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: LogicalRDD => l.rdd.unpersist(blocking = false)
      case _             => ()
    }

  /** Run `body` with a fresh pin scope on this thread; every frame
    * pinned/adopted inside is released when the block exits (normally
    * or exceptionally). Collect the query's results INSIDE the block —
    * that is what makes the release safe.
    */
  def scoped[T](body: => T): T = {
    val stack = scopes.get()
    val mine = new java.util.ArrayList[() => Unit]
    stack.addLast(mine)
    try body
    finally {
      stack.removeLast()
      mine.forEach(release => release())
      if (stack.isEmpty) scopes.remove()
    }
  }

  /** Release every globally registered frame (teardown / cache flush).
    * Open scopes are untouched — their frames release at scope exit.
    */
  def releaseAll(): Unit = global.synchronized {
    while (!global.isEmpty) global.pollFirst().apply()
  }
}
