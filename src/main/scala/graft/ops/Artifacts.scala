package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.hadoop.fs.Path

/** Shared plumbing for persisted index artifacts (the IVF-PQ index,
  * the near-dup cluster index): a rebuild must wipe every prior
  * generation under its path — stale generations mixing with a
  * retrained model silently corrupt results — but an UNCONDITIONAL
  * recursive delete of a caller-supplied path is a foot-gun (a typo'd
  * or reused path destroys unrelated data). Every index therefore
  * writes a `_graft_*.json` marker beside its data, and a rebuild may
  * only wipe a directory that carries the marker (a prior index of
  * ours) or is empty/missing; anything else fails loudly. The leading
  * underscore keeps the marker invisible to Spark's file listing, so
  * `spark.read.parquet(path)` never trips over it.
  */
object Artifacts {

  /** Claim `path` for a (re)build: wipe a prior marked index or take
    * over an empty/missing directory, then recreate it with `marker`
    * holding `content` (the index params, for forensics and append-
    * time compatibility checks). Refuses — loudly — to delete a
    * directory that is neither.
    */
  def claimIndexDir(spark: SparkSession, path: String, marker: String,
      content: String): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) {
      val ours = fs.exists(new Path(p, marker))
      lazy val empty = fs.listStatus(p).isEmpty
      require(ours || empty,
        s"refusing to wipe '$path': no $marker marker found and the " +
          "directory is not empty — it does not look like a prior " +
          "graft index (delete it manually if that is intended)")
      fs.delete(p, true)
    }
    fs.mkdirs(p)
    val out = fs.create(new Path(p, marker), true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  /** Read a marker written by [[claimIndexDir]]; IllegalArgumentException
    * if absent (the path is not a graft index of the expected kind).
    */
  def readMarker(spark: SparkSession, path: String,
      marker: String): String = {
    val got = readSmallFileOpt(spark, new Path(path, marker).toString)
    require(got.isDefined,
      s"'$path' is not a graft index: $marker missing")
    got.get
  }

  /** Overwrite a small metadata file (fingerprints, watermarks).
    * Underscore-prefixed names stay invisible to Spark file listings.
    */
  def writeSmallFile(spark: SparkSession, path: String,
      content: String): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  /** Atomic variant for markers whose BYTES are trusted by a guard
    * (ingest fingerprints, compaction plans): a crash mid-create must
    * leave the file absent, never truncated — a half-written
    * fingerprint would refuse the legitimate exact replay that is the
    * documented healing path. Write-then-rename; the `.tmp` keeps the
    * underscore prefix so it stays invisible to Spark listings too.
    */
  def writeSmallFileAtomic(spark: SparkSession, path: String,
      content: String): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new Path(path + ".tmp")
    writeSmallFile(spark, tmp.toString, content)
    if (fs.exists(p)) fs.delete(p, false)
    require(fs.rename(tmp, p),
      s"atomic small-file rename failed: $tmp -> $p")
  }

  /** Staging dir name for index compactions (underscore prefix:
    * invisible to Spark's file listings, so a half-staged compaction
    * never leaks into reads).
    */
  val CompactDir = "_compact"
  private val CompactDone = "_DONE"

  /** Refuse while ANY compaction state exists under `root` — the
    * guard for mutating index ops, which must not interleave with a
    * compaction whose swap may be incomplete (folded partitions
    * partially deleted).
    */
  def requireNoCompactInFlight(spark: SparkSession, root: String,
      rerun: String): Unit = {
    val p = new Path(new Path(root), CompactDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    require(!fs.exists(p),
      s"a compaction of $root is in flight or crashed mid-swap; " +
        s"re-run $rerun to complete it first")
  }

  /** Refuse only while the SWAP phase may be underway (`_DONE` plan
    * marker present) — the guard for READ paths whose data the swap
    * moves: mid-stage the originals are untouched and reads are safe,
    * but mid-swap part of the data lives only under the invisible
    * staging dir and a plain read would silently return a fraction.
    */
  def requireNoSwapInFlight(spark: SparkSession, root: String,
      rerun: String): Unit = {
    val p = new Path(new Path(new Path(root), CompactDir), CompactDone)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    require(!fs.exists(p),
      s"a compaction swap of $root is in flight or crashed; " +
        s"re-run $rerun to complete it first")
  }

  /** Crash-safe stage-and-swap — the one compaction protocol every
    * persisted index shares (cluster index, clean index, IVF-PQ):
    *
    *  1. `planOf()` decides the work (None = nothing to fold);
    *  2. STAGE: `stage(plan, tmpDir)` writes the folded copy under
    *     the underscore-invisible `$root/_compact/` staging dir —
    *     originals untouched — and the plan string lands LAST as the
    *     `_DONE` marker;
    *  3. SWAP: for each `(stagedSubdir, deletePaths, dstPath)` from
    *     `swaps(plan)`, delete the folded originals then rename the
    *     staged subdir into place — the staged subdir still existing
    *     is the per-entry resume signal;
    *  4. `afterSwap(plan)` for protocol epilogue (e.g. fingerprints),
    *     then the staging dir is removed.
    *
    * Crash anywhere is recoverable by re-running: mid-stage (no
    * `_DONE`) wipes and restages from the untouched originals;
    * mid-swap resumes the persisted plan exactly where it died.
    * Callers enforce single-writer maintenance and guard their
    * mutating/read paths with [[requireNoCompactInFlight]] /
    * [[requireNoSwapInFlight]]. Returns the executed plan (the
    * resumed one when recovering), None when there was nothing to do.
    */
  def stageAndSwap(spark: SparkSession, root: String,
      planOf: () => Option[String],
      stage: (String, Path) => Unit,
      swaps: String => Seq[(String, Seq[String], String)],
      afterSwap: String => Unit = _ => ()): Option[String] = {
    val rootP = new Path(root)
    val fs = rootP.getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new Path(rootP, CompactDir)
    val done = new Path(tmp, CompactDone)
    // a staging dir without its _DONE marker is a crashed stage:
    // originals are untouched, so wipe and restage
    if (fs.exists(tmp) && !fs.exists(done)) fs.delete(tmp, true)
    val resuming = fs.exists(done)
    val plan =
      if (resuming) readSmallFileOpt(spark, done.toString) else planOf()
    plan.foreach { pl =>
      if (!resuming) {
        stage(pl, tmp)
        // the marker write must be ATOMIC: resume trusts its bytes,
        // and a crash mid-create would otherwise leave an empty or
        // truncated plan that bricks the index (or loses the delete
        // list and duplicates data). Write-then-rename makes _DONE
        // either absent (crashed stage → wiped and restaged) or whole.
        val staged = new Path(tmp, CompactDone + ".tmp")
        writeSmallFile(spark, staged.toString, pl)
        require(fs.rename(staged, done),
          s"compaction plan-marker rename failed: $staged -> $done")
      }
      swaps(pl).foreach { case (sub, deletes, dst) =>
        val src = new Path(tmp, sub)
        if (fs.exists(src)) {
          deletes.foreach(d => fs.delete(new Path(d), true))
          // a pre-existing dst (e.g. a folded original the plan did
          // not list, under a mixed-config anomaly) would NEST the
          // renamed dir inside it — the staged copy is the new truth
          val dstP = new Path(dst)
          fs.delete(dstP, true)
          require(fs.rename(src, dstP),
            s"compaction rename failed: $src -> $dst")
        }
      }
      afterSwap(pl)
      fs.delete(tmp, true)
    }
    plan
  }

  /** Read a small metadata file, None when absent. */
  def readSmallFileOpt(spark: SparkSession,
      path: String): Option[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](8192)
        var n = in.read(chunk)
        while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
        Some(new String(buf.toByteArray, "UTF-8"))
      } finally in.close()
    }
  }
}
