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
