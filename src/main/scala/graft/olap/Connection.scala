package graft.olap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Connection façade — the reference's top-level entry
  * (lib/mondrian/olap/connection.rb): one object that owns the session
  * + schema binding and exposes the four query surfaces (raw MDX,
  * builder, metadata, drill-through) plus cache control. Where the
  * reference wraps a JDBC/olap4j connection, this wraps a SparkSession
  * and a set of bound cubes; `close` drops only this connection's
  * cached state, never the shared session.
  */
final class Connection private (
    val spark: SparkSession,
    cubes: Map[String, BoundCube]) {

  @volatile private var open = true
  private def ensureOpen(): Unit =
    if (!open) throw new IllegalStateException("connection is closed")

  def connected: Boolean = open

  def cubeNames: Seq[String] = cubes.keys.toSeq.sorted

  def cube(name: String): BoundCube = {
    ensureOpen()
    cubes.getOrElse(name, throw new IllegalArgumentException(
      s"MDX cube '$name' not found " +
        s"(have: ${cubeNames.mkString(", ")})"))
  }

  /** Entry point B: builder rooted at a cube (connection.from). */
  def from(cubeName: String): Query = Query.from(cube(cubeName))

  /** Entry point A: raw MDX (FROM [Cube] names the target cube;
    * optional statement parameters).
    */
  def execute(mdx: String,
      parameters: Map[String, Any] = Map.empty): DataFrame = {
    ensureOpen()
    Mdx.execute(mdx, cubeFor(mdx), parameters)
  }

  /** Entry point D: DRILLTHROUGH statement. */
  def executeDrillThrough(mdx: String): DataFrame = execute(mdx)

  /** Entry point C: metadata for a cube. */
  def metadata(cubeName: String): CubeMetadata =
    new CubeMetadata(cube(cubeName))

  // ------------------------------------------------------ cache control

  /** Flush every cached segment of one cube (reference
    * flush_schema_cache / CacheControl).
    */
  def flushCube(cubeName: String): Unit =
    SegmentCache.global.flushCube(cube(cubeName).cubeId)

  /** Flush segments intersecting one member region (reference
    * flush_region_cache_with_full_names).
    */
  def flushRegion(cubeName: String, dim: String, path: Seq[Any]): Unit =
    SegmentCache.global.flushRegion(cube(cubeName).cubeId, dim, path)

  /** Close: flush this connection's cube segments and refuse further
    * queries. The SparkSession is shared infrastructure and stays up.
    */
  def close(): Unit = {
    cubes.values.foreach(c => SegmentCache.global.flushCube(c.cubeId))
    open = false
  }

  /** FROM [name] of the statement, resolved against the registry (any
    * DRILLTHROUGH/WITH prefix is handled by keyword scan over tokens).
    */
  private def cubeFor(mdx: String): BoundCube = {
    val toks = Mdx.lex(mdx)
    val fromIdx = toks.indexWhere {
      case Mdx.TIdent(s) => s.equalsIgnoreCase("FROM")
      case _ => false
    }
    val name = toks.lift(fromIdx + 1) match {
      case Some(Mdx.TBracket(s)) => s
      case Some(Mdx.TIdent(s)) => s
      case _ => throw Mdx.MdxException(
        "Syntax error: missing FROM [Cube]")
    }
    cubes.collectFirst {
      case (n, c) if n.equalsIgnoreCase(name) => c
    }.getOrElse(throw Mdx.MdxException(
      s"MDX cube '$name' not found (have: ${cubeNames.mkString(", ")})"))
  }
}

object Connection {
  /** Create over an explicit cube registry. */
  def create(spark: SparkSession, cubes: Seq[BoundCube]): Connection =
    new Connection(spark, cubes.map(c => c.name -> c).toMap)

  /** Create over the standard testdata cubes of one scale-factor dir
    * (the analog of connecting to one database).
    */
  def create(spark: SparkSession, sfDir: String): Connection =
    create(spark, Seq(
      graft.Cubes.sales(spark, sfDir),
      graft.Cubes.events(spark, sfDir)))
}
