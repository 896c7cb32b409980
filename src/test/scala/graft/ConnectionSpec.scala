package graft

import graft.olap._

/** Connection façade specs: cube registry routing, the four entry
  * points, cache control, and closed-connection errors.
  */
class ConnectionSpec extends SparkSpec {

  test("routes MDX to the cube named in FROM and exposes the builder") {
    val conn = Connection.create(spark, Sf)
    assert(conn.cubeNames === Seq("Events", "Sales"))
    val viaMdx = conn.execute(
      """SELECT {[Measures].[revenue]} ON COLUMNS,
        |  [customer].[region].Members ON ROWS
        |FROM [Sales]""".stripMargin).collect()
    assert(viaMdx.length === 5)
    val events = conn.execute(
      """SELECT {[Measures].[n_events]} ON COLUMNS,
        |  [event_type].[event_type].Members ON ROWS
        |FROM [Events]""".stripMargin).collect()
    assert(events.nonEmpty)
    assert(conn.from("Sales").columns("revenue").execute().count() === 1)
    assert(conn.metadata("Sales").measureNames.contains("revenue"))
    val e = intercept[Mdx.MdxException] {
      conn.execute("SELECT {[Measures].[x]} ON COLUMNS FROM [Nope]")
    }
    assert(e.msg.contains("not found"))
  }

  test("close flushes segments and refuses further queries") {
    val conn = Connection.create(spark, Sf)
    conn.execute(
      """SELECT {[Measures].[revenue]} ON COLUMNS,
        |  [customer].[region].Members ON ROWS
        |FROM [Sales]""".stripMargin).collect()
    conn.close()
    assert(!conn.connected)
    intercept[IllegalStateException] { conn.from("Sales") }
    intercept[IllegalStateException] {
      conn.execute("SELECT {[Measures].[revenue]} ON COLUMNS FROM [Sales]")
    }
  }
}
