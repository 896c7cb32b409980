package graft

import org.apache.spark.sql.functions._
import graft.olap._

/** Schema validation + virtual-cube specs. */
class ModelSpec extends SparkSpec {

  private lazy val cube = Cubes.sales(spark, Sf)

  test("a well-formed cube validates") {
    cube.validate()
  }

  test("validation errors name the offending binding") {
    val badLevel = cube.copy(dims = cube.dims.map(d =>
      if (d.name == "part")
        d.copy(levels = d.levels :+ BoundLevel("nope", "p_missing"))
      else d))
    val e1 = intercept[IllegalArgumentException](badLevel.validate())
    assert(e1.getMessage.contains("p_missing") &&
      e1.getMessage.contains("part"))

    val badFk = cube.copy(dims = cube.dims.map(d =>
      if (d.name == "part") d.copy(foreignKey = "l_nope") else d))
    val e2 = intercept[IllegalArgumentException](badFk.validate())
    assert(e2.getMessage.contains("l_nope") &&
      e2.getMessage.contains("foreign key"))

    val dupe = cube.copy(measures =
      cube.measures :+ cube.measures.head)
    val e3 = intercept[IllegalArgumentException](dupe.validate())
    assert(e3.getMessage.contains("duplicate"))
  }

  test("virtual cube aligns measures and leaves unshared cells empty") {
    val vc = new VirtualCube("SalesAndEvents", Seq(
      Cubes.sales(spark, Sf) -> Seq("revenue"),
      Cubes.events(spark, Sf) -> Seq("n_events")))
    val df = vc.aggregate(Seq(("time", "year")))
    val rows = df.collect()
    assert(rows.nonEmpty)
    // sales years (1992-1998-ish) and events years (2024) don't
    // overlap: every row has exactly one side populated
    assert(rows.forall(r =>
      (r.isNullAt(r.fieldIndex("revenue")) !=
        r.isNullAt(r.fieldIndex("n_events")))),
      "non-overlapping years must yield one-sided (empty) cells")
  }

  test("virtual cube applies slicers only to cubes sharing the dim") {
    val vc = new VirtualCube("SalesAndEvents", Seq(
      Cubes.sales(spark, Sf) -> Seq("revenue"),
      Cubes.events(spark, Sf) -> Seq("n_events")))
    // customer dim exists only on Sales: events side unaffected
    val df = vc.aggregate(Seq(("time", "year")),
      Seq(MemberSlice("customer", Seq("EUROPE"))))
    val evTotal = df.agg(sum("n_events")).collect().head.getLong(0)
    val evAll = Query.from(Cubes.events(spark, Sf)).columns("n_events")
      .execute().collect().head.getLong(0)
    assert(evTotal === evAll)
  }
}
