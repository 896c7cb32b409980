package graft

import graft.olap._

/** Mixed-depth member sets + Hierarchize PRE/POST — reference
  * query_test.rb:231-260 (rows of Country.Members + City.Members) and
  * :591-611 (hierarchize, hierarchize POST).
  */
class MixedDepthSpec extends SparkSpec {

  private lazy val cube = Cubes.sales(spark, Sf)
  private def mixed =
    UnionSet(LevelMembers("customer", "region"),
      LevelMembers("customer", "nation"), all = true)

  test("union of region- and nation-level members aggregates per grain") {
    val df = Query.from(cube).columns("count_order").rows(mixed).execute()
    val rows = df.collect()
    val regions = rows.filter(_.isNullAt(1))
    val nations = rows.filterNot(_.isNullAt(1))
    assert(regions.nonEmpty && nations.nonEmpty)
    // each region's cell equals the sum of its nations' cells (the
    // region row aggregates at ITS OWN grain, not a padded nation grain)
    regions.foreach { r =>
      val total = nations.filter(_.getString(0) == r.getString(0))
        .map(_.getLong(2)).sum
      assert(r.getLong(2) == total,
        s"region ${r.getString(0)} cell must equal its nations' sum")
    }
  }

  test("default order is hierarchical PRE: parent directly before children") {
    val rows = Query.from(cube).columns("count_order")
      .rows(Hierarchize(mixed)).execute().collect()
    // walk the axis: a region row must be immediately followed by its
    // own nations
    rows.zipWithIndex.foreach { case (r, i) =>
      if (r.isNullAt(1) && i + 1 < rows.length)
        assert(rows(i + 1).getString(0) == r.getString(0),
          "a parent must be followed by its first child (PRE order)")
    }
    assert(rows.head.isNullAt(1), "first row must be a parent (PRE)")
  }

  test("Hierarchize POST puts each parent directly after its children") {
    val rows = Query.from(cube).columns("count_order")
      .rows(Hierarchize(mixed, post = true)).execute().collect()
    assert(rows.last.isNullAt(1), "last row must be a parent (POST)")
    rows.zipWithIndex.foreach { case (r, i) =>
      if (r.isNullAt(1) && i > 0)
        assert(rows(i - 1).getString(0) == r.getString(0),
          "a parent must follow its last child (POST order)")
    }
  }

  test("mixed-depth literal member set pads shallow paths") {
    val rows = Query.from(cube).columns("count_order")
      .rows(Members("customer",
        Seq(Seq("EUROPE"), Seq("AMERICA", "NATION_6"))))
      .execute().collect()
    assert(rows.length == 2)
    val byRegion = rows.map(r => r.getString(0) ->
      (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(byRegion("EUROPE") == null)
    assert(byRegion("AMERICA") == "NATION_6")
  }

  test("NON EMPTY and measures work over a mixed-depth axis") {
    val df = Query.from(cube).columns("revenue", "margin")
      .rows(mixed).nonempty().execute()
    assert(df.collect().forall(!_.isNullAt(2)))
  }

  test("NonEmptyCrossJoin rejects mixed-depth inputs with a clear error") {
    val e = intercept[IllegalArgumentException] {
      Query.from(cube).columns("revenue")
        .rows(NonEmptyCrossJoin(mixed,
          LevelMembers("returnflag", "returnflag")))
        .execute()
    }
    assert(e.getMessage.contains("mixed-depth"))
  }

  test("CrossJoin with a uniform set propagates mixed cells correctly") {
    val rows = Query.from(cube).columns("count_order")
      .rows(CrossJoin(LevelMembers("returnflag", "returnflag"), mixed))
      .execute().collect()
    // region rows present and equal to the sum over their nations
    // within each returnflag slice
    val regions = rows.filter(_.isNullAt(2))
    assert(regions.nonEmpty)
    regions.foreach { r =>
      val total = rows.filter(x => !x.isNullAt(2) &&
        x.getString(0) == r.getString(0) &&
        x.getString(1) == r.getString(1)).map(_.getLong(3)).sum
      assert(r.getLong(3) == total)
    }
  }
}
