package graft

import graft.olap._

/** Cross-feature interaction probes: combinations no single-feature
  * oracle query exercises, pinned by internal-consistency invariants.
  */
class ComboSpec extends SparkSpec {

  private lazy val cube = Cubes.sales(spark, Sf)
  private def mixed =
    UnionSet(LevelMembers("customer", "region"),
      LevelMembers("customer", "nation"), all = true)

  test("TopCount over a mixed-depth axis ranks across grains") {
    val rows = Query.from(cube).columns("revenue")
      .rows(TopCount(mixed, 3, "revenue")).execute().collect()
    assert(rows.length == 3)
    val vals = rows.map(_.getDecimal(2).doubleValue())
    assert(vals.sorted.reverse.toSeq == vals.toSeq)
  }

  test("Filter over a mixed-depth axis keeps both grains eligible") {
    val all = Query.from(cube).columns("count_order")
      .rows(mixed).execute().collect()
    val kept = Query.from(cube).columns("count_order")
      .rows(FilterSet(mixed, "count_order > 0")).execute().collect()
    assert(kept.length <= all.length && kept.nonEmpty)
  }

  test("slicer composes with a mixed-depth axis") {
    val rows = Query.from(cube).columns("count_order")
      .rows(mixed).where(MemberSlice("time", Seq(1995)))
      .execute().collect()
    val regions = rows.filter(_.isNullAt(1))
    val nations = rows.filterNot(_.isNullAt(1))
    assert(regions.nonEmpty && nations.nonEmpty)
    regions.foreach { r =>
      val total = nations.filter(_.getString(0) == r.getString(0))
        .map(_.getLong(2)).sum
      assert(r.getLong(2) == total)
    }
  }

  test("role filter composes with DrilldownMember expansion") {
    val rows = Query.from(cube.withRole(Role("emea",
        Seq("customer" -> Seq("EUROPE")))))
      .columns("count_order")
      .rows(DrilldownMember(LevelMembers("customer", "region"),
        Members("customer", Seq(Seq("EUROPE")))))
      .execute().collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getString(0) == "EUROPE"),
      rows.map(_.toString).mkString(", "))
  }

  test("windowed rank calc composes with a slicer") {
    val rows = Query.from(cube).columns("revenue", "rank_in_region")
      .rows(LevelMembers("customer", "nation"))
      .where(MemberSlice("time", Seq(1995)))
      .withMember(CalcMember("rank_in_region",
        WindowCalc("revenue", WinKind.RankDesc, "customer",
          Some("region"))))
      .execute().collect()
    // per region, ranks must be a 1..k permutation aligned to revenue
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getInt(3))
      assert(byRank.map(_.getInt(3)).toSeq == (1 to rs.length))
      val revs = byRank.map(_.getDecimal(2).doubleValue())
      assert(revs.sorted.reverse.toSeq == revs.toSeq)
    }
  }

  test("NON EMPTY composes with TopCount on a sliced axis") {
    val rows = Query.from(cube).columns("revenue")
      .rows(TopCount(LevelMembers("customer", "nation"), 5, "revenue"))
      .where(MemberSlice("part", Seq("Brand#11")))
      .nonempty()
      .execute().collect()
    assert(rows.length == 5)
  }
}
