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

  test("group-by elimination hints round-trip and validate") {
    val hinted = cube.copy(dims = cube.dims.map(d =>
      if (d.name == "customer")
        d.copy(uniqueKeyLevel = Some("customer"),
          levels = d.levels.map(l =>
            if (l.name == "customer")
              l.copy(dependentProps = Set("c_mktsegment"))
            else l))
      else d))
    hinted.validate()
    val cd = hinted.dim("customer")
    assert(cd.uniqueKeyLevel === Some("customer"))
    assert(cd.level("customer").dependentProps === Set("c_mktsegment"))
    assert(cd.level("nation").dependentProps === Set.empty)
  }

  test("ragged hierarchy hides blank and parent-named members") {
    import spark.implicits._
    val geo = Seq(
      ("USA", "CA", "San Francisco"),
      ("USA", "CA", "Los Angeles"),
      ("Israel", "", "Tel Aviv"),          // no state level
      ("Vatican", "Vatican", "Vatican City") // state repeats country
    ).toDF("country", "state", "city")
    val fact = Seq(
      ("San Francisco", 10.0), ("Los Angeles", 5.0),
      ("Tel Aviv", 7.0), ("Vatican City", 2.0)
    ).toDF("city_fk", "amount")
    def cubeWith(hide: HideIf) = BoundCube("Geo", fact,
      dims = Seq(BoundDim("geo", foreignKey = "city_fk",
        primaryKey = "city",
        levels = Seq(
          BoundLevel("country", "country"),
          BoundLevel("state", "state", hideMemberIf = hide),
          BoundLevel("city", "city")),
        df = geo)),
      measures = Seq(Measure("amount", Agg.Sum, "amount")))

    // IfBlankName: Israel's empty state member is not enumerated
    val blankCube = cubeWith(HideIf.IfBlankName)
    val states = Query.from(blankCube).columns("amount")
      .rows(LevelMembers("geo", "state")).execute()
      .select("state").collect().map(_.getString(0)).toSet
    assert(states === Set("CA", "Vatican"))
    // descendants of a hidden member stay reachable at their own level
    val cities = Query.from(blankCube).columns("amount")
      .rows(LevelMembers("geo", "city")).execute()
      .select("city").collect().map(_.getString(0)).toSet
    assert(cities.contains("Tel Aviv"))
    // hidden rows still aggregate into their ancestors
    val countries = Query.from(blankCube).columns("amount")
      .rows(LevelMembers("geo", "country")).execute()
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(countries("Israel") === 7.0)

    // IfParentsName: Vatican's repeated state member is hidden
    val parentCube = cubeWith(HideIf.IfParentsName)
    val states2 = Query.from(parentCube).columns("amount")
      .rows(LevelMembers("geo", "state")).execute()
      .select("state").collect().map(_.getString(0)).toSet
    assert(states2 === Set("CA", ""))
  }

  test("captions, descriptions and annotations surface on elements") {
    val annotated = cube.copy(
      meta = ElementMeta(caption = Some("Sales Cube"),
        description = Some("TPC-H lineitem star"),
        annotations = Map("owner" -> "analytics")),
      measures = cube.measures.map(m =>
        if (m.name == "revenue")
          m.copy(meta = ElementMeta(caption = Some("Revenue ($)")))
        else m))
    assert(annotated.caption === "Sales Cube")
    assert(annotated.meta.annotations("owner") === "analytics")
    assert(annotated.measure("revenue").caption === "Revenue ($)")
    // defaults fall back to names
    assert(annotated.measure("sum_qty").caption === "sum_qty")
    assert(annotated.dim("customer").caption === "customer")
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

  test("a base-cube dim-calc member in a virtual-cube slicer expands " +
      "to its compound set on the conformed grain") {
    import graft.olap._
    val calc = CalcMember("EU13 and AS2", DimAggCalc("customer",
      Members("customer", Seq(Seq("EUROPE", "NATION_13"),
        Seq("ASIA", "NATION_2")))))
    val salesWithCalc = Cubes.sales(spark, Sf)
      .copy(calcMembers = Cubes.sales(spark, Sf).calcMembers :+ calc)
    val vc = new VirtualCube("SalesAndEvents", Seq(
      salesWithCalc -> Seq("revenue"),
      Cubes.events(spark, Sf) -> Seq("n_events")))
    def total(slicer: Seq[SlicerItem]): Any = {
      val df = vc.aggregate(Seq(("time", "year")), slicer)
      df.agg(org.apache.spark.sql.functions.sum("revenue")).collect()
        .head.get(0)
    }
    val viaCalc = total(
      Seq(MemberSlice("customer", Seq("EU13 and AS2"))))
    val viaUnion = total(Seq(SetSlice("customer",
      Seq(Seq("EUROPE", "NATION_13"), Seq("ASIA", "NATION_2")))))
    assert(viaCalc != null, "the calc member silently matched nothing")
    assert(viaCalc === viaUnion)
  }

  test("same-named dim-calc members on two base cubes: agreeing " +
      "definitions expand, disagreeing ones refuse loudly") {
    import graft.olap._
    def withCalc(set: Seq[Seq[String]]): BoundCube = {
      val base = Cubes.sales(spark, Sf)
      base.copy(calcMembers = base.calcMembers :+
        CalcMember("Picked", DimAggCalc("customer",
          Members("customer", set))))
    }
    val setA = Seq(Seq("EUROPE", "NATION_13"), Seq("ASIA", "NATION_2"))
    val setB = Seq(Seq("AMERICA", "NATION_1"))
    val slicer = Seq(MemberSlice("customer", Seq("Picked")))
    // agreement: both bases expand to the same compound set — executes
    val agreeing = new VirtualCube("TwoSales", Seq(
      withCalc(setA) -> Seq("revenue"),
      withCalc(setA).copy(name = "Sales2") -> Seq("sum_qty")))
    assert(agreeing.aggregate(Seq(("time", "year")), slicer)
      .collect().nonEmpty)
    // disagreement: silently using whichever base iterates first
    // would aggregate the wrong set — refuse loudly
    val clashing = new VirtualCube("TwoSales", Seq(
      withCalc(setA) -> Seq("revenue"),
      withCalc(setB).copy(name = "Sales2") -> Seq("sum_qty")))
    val e = intercept[IllegalArgumentException] {
      clashing.aggregate(Seq(("time", "year")), slicer).collect()
    }
    assert(e.getMessage.contains("expansions disagree"), e.getMessage)
  }

  test("virtual-cube drill-through sources the owning cube; foreign fields empty") {
    val vc = new VirtualCube("SalesAndEvents", Seq(
      Cubes.sales(spark, Sf) -> Seq("revenue"),
      Cubes.events(spark, Sf) -> Seq("n_events")))
    // revenue lives on Sales: details are lineitem rows; event_type
    // belongs only to the Events cube and must come back empty
    // (reference query_test.rb:1060-1098)
    val dt = vc.drillThrough("revenue",
      Seq(MemberSlice("customer", Seq("EUROPE"))),
      returnCols = Seq("l_orderkey", "l_quantity", "event_type"),
      maxRows = Some(20))
    val rows = dt.collect()
    assert(rows.length === 20)
    assert(dt.columns.toSeq === Seq("l_orderkey", "l_quantity", "event_type"))
    assert(rows.forall(_.isNullAt(2)),
      "fields of another base cube must be empty in drill-through")
    // unknown measure names fail with the reference's wording
    val e = intercept[IllegalArgumentException](
      vc.drillThrough("nope", Nil, Nil))
    assert(e.getMessage.contains("not found in virtual cube"))
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

  test("virtual cube resolves computed (EvalSlice) slicers; base " +
      "cubes lacking the dimension skip them") {
    val vc = new VirtualCube("SalesAndEvents", Seq(
      Cubes.sales(spark, Sf) -> Seq("revenue"),
      Cubes.events(spark, Sf) -> Seq("n_events")))
    // HEAD of the region members = a computed one-member slicer on a
    // dim only Sales shares — equal to the literal slicer on the
    // sales side, inert on the events side
    val literal = vc.aggregate(Seq(("time", "year")),
        Seq(MemberSlice("customer", Seq("AFRICA"))))
      .collect().map(r => r.get(0) -> (r.get(1), r.get(2))).toMap
    val computed = vc.aggregate(Seq(("time", "year")),
        Seq(EvalSlice(HeadSet(
          LevelMembers("customer", "region"), 1))))
      .collect().map(r => r.get(0) -> (r.get(1), r.get(2))).toMap
    assert(computed === literal)
    // drill-through with the computed slicer resolves too
    val dt = vc.drillThrough("revenue",
      Seq(EvalSlice(HeadSet(LevelMembers("customer", "region"), 1))),
      returnCols = Seq("l_orderkey"), maxRows = Some(5))
    assert(dt.count() === 5)
    // a computed set resolving in NO base cube fails loudly
    val e = intercept[IllegalArgumentException] {
      vc.aggregate(Seq(("time", "year")),
        Seq(EvalSlice(HeadSet(LevelMembers("no_such", "lvl"), 1))))
    }
    assert(e.getMessage.contains("no base cube"))
  }
}
