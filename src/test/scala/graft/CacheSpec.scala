package graft
// (AggGen-style recommendation specs live at the bottom of this file)

import org.apache.spark.sql.functions._
import graft.olap._

/** Segment-cache + aggregate-table routing specs (SURVEY §4 #5/#6). */
class CacheSpec extends SparkSpec {

  private lazy val cube = Cubes.sales(spark, Sf)

  test("repeated aggregates hit the segment cache") {
    val c = SegmentCache.global
    def run() = Query.from(cube).columns("revenue")
      .rows(LevelMembers("customer", "region")).execute().collect()
    val r1 = run()
    val hitsBefore = c.hits
    val r2 = run()
    assert(c.hits > hitsBefore, "second run must reuse the cached segment")
    assert(r1.toSeq === r2.toSeq)
  }

  test("region flush evicts intersecting segments, keeps disjoint ones") {
    val c = SegmentCache.global
    val cubeId = cube.cubeId
    // segment sliced to ASIA — disjoint from the EUROPE region
    Query.from(cube).columns("revenue")
      .rows(LevelMembers("part", "brand"))
      .where(MemberSlice("customer", Seq("ASIA"))).execute().collect()
    // unsliced segment — contains EUROPE cells
    Query.from(cube).columns("sum_qty")
      .rows(LevelMembers("part", "brand")).execute().collect()
    val sizeBefore = c.size
    c.flushRegion(cubeId, "customer", Seq("EUROPE"))
    assert(c.size < sizeBefore, "unsliced segment must flush")
    // the ASIA-sliced segment survives: re-running it hits the cache
    val hitsBefore = c.hits
    Query.from(cube).columns("revenue")
      .rows(LevelMembers("part", "brand"))
      .where(MemberSlice("customer", Seq("ASIA"))).execute().collect()
    assert(c.hits > hitsBefore, "disjoint-slicer segment must survive")
  }

  test("checkpointed grouping-sets segments release their executor " +
      "blocks on flush (getOrComputeCut lifecycle — the r16 eager cut " +
      "must not leak under churn)") {
    val c = SegmentCache.global
    val sc = spark.sparkContext
    def pids: Set[Int] = sc.getPersistentRDDs.keySet.toSet
    def run(): Unit = Pins.scoped {
      // mixed-depth set + value Order: joinCells routes through
      // mixedCells → getOrComputeCut (an eager localCheckpoint)
      Mdx.execute(
        """SELECT {[Measures].[revenue]} ON COLUMNS,
          |  ORDER({[customer].[EUROPE],
          |         [customer].[EUROPE].[NATION_13],
          |         [customer].[ASIA]},
          |        [Measures].[revenue], DESC) ON ROWS
          |FROM [Sales] WHERE ([time].[1996])""".stripMargin, cube)
        .collect()
    }
    run() // warm-up: builds the cube and persists its dim frames —
    // those long-lived RDDs must not count against the flush assert
    c.flushCube(cube.cubeId)
    val before = pids
    val missesBefore = c.misses
    run()
    assert(c.misses > missesBefore, "the mixed-set query must create " +
      "fresh segments")
    val added = pids -- before
    assert(added.nonEmpty, "checkpointed segments must hold " +
      "block-manager RDDs while cached (Pins.scoped released the " +
      "transient pins, so survivors are cache-held)")
    // a second identical query HITS (no new misses beyond warm-up)
    val missesWarm = c.misses
    run()
    assert(c.misses === missesWarm, "second run must serve every " +
      "segment from the cache")
    // region flush evicts the intersecting segments AND frees their
    // checkpoint blocks (evictFrame → Pins.freeCut on the LogicalRDD)
    c.flushRegion(cube.cubeId, "customer", Seq("EUROPE"))
    val survivors = pids intersect added
    assert(survivors.isEmpty, s"flushed checkpoint blocks must " +
      s"unpersist; still live: $survivors")
  }

  test("byte-budget LRU (r18): least-recently-HIT segments evict " +
      "first, the newest survives, unmaterialized segments cost " +
      "nothing, and eviction releases the blocks") {
    val sc = spark.sparkContext
    val c = new SegmentCache
    def storageBytes: Long =
      sc.getRDDStorageInfo.map(i => i.memSize + i.diskSize).sum
    def seg(n: Int): c.SegKey =
      c.SegKey(99L, Seq(s"seg$n"), Nil, Seq("m"))
    def insert(n: Int, rows: Long): Unit = {
      c.getOrCompute(seg(n))(
        spark.range(rows).toDF("m").repartition(2)).count()
      // a second consumer materializes the persisted buffers fully
      c.getOrCompute(seg(n))(fail("must hit")).count()
    }
    insert(1, 40000)
    insert(2, 40000)
    assert(c.residentBytes > 0, "materialized segments must be sized")
    val stBefore = storageBytes
    // hit 1 so 2 becomes least-recently-used
    c.getOrCompute(seg(1))(fail("must hit")).count()
    val total = c.residentBytes
    c.setByteBudget(total - 1)
    assert(c.size === 1 && c.evictions === 1,
      "one segment over budget must evict exactly one")
    assert(c.evictions === 1)
    // the survivor is the recently-hit seg1: re-reading it HITS
    val missesBefore = c.misses
    c.getOrCompute(seg(1))(fail("must hit")).count()
    assert(c.misses === missesBefore, "the recently-hit segment survives")
    // evicted blocks are released from the block manager
    assert(storageBytes < stBefore,
      "eviction must free the evicted segment's storage")
    // an UNMATERIALIZED insert occupies nothing: it neither counts
    // against the budget nor evicts the resident survivor
    c.setByteBudget(c.residentBytes + 1)
    val lazySeg = c.getOrCompute(seg(3))(spark.range(1000000).toDF("m"))
    assert(c.size === 2 && c.evictions === 1,
      "a lazy (unmaterialized) segment must not trigger eviction")
    // materialize it, then shrink the budget to one byte: everything
    // but the most recently used segment evicts (never the newest —
    // its consumer is about to read it)
    lazySeg.count()
    c.setByteBudget(1L)
    assert(c.size === 1, "budget=1 keeps only the newest segment")
    val keptMisses = c.misses
    c.getOrCompute(seg(3))(fail("newest must survive")).count()
    assert(c.misses === keptMisses)
    // CHECKPOINTED segments (getOrComputeCut) size from block-manager
    // storage and evict through Pins.freeCut: budget-evicting one
    // releases its LogicalRDD blocks
    c.setByteBudget(0L)
    c.getOrComputeCut(seg(10))(spark.range(30000).toDF("m"))
    assert(c.residentBytes > 0, "checkpointed segment must be sized")
    // make seg(10) the LRU loser, then shrink under the pair's size
    c.getOrComputeCut(seg(11))(spark.range(30000).toDF("m"))
    val stBoth = storageBytes
    c.setByteBudget(c.residentBytes - 1)
    // freeCut unpersists with blocking=false — poll for the release
    val deadline = System.currentTimeMillis + 10000
    while (storageBytes >= stBoth && System.currentTimeMillis < deadline)
      Thread.sleep(100)
    assert(storageBytes < stBoth,
      "budget eviction must free the checkpointed blocks")
    val ckptMisses = c.misses
    c.getOrComputeCut(seg(11))(fail("newest cut must survive"))
    assert(c.misses === ckptMisses)
    // the spark-conf knob resizes a live cache on the next miss
    spark.conf.set("spark.graft.segcache.maxBytes", "123456")
    try {
      c.getOrCompute(seg(4))(spark.range(10).toDF("m"))
      assert(c.byteBudget === 123456L)
    } finally spark.conf.unset("spark.graft.segcache.maxBytes")
    c.clear()
  }

  test("read lease (r19): a leased checkpointed segment is skipped by " +
      "budget eviction while pinned, evicts after the lease closes") {
    val c = new SegmentCache
    def seg(n: Int): c.SegKey =
      c.SegKey(98L, Seq(s"lease$n"), Nil, Seq("m"))
    c.setByteBudget(1L)
    var held: org.apache.spark.sql.DataFrame = null
    c.withLease {
      held = c.getOrComputeCut(seg(1))(spark.range(20000).toDF("m"))
      assert(c.pinCount(seg(1)) === 1)
      // misses under a 1-byte budget: each enforcement wants to evict
      // the LRU loser — the pinned seg(1) — and must SKIP it
      c.getOrComputeCut(seg(2))(spark.range(20000).toDF("m"))
      c.getOrComputeCut(seg(3))(spark.range(20000).toDF("m"))
      assert(c.pinnedSkips > 0, "enforcement must have skipped the pin")
      val missesBefore = c.misses
      c.getOrComputeCut(seg(1))(fail("pinned segment must be resident"))
      assert(c.misses === missesBefore)
      // the in-flight reader's job still sees the blocks
      assert(held.count() === 20000L)
    }
    assert(c.pinCount(seg(1)) === 0, "lease exit releases the pin")
    // with the pin gone the next enforcement may evict it
    c.getOrComputeCut(seg(4))(spark.range(20000).toDF("m"))
    val missesAfter = c.misses
    c.getOrComputeCut(seg(1))(spark.range(20000).toDF("m"))
    assert(c.misses === missesAfter + 1,
      "unpinned LRU segment evicts once the lease is closed")
    c.clear()
  }

  test("read lease (r19): a CONCURRENT evictor under a 1-byte budget " +
      "cannot fail a reader's in-flight stage on a checkpointed " +
      "segment (the SCALING.md lineage-free hazard)") {
    val c = new SegmentCache
    def seg(n: Int): c.SegKey =
      c.SegKey(97L, Seq(s"conc$n"), Nil, Seq("m"))
    c.setByteBudget(1L)
    val pinned = new java.util.concurrent.CountDownLatch(1)
    val evicted = new java.util.concurrent.CountDownLatch(1)
    @volatile var readerSum = -1L
    @volatile var readerErr: Option[Throwable] = None
    val reader = new Thread(() =>
      try c.withLease {
        val df = c.getOrComputeCut(seg(0))(
          spark.range(50000).toDF("m"))
        pinned.countDown()
        // wait until the evictor has run enforcement passes that would
        // have freed seg(0)'s blocks, THEN run the reading job
        assert(evicted.await(30, java.util.concurrent.TimeUnit.SECONDS))
        readerSum = df.agg(sum(col("m"))).collect().head.getLong(0)
      } catch { case t: Throwable => readerErr = Some(t) })
    reader.start()
    assert(pinned.await(30, java.util.concurrent.TimeUnit.SECONDS))
    // concurrent misses: every enforcement targets the LRU seg(0)
    (1 to 4).foreach(n =>
      c.getOrComputeCut(seg(n))(spark.range(1000).toDF("m")))
    assert(c.pinnedSkips > 0)
    evicted.countDown()
    reader.join(60000)
    assert(readerErr.isEmpty, s"reader stage failed: $readerErr")
    assert(readerSum === 50000L * 49999 / 2)
    c.clear()
  }

  test("budget conf (r19): a malformed spark.graft.segcache.maxBytes " +
      "is ignored, and an unchanged conf does not clobber an explicit " +
      "setByteBudget") {
    val c = new SegmentCache
    def seg(n: Int): c.SegKey =
      c.SegKey(96L, Seq(s"conf$n"), Nil, Seq("m"))
    spark.conf.set("spark.graft.segcache.maxBytes", "256k")
    try {
      // the malformed value must not fail the query path
      c.getOrCompute(seg(1))(spark.range(10).toDF("m")).count()
      assert(c.byteBudget === Long.MaxValue)
      // a VALID conf value applies on the next miss
      spark.conf.set("spark.graft.segcache.maxBytes", "65536")
      c.getOrCompute(seg(2))(spark.range(10).toDF("m")).count()
      assert(c.byteBudget === 65536L)
      // conf unchanged since last read: an explicit call wins
      c.setByteBudget(1234L)
      c.getOrCompute(seg(3))(spark.range(10).toDF("m")).count()
      assert(c.byteBudget === 1234L,
        "an unchanged conf must not re-apply over setByteBudget")
      // conf CHANGED: conf wins again
      spark.conf.set("spark.graft.segcache.maxBytes", "65537")
      c.getOrCompute(seg(4))(spark.range(10).toDF("m")).count()
      assert(c.byteBudget === 65537L)
    } finally spark.conf.unset("spark.graft.segcache.maxBytes")
    c.clear()
  }

  test("concurrent queries (r19): two threads against one BoundCube " +
      "with a tight segment budget match their serial results") {
    val c = SegmentCache.global
    def qa() = Query.from(cube).columns("revenue")
      .rows(LevelMembers("customer", "nation")).execute().collect()
      .map(_.toSeq).toSeq
    // mixed-depth literal set: exercises the CHECKPOINTED
    // (getOrComputeCut) segment kind under the budget
    def qb() = Query.from(cube).columns("revenue")
      .rows(Members("customer",
        Seq(Seq("ASIA"), Seq("ASIA", "NATION_2")))).execute().collect()
      .map(_.toSeq).toSeq
    val serialA = qa(); val serialB = qb()
    val budgetBefore = c.byteBudget
    c.setByteBudget(64 * 1024)
    try {
      @volatile var ra: Seq[Seq[Any]] = Nil
      @volatile var rb: Seq[Seq[Any]] = Nil
      @volatile var errs = List.empty[Throwable]
      def thread(body: => Unit) = new Thread(() =>
        try body catch { case t: Throwable =>
          errs.synchronized { errs = t :: errs } })
      (1 to 3).foreach { _ =>
        val ta = thread { c.withLease { ra = qa() } }
        val tb = thread { c.withLease { rb = qb() } }
        ta.start(); tb.start(); ta.join(120000); tb.join(120000)
        assert(errs.isEmpty, s"concurrent query failed: $errs")
        assert(ra === serialA, "thread A diverged from its serial run")
        assert(rb === serialB, "thread B diverged from its serial run")
      }
    } finally {
      c.setByteBudget(
        if (budgetBefore == Long.MaxValue) 0L else budgetBefore)
    }
  }

  test("executeResult (r19) self-leases: concurrent cell-set queries " +
      "under a tight budget need no explicit withLease") {
    val c = SegmentCache.global
    def flat(r: Result): Seq[Seq[Any]] =
      r.rowAxis.zip(r.values()).map { case (ax, vs) => ax ++ vs }
    def qa() = flat(Query.from(cube).columns("revenue")
      .rows(LevelMembers("customer", "nation")).executeResult())
    // mixed-depth literal set: the CHECKPOINTED segment kind
    def qb() = flat(Query.from(cube).columns("revenue")
      .rows(Members("customer",
        Seq(Seq("ASIA"), Seq("ASIA", "NATION_2")))).executeResult())
    val serialA = qa(); val serialB = qb()
    val budgetBefore = c.byteBudget
    c.setByteBudget(64 * 1024)
    try {
      @volatile var ra: Seq[Seq[Any]] = Nil
      @volatile var rb: Seq[Seq[Any]] = Nil
      @volatile var errs = List.empty[Throwable]
      def thread(body: => Unit) = new Thread(() =>
        try body catch { case t: Throwable =>
          errs.synchronized { errs = t :: errs } })
      // no withLease here: the serving call scopes its own
      val ta = thread { ra = qa() }
      val tb = thread { rb = qb() }
      ta.start(); tb.start(); ta.join(120000); tb.join(120000)
      assert(errs.isEmpty, s"concurrent executeResult failed: $errs")
      assert(ra === serialA)
      assert(rb === serialB)
    } finally {
      c.setByteBudget(
        if (budgetBefore == Long.MaxValue) 0L else budgetBefore)
    }
  }

  test("agg router answers a coarser query from a registered rollup") {
    val base = Cubes.sales(spark, Sf)
    val at = new Planner(base).buildAggTable("nation_month",
      Seq(("customer", "nation"), ("time", "month")),
      Seq("revenue", "sum_qty", "count_order"))
    val routed = base.withAggTables(at)
    AggRouter.lastHit = None
    val viaAgg = Query.from(routed).columns("revenue", "sum_qty")
      .rows(LevelMembers("customer", "region"))
      .where(MemberSlice("time", Seq(1995)))
      .execute().collect()
    assert(AggRouter.lastHit === Some("nation_month"),
      "query must be answered from the rollup, not the fact")
    SegmentCache.enabled = false
    val direct = try Query.from(base).columns("revenue", "sum_qty")
      .rows(LevelMembers("customer", "region"))
      .where(MemberSlice("time", Seq(1995)))
      .execute().collect()
    finally SegmentCache.enabled = true
    assert(viaAgg.toSeq === direct.toSeq)
  }

  test("agg router serves the FUSED dim-calc axis: the explode keys " +
      "work on rollup level columns and the group merges partials") {
    val base = Cubes.sales(spark, Sf)
    val at = new Planner(base).buildAggTable("nation_year",
      Seq(("customer", "nation"), ("time", "year")),
      Seq("revenue", "sum_qty"))
    val routed = base.withAggTables(at)
    def q(c: BoundCube) = Mdx.execute(
      """WITH MEMBER [customer].[EU13 and AS2] AS
        |  'Aggregate({[customer].[EUROPE].[NATION_13],
        |              [customer].[ASIA].[NATION_2]})'
        |SELECT {[Measures].[revenue], [Measures].[sum_qty]} ON COLUMNS,
        |  CROSSJOIN({[customer].[AMERICA], [customer].[EU13 and AS2]},
        |            {[time].[1995], [time].[1996]}) ON ROWS
        |FROM [Sales]""".stripMargin, c).collect()
    AggRouter.lastHit = None
    val viaAgg = q(routed)
    assert(AggRouter.lastHit === Some("nation_year"),
      "the fused axis must be served from the rollup, not the fact")
    val direct = q(base)
    assert(viaAgg.toSeq === direct.toSeq)
  }

  test("declared AggPattern matches physical rollups, applies excludes, and routes") {
    val base = Cubes.sales(spark, Sf)
    // simulate PRE-EXISTING physical rollup tables (an external build
    // pipeline's output, physical column names unknown to the cube):
    // content at the nation x month grain, then parquet under three
    // names — one real hit, one AggExclude'd, one non-matching
    val content = new Planner(base).buildAggTable("tmp",
        Seq(("customer", "nation"), ("time", "month")),
        Seq("revenue", "sum_qty", "count_order")).df
      .withColumnRenamed("cr_region", "cust_region")
      .withColumnRenamed("cr_nation", "cust_nation")
      .withColumnRenamed("d_year", "t_year")
      .withColumnRenamed("d_yq", "t_quarter")
      .withColumnRenamed("d_ym", "t_month")
      .withColumnRenamed("revenue", "rev_sum")
      .withColumnRenamed("sum_qty", "qty_sum")
      .withColumnRenamed("count_order", "fact_count")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_aggdir").toString
    for (t <- Seq("agg_nm_sales", "agg_c_14_sales", "other_table"))
      content.write.mode("overwrite").parquet(s"$dir/$t")
    val decl = AggDecl(
      pattern = Some("agg_.*_sales"),
      levels = Seq(
        AggLevelMap("customer", "region", "cust_region"),
        AggLevelMap("customer", "nation", "cust_nation"),
        AggLevelMap("time", "year", "t_year"),
        AggLevelMap("time", "quarter", "t_quarter"),
        AggLevelMap("time", "month", "t_month")),
      measures = Seq(
        AggMeasureMap("revenue", "rev_sum"),
        AggMeasureMap("sum_qty", "qty_sum")),
      factCount = Some("fact_count"),
      excludes = Seq(AggExcludeRule("agg_c_14_sales")))
    val physical = AggMatcher.physicalFromDir(spark, dir)
    assert(physical.keySet === Set("agg_nm_sales", "agg_c_14_sales",
      "other_table"))
    val matched = AggMatcher.matchTables(base, Seq(decl), physical)
    assert(matched.map(_.name) === Seq("agg_nm_sales"),
      "pattern must match, excludes must reject, non-matches must drop")
    // the declared (never programmatically built) table answers the
    // q_aggroute-shaped query identically to the fact path
    val routed = AggMatcher.register(base, Seq(decl), physical)
    AggRouter.lastHit = None
    val viaDecl = Query.from(routed).columns("revenue", "sum_qty")
      .rows(LevelMembers("customer", "region"))
      .where(MemberSlice("time", Seq(1995)))
      .execute().collect()
    assert(AggRouter.lastHit === Some("agg_nm_sales"))
    SegmentCache.enabled = false
    val direct = try Query.from(base).columns("revenue", "sum_qty")
      .rows(LevelMembers("customer", "region"))
      .where(MemberSlice("time", Seq(1995)))
      .execute().collect()
    finally SegmentCache.enabled = true
    assert(viaDecl.toSeq === direct.toSeq)
  }

  test("AggName exact match binds a single declared table") {
    val base = Cubes.sales(spark, Sf)
    val content = new Planner(base).buildAggTable("tmp2",
        Seq(("customer", "nation")), Seq("revenue")).df
      .withColumnRenamed("cr_region", "r").withColumnRenamed("cr_nation", "n")
      .withColumnRenamed("revenue", "rev")
    val decl = AggDecl(name = Some("agg_exact"),
      levels = Seq(AggLevelMap("customer", "region", "r"),
        AggLevelMap("customer", "nation", "n")),
      measures = Seq(AggMeasureMap("revenue", "rev")))
    val matched = AggMatcher.matchTables(base, Seq(decl),
      Map("agg_exact" -> content, "agg_other" -> content))
    assert(matched.map(_.name) === Seq("agg_exact"))
    assert(matched.head.grain === Seq("customer" -> 1))
  }

  test("AggForeignKey joins the dimension into a declared rollup") {
    val base = Cubes.sales(spark, Sf)
    // an FK-style physical rollup: customer collapsed to levels, but
    // time kept only the fact's date key — no time level columns
    val content = new Planner(base).buildAggTable("tmpfk",
        Seq(("customer", "nation"), ("time", "day")),
        Seq("revenue", "sum_qty")).df
      .withColumnRenamed("cr_region", "cust_region")
      .withColumnRenamed("cr_nation", "cust_nation")
      .withColumnRenamed("d_date", "date_key")
      .drop("d_year", "d_yq", "d_ym")
      .withColumnRenamed("revenue", "rev_sum")
      .withColumnRenamed("sum_qty", "qty_sum")
    val decl = AggDecl(name = Some("agg_fk"),
      levels = Seq(AggLevelMap("customer", "region", "cust_region"),
        AggLevelMap("customer", "nation", "cust_nation")),
      measures = Seq(AggMeasureMap("revenue", "rev_sum"),
        AggMeasureMap("sum_qty", "qty_sum")),
      foreignKeys = Seq(AggFkMap("l_datekey", "date_key")))
    val routed = AggMatcher.register(base, Seq(decl),
      Map("agg_fk" -> content))
    AggRouter.lastHit = None
    val viaFk = Query.from(routed).columns("revenue", "sum_qty")
      .rows(LevelMembers("customer", "region"))
      .where(MemberSlice("time", Seq(1995)))
      .execute().collect()
    assert(AggRouter.lastHit === Some("agg_fk"),
      "the FK-joined rollup must cover every time level")
    SegmentCache.enabled = false
    val direct = try Query.from(base).columns("revenue", "sum_qty")
      .rows(LevelMembers("customer", "region"))
      .where(MemberSlice("time", Seq(1995)))
      .execute().collect()
    finally SegmentCache.enabled = true
    assert(viaFk.toSeq === direct.toSeq)
    // an FK column the fact doesn't join on is rejected eagerly
    val bad = decl.copy(name = Some("agg_bad"),
      foreignKeys = Seq(AggFkMap("l_nope", "date_key")))
    val e = intercept[IllegalArgumentException] {
      AggMatcher.matchTables(base, Seq(bad), Map("agg_bad" -> content))
    }
    assert(e.getMessage.contains("l_nope"))
    // a dimension declared BOTH as collapsed AggLevel columns and as an
    // AggForeignKey is contradictory — rejected, not silently joined
    val both = decl.copy(name = Some("agg_both"),
      levels = decl.levels :+ AggLevelMap("time", "year", "date_key"),
      foreignKeys = Seq(AggFkMap("l_datekey", "date_key")))
    val e2 = intercept[IllegalArgumentException] {
      AggMatcher.matchTables(base, Seq(both), Map("agg_both" -> content))
    }
    assert(e2.getMessage.contains("declared both"))
  }

  test("declared mappings validate eagerly: missing columns and level gaps") {
    val base = Cubes.sales(spark, Sf)
    val content = new Planner(base).buildAggTable("tmp3",
        Seq(("customer", "nation")), Seq("revenue")).df
    // a declared physical column absent from the table
    val badCol = AggDecl(name = Some("t"),
      levels = Seq(AggLevelMap("customer", "region", "cr_region"),
        AggLevelMap("customer", "nation", "nope")),
      measures = Seq(AggMeasureMap("revenue", "revenue")))
    val e1 = intercept[IllegalArgumentException] {
      AggMatcher.matchTables(base, Seq(badCol), Map("t" -> content))
    }
    assert(e1.getMessage.contains("nope"))
    // nation mapped without its region prefix level
    val gap = AggDecl(name = Some("t"),
      levels = Seq(AggLevelMap("customer", "nation", "cr_nation")),
      measures = Seq(AggMeasureMap("revenue", "revenue")))
    val e2 = intercept[IllegalArgumentException] {
      AggMatcher.matchTables(base, Seq(gap), Map("t" -> content))
    }
    assert(e2.getMessage.contains("missing level mappings"))
  }

  test("non-decomposable measures fall through to the fact") {
    val base = Cubes.sales(spark, Sf)
    val at = new Planner(base).buildAggTable("nation_only",
      Seq(("customer", "nation")), Seq("revenue"))
    val routed = base.withAggTables(at)
    AggRouter.lastHit = None
    // n_orders is distinct-count — never routable
    Query.from(routed).columns("n_orders")
      .rows(LevelMembers("customer", "nation")).execute().collect()
    assert(AggRouter.lastHit === None)
  }

  test("deeper-than-rollup grain falls through to the fact") {
    val base = Cubes.sales(spark, Sf)
    val at = new Planner(base).buildAggTable("region_only",
      Seq(("customer", "region")), Seq("revenue"))
    val routed = base.withAggTables(at)
    AggRouter.lastHit = None
    Query.from(routed).columns("revenue")
      .rows(LevelMembers("customer", "customer")).execute().collect()
    assert(AggRouter.lastHit === None)
  }

  test("AggGen-style recommendation merges coverable grains") {
    val base = Cubes.sales(spark, Sf)
    // workload: three grains whose union (nation x month x returnflag)
    // is small — one merged rollup should cover all
    val workload = Seq(
      Map("customer" -> 1),                      // nation
      Map("customer" -> 1, "time" -> 2),         // nation x month
      Map("time" -> 2, "returnflag" -> 0))       // month x returnflag
    val rec = AggRouter.recommend(base, workload, maxRows = 100000)
    assert(rec.length === 1, s"expected one merged grain, got $rec")
    assert(rec.head === Map("customer" -> 1, "time" -> 2,
      "returnflag" -> 0))
    // a tiny budget forbids merging — each grain stands alone
    val rec2 = AggRouter.recommend(base, workload, maxRows = 30)
    assert(rec2.toSet === workload.toSet)
    // built rollups actually serve the workload queries
    val routed = AggRouter.buildRecommended(base, workload, 100000)
    AggRouter.lastHit = None
    Query.from(routed).columns("revenue")
      .rows(LevelMembers("customer", "nation")).execute().collect()
    assert(AggRouter.lastHit === Some("agg_rec_0"))
  }
}
