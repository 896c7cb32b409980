package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks

import graft.ops.{CurationOps, RetrievalOps, TimeOps}

/** Property tests for the temporal/retrieval/curation wave: the as-of
  * join and rolling features are checked against a driver-side
  * brute-force computation on seeded random event logs (including
  * exact-timestamp ties and keys with no right rows); BM25 and
  * temperature sampling against hand-computable invariants on skewed
  * synthetic corpora (the parquet fixture's sources are uniform, so the
  * oracle alone never exercises the tempered-rate branch).
  */
class TimeOpsSpec extends SparkSpec with TableDrivenPropertyChecks {

  private def mkEvents(seed: Long, n: Int, users: Int, dupTsEvery: Int) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      // coarse second-grain timestamps force plenty of exact ties
      val base = 1700000000L + rnd.nextInt(600)
      val ts = if (dupTsEvery > 0 && i % dupTsEvery == 0) 1700000100L
        else base
      (i.toLong, rnd.nextInt(users).toLong,
        new Timestamp(ts * 1000L),
        if (rnd.nextBoolean()) "purchase" else "click",
        math.round(rnd.nextDouble() * 100) / 10.0)
    }
  }

  test("asOfJoin matches driver-side brute force (ties included)") {
    import spark.implicits._
    for (seed <- 1L to 4L) {
      val rows = mkEvents(seed, 400, 7, 5)
      val df = rows.toDF("event_id", "user_id", "ts", "event_type", "value")
      val left = df.filter($"event_type" === "purchase")
        .select("event_id", "user_id", "ts")
      val right = df.filter($"event_type" === "click")
      val got = TimeOps.asOfJoin(left, right, "user_id", "ts",
          "event_id", Seq("value"))
        .select("event_id", "asof_ts", "asof_value")
        .collect().map(r => r.getLong(0) ->
          ((Option(r.getTimestamp(1)), Option(r.get(2))))).toMap

      val clicks = rows.filter(_._4 == "click")
      for ((eid, uid, ts, _, _) <- rows.filter(_._4 == "purchase")) {
        val prior = clicks.filter(c => c._2 == uid && !c._3.after(ts))
        val expect = if (prior.isEmpty) (None, None) else {
          val maxTs = prior.map(_._3.getTime).max
          // latest timestamp, highest event_id wins the tie
          val winner = prior.filter(_._3.getTime == maxTs).maxBy(_._1)
          (Some(new Timestamp(maxTs)), Some(winner._5))
        }
        assert(got(eid) === (expect._1, expect._2),
          s"seed=$seed purchase=$eid")
      }
    }
  }

  test("rollingFeatures matches driver-side brute force") {
    import spark.implicits._
    val rows = mkEvents(9L, 300, 5, 7)
    val df = rows.toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = TimeOps.rollingFeatures(df, "user_id", "ts", "event_id",
        "value", lookback = 5)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(3)), r.getLong(4), Option(r.get(5)))).toMap

    rows.groupBy(_._2).foreach { case (_, evs) =>
      val ordered = evs.sortBy(e => (e._3.getTime, e._1))
      ordered.zipWithIndex.foreach { case (e, i) =>
        val trail = ordered.slice(math.max(0, i - 5), i)
        val gap = if (i == 0) None
          else Some((e._3.getTime - ordered(i - 1)._3.getTime) * 1000L)
        val sum = if (trail.isEmpty) None
          else Some(BigDecimal(trail.map(x => BigDecimal(x._5)).sum
            .toDouble))
        val (gGap, gN, gSum) = got(e._1)
        assert(gGap === gap && gN === trail.size.toLong, s"event ${e._1}")
        assert(gSum.map(x => BigDecimal(x.toString.toDouble)) === sum,
          s"event ${e._1}")
      }
    }
  }

  test("bm25 ranks an exact-match doc above a diluted one") {
    import spark.implicits._
    // doc 0: pure query terms; doc 1: terms diluted 1:9; doc 2: none
    val docs = Seq(
      (0L, "s", "alpha beta alpha beta"),
      (1L, "s", ("alpha beta " + "filler " * 18).trim),
      (2L, "s", "gamma delta gamma"),
      (3L, "s", "alpha gamma filler filler"))
      .toDF("doc_id", "source", "text")
    val out = RetrievalOps.bm25(docs, Seq(0 -> Seq("alpha", "beta")),
      topK = 10).orderBy("rank").collect()
    assert(out.map(_.getLong(2)).take(2).toSeq === Seq(0L, 1L))
    // doc 2 shares no term — must not appear at all
    assert(!out.map(_.getLong(2)).contains(2L))
    // scores strictly positive and non-increasing in rank
    val scores = out.map(_.getDouble(3))
    assert(scores.forall(_ > 0) && scores.sameElements(scores.sorted.reverse))
  }

  test("asOfJoin carries the matched row's NULL payload through") {
    import spark.implicits._
    // user 1: click(t=100, v=5.0), click(t=200, v=NULL); purchase t=300
    // must see (200, NULL) — not 5.0 stitched from the older row
    val right = Seq((1L, 1L, new Timestamp(100000L), Some(5.0)),
      (2L, 1L, new Timestamp(200000L), None))
      .toDF("event_id", "user_id", "ts", "value")
    val left = Seq((10L, 1L, new Timestamp(300000L)))
      .toDF("event_id", "user_id", "ts")
    val r = graft.ops.TimeOps.asOfJoin(left, right, "user_id", "ts",
      "event_id", Seq("value")).collect()
    assert(r.length === 1)
    assert(r(0).getAs[Timestamp]("asof_ts") === new Timestamp(200000L))
    assert(r(0).get(r(0).fieldIndex("asof_value")) === null,
      s"matched row's NULL payload must survive: ${r(0)}")
  }

  test("latestWins tieCheck: duplicate ties fail fast, unique ties pass") {
    import spark.implicits._
    // two right rows share (user_id=1, ts=100) AND event_id=7 — the
    // torn-row hazard the latestWins contract bans: per-payload
    // max_by(p, tie) could take v from one tied row and w from the
    // other. With spark.graft.asof.tieCheck=true the collapse must
    // refuse instead of emitting a row that never existed.
    val dupTie = Seq(
        (7L, 1L, new Timestamp(100000L), 5.0, "a"),
        (7L, 1L, new Timestamp(100000L), 9.0, "b"))
      .toDF("event_id", "user_id", "ts", "v", "w")
    val left = Seq((10L, 1L, new Timestamp(300000L)))
      .toDF("event_id", "user_id", "ts")
    spark.conf.set("spark.graft.asof.tieCheck", "true")
    try {
      val err = intercept[IllegalArgumentException] {
        TimeOps.asOfJoin(left, dupTie, "user_id", "ts", "event_id",
          Seq("v", "w")).collect()
      }
      assert(err.getMessage.contains("duplicate event_id"))
      // unique ties pass the check and collapse to the max-tie row's
      // WHOLE payload (both columns from event_id=8)
      val uniqTie = Seq(
          (7L, 1L, new Timestamp(100000L), 5.0, "a"),
          (8L, 1L, new Timestamp(100000L), 9.0, "b"))
        .toDF("event_id", "user_id", "ts", "v", "w")
      val r = TimeOps.asOfJoin(left, uniqTie, "user_id", "ts",
        "event_id", Seq("v", "w")).collect()
      assert(r.length === 1)
      assert(r(0).getAs[Double]("asof_v") === 9.0 &&
        r(0).getAs[String]("asof_w") === "b",
        s"collapse must keep the max-tie row atomically: ${r(0)}")
    } finally spark.conf.unset("spark.graft.asof.tieCheck")
  }

  test("asOfJoin: NULL join keys never match (both lowerings agree)") {
    import spark.implicits._
    // a NULL-key click and a NULL-key purchase: SQL ASOF (and the
    // bucketized equi-join lowering) never match NULL keys, so the
    // window lowering must not pair them either
    val right = Seq(
        (1L, Some(1L), new Timestamp(100000L), 5.0),
        (2L, None, new Timestamp(100000L), 7.0))
      .toDF("event_id", "user_id", "ts", "value")
    val left = Seq(
        (10L, Some(1L), new Timestamp(300000L)),
        (11L, None, new Timestamp(300000L)))
      .toDF("event_id", "user_id", "ts")
    val got = TimeOps.asOfJoin(left, right, "user_id", "ts",
        "event_id", Seq("value"))
      .collect().map(r => r.getLong(0) -> Option(r.get(
        r.fieldIndex("asof_value")))).toMap
    assert(got(10L) === Some(5.0))
    assert(got(11L) === None,
      "NULL-key left row must not match the NULL-key right row")
  }

  test("bm25ScoreWith fails loudly past the decimal(20,18) bound") {
    import spark.implicits._
    val docs = Seq((0L, "alpha beta")).toDF("doc_id", "text")
    // a corpus size that pushes idf·(k1+1) past the decimal headroom:
    // the overflow-to-NULL would silently DROP scored documents, so
    // the scorer must refuse up front
    val huge = RetrievalOps.Bm25Stats(1L << 60, 10.0, Map("alpha" -> 1L))
    val err = intercept[IllegalArgumentException] {
      RetrievalOps.bm25ScoreWith(docs, Seq((0, Seq("alpha"))), huge)
    }
    assert(err.getMessage.contains("decimal(20,18)"))
    // and the documented-safe regime still scores
    val ok = RetrievalOps.bm25ScoreWith(docs, Seq((0, Seq("alpha"))),
      RetrievalOps.Bm25Stats(1000L, 10.0, Map("alpha" -> 10L)))
    assert(ok.count() === 1)
  }

  test("asOfJoinTolerance nulls ts AND payload together") {
    import spark.implicits._
    val rows = mkEvents(3L, 400, 7, 5)
    val df = rows.toDF("event_id", "user_id", "ts", "event_type", "value")
    val left = df.filter($"event_type" === "purchase")
      .select("event_id", "user_id", "ts")
    val right = df.filter($"event_type" === "click")
    val tolUs = 60L * 1000000
    val got = graft.ops.TimeOps.asOfJoinTolerance(left, right, "user_id",
        "ts", "event_id", Seq("value"), tolUs).collect()
    // never one of (asof_ts, asof_value) null without the other, and
    // every surviving match is within tolerance
    got.foreach { r =>
      val ts = r.getAs[Timestamp]("ts")
      val aTs = Option(r.getAs[Timestamp]("asof_ts"))
      val aV = Option(r.get(r.fieldIndex("asof_value")))
      assert(aTs.isDefined === aV.isDefined, s"partial null in $r")
      aTs.foreach { a =>
        assert((ts.getTime - a.getTime) * 1000L <= tolUs, s"stale $r") }
    }
    // and it equals the untolerated join with stale matches nulled
    val base = graft.ops.TimeOps.asOfJoin(left, right, "user_id", "ts",
        "event_id", Seq("value")).collect()
      .map(r => r.getLong(0) -> Option(r.getAs[Timestamp]("asof_ts"))
        .filter(a => (r.getAs[Timestamp]("ts").getTime - a.getTime) *
          1000L <= tolUs)).toMap
    got.foreach { r =>
      assert(Option(r.getAs[Timestamp]("asof_ts")) ===
        base(r.getLong(0)), s"row $r") }
  }

  test("asOfJoinBucketed (the stream lowering) == asOfJoinTolerance") {
    import spark.implicits._
    for (seed <- 5L to 7L) {
      val rows = mkEvents(seed, 400, 7, 5)
      val df = rows.toDF("event_id", "user_id", "ts", "event_type",
        "value")
      val left = df.filter($"event_type" === "purchase")
        .select("event_id", "user_id", "ts")
      val right = df.filter($"event_type" === "click")
      val tolUs = 120L * 1000000
      def key(r: org.apache.spark.sql.Row) = r.getLong(0) ->
        ((Option(r.getAs[Timestamp]("asof_ts")),
          Option(r.get(r.fieldIndex("asof_value")))))
      val batch = graft.ops.TimeOps.asOfJoinTolerance(left, right,
        "user_id", "ts", "event_id", Seq("value"), tolUs)
        .collect().map(key).toMap
      val intervals = graft.ops.TimeOps.asOfStateIntervals(right,
        "user_id", "ts", "event_id", Seq("value"), tolUs)
      val bucketed = graft.ops.TimeOps.asOfJoinBucketed(left, intervals,
        "user_id", "ts", Seq("value"), bucketUs = 45L * 1000000)
        .collect().map(key).toMap
      assert(bucketed === batch, s"seed=$seed")
    }
  }

  test("rangeJoin matches brute force and never nested-loops") {
    import spark.implicits._
    val rows = mkEvents(11L, 500, 6, 4)
    val df = rows.toDF("event_id", "user_id", "ts", "event_type", "value")
    val probe = df.filter($"event_type" === "click")
      .select("event_id", "user_id", "ts")
    val winLenUs = 90L * 1000000 // 1.5 buckets of 60s: spans 2-3 buckets
    val wins = df.filter($"event_type" === "purchase")
      .select(col("event_id").as("win_id"), col("user_id"),
        col("ts").as("t_start"),
        (col("ts") + expr("INTERVAL 90 SECONDS")).as("t_end"))
    val joined = graft.ops.TimeOps.rangeJoin(probe, wins, "user_id",
      "ts", "t_start", "t_end", bucketUs = 60L * 1000000)
    val p = joined.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("Cartesian"),
      s"range join must stay an equi-join:\n$p")
    val got = joined.select("event_id", "win_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val clicks = rows.filter(_._4 == "click")
    val purch = rows.filter(_._4 == "purchase")
    val expect = (for {
      c <- clicks; w <- purch
      if c._2 == w._2
      if c._3.getTime >= w._3.getTime &&
        c._3.getTime < w._3.getTime + winLenUs / 1000
    } yield (c._1, w._1)).toSet
    assert(got === expect)
    assert(expect.nonEmpty, "fixture produced no pairs — widen windows")
  }

  test("evalNgramOverlap fractions match a driver-side computation") {
    import spark.implicits._
    val rnd = new scala.util.Random(21L)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    def mkDoc(n: Int) =
      Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val docs = (0 until 60).map(i => (i.toLong, s"s$i", mkDoc(20)))
      .toDF("doc_id", "source", "text")
    val train = docs.filter($"doc_id" >= 20)
    val ev = docs.filter($"doc_id" < 20)
    val w = 4
    val got = graft.ops.DedupOps.evalNgramOverlap(train, ev, w)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    def grams(t: String) =
      t.split("\\s+").sliding(w).map(_.mkString(" ")).toSet
    val trainSet = docs.filter($"doc_id" >= 20).collect()
      .flatMap(r => grams(r.getString(2).toLowerCase)).toSet
    for (r <- ev.collect()) {
      val g = grams(r.getString(2).toLowerCase)
      val hit = g.count(trainSet)
      val (gn, gh, gf) = got(r.getLong(0))
      assert(gn === g.size.toLong && gh === hit.toLong,
        s"doc ${r.getLong(0)}")
      assert(gf === hit.toDouble / g.size)
    }
    // an eval doc shorter than the span width must still REPORT (zero
    // grams, NULL fraction) — silently dropping it would bias every
    // downstream "fraction of eval docs over threshold" denominator
    val withShort = ev.union(
      Seq((999L, "s999", "too short")).toDF("doc_id", "source", "text"))
    val short = graft.ops.DedupOps.evalNgramOverlap(train, withShort, w)
      .filter($"doc_id" === 999L).collect()
    assert(short.length === 1)
    assert(short(0).getLong(1) === 0L && short(0).getLong(2) === 0L)
    assert(short(0).isNullAt(3), "overlap_frac must be NULL, not 0/0")
    // the r19 bloom prefilter is exact at ANY false-positive rate: a
    // deliberately saturated 64-bit filter (every probe positive) must
    // reproduce the default-sized result row-for-row — FPs only
    // survive to the equi-join and match nothing
    val saturated = graft.ops.DedupOps
      .evalNgramOverlap(train, ev, w, bloomBits = 64L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    for ((id, (gn, gh, _)) <- got)
      assert(saturated(id) === ((gn, gh)), s"doc $id under saturated bloom")
  }

  test("bm25ScoreWith literal-model scorer == the shuffled aggregation") {
    val docs = Tables.load(spark, Sf, "documents")
    val workload = graft.queries.FeatureQueries.BM25_QUERIES
    val stats = RetrievalOps.bm25Train(docs, workload)
    val mapSide = RetrievalOps.bm25ScoreWith(docs, workload, stats)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    val shuffled = RetrievalOps.bm25(docs, workload, topK = Int.MaxValue)
      .collect().map(r => (r.getInt(0), r.getLong(2)) -> r.getDouble(3))
      .toMap
    assert(mapSide === shuffled) // bit-for-bit, not approximate
  }

  test("temperatureSample flattens a skewed source distribution") {
    import spark.implicits._
    // head source 640 docs, tail 10: alpha=0.5 boosts the tail's keep
    // rate to 1.0 (clamped) while the head keeps ~sqrt-proportionally
    val docs = ((0 until 640).map(i => (i.toLong, "head")) ++
      (640 until 650).map(i => (i.toLong, "tail")))
      .map { case (id, s) => (id, s, s"doc $id") }
      .toDF("doc_id", "source", "text")
    val kept = CurationOps.temperatureSample(docs, alpha = 0.5,
      targetFrac = 0.5).groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // tail rate clamps to 1.0: every tail doc survives
    assert(kept("tail") === 10L)
    // head keep rate = 0.5*650*(sqrt(640)/(sqrt(640)+sqrt(10)))/640
    val pHead = math.sqrt(640) / (math.sqrt(640) + math.sqrt(10))
    val expectHead = 0.5 * 650 * pHead / 640
    assert(math.abs(kept("head").toDouble / 640 - expectHead) < 0.08,
      s"head keep ${kept("head")} vs rate $expectHead")
    // determinism: the same call returns the identical survivor set
    val again = CurationOps.temperatureSample(docs, 0.5, 0.5)
      .agg(count(lit(1)), sum("doc_id")).head()
    val first = CurationOps.temperatureSample(docs, 0.5, 0.5)
      .agg(count(lit(1)), sum("doc_id")).head()
    assert(again === first)
  }
}
