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
