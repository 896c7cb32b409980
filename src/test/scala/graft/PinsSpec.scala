package graft

import org.apache.spark.sql.functions._
import graft.olap.{Ords, Pins}
import graft.ops.{CleanPipeline, DedupOps}

/** Lifecycle specs for the pinned-persist registry (VERDICT r6 #1/#7):
  * a long query sequence must hold storage occupancy to ONE query's
  * working set, and release must never corrupt the multi-consumer
  * range-partitioned frames the pins protect (ADVICE r6 medium).
  */
class PinsSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, Sf, "documents")

  private def persistedCount: Int =
    spark.sparkContext.getPersistentRDDs.size

  test("a 20-query dedup sequence keeps storage bounded at the baseline") {
    // warm one scoped run first so lazily-built session caches (cubes,
    // registered functions) don't count against the pin accounting
    Pins.scoped { DedupOps.jaccardPairs(docs, 0.5).count() }
    val baseline = persistedCount
    for (i <- 1 to 20) {
      Pins.scoped {
        i % 4 match {
          case 0 => DedupOps.jaccardPairs(docs, 0.5).count()
          case 1 => DedupOps.minhashLsh(docs, 4, 2, 0.5).count()
          // 3 = the 4-band pigeonhole recall bound (larger now throws)
          case 2 => DedupOps.simhashPairs(docs, 3).count()
          case _ => CleanPipeline.clean(docs).count()
        }
      }
      // every pin the query created must be gone at the scope boundary:
      // occupancy is per-query, not session-age-proportional (the r6
      // official bench grew ~30 resident frames by q_pipeline_curate)
      assert(persistedCount <= baseline,
        s"iteration $i leaked persisted frames: $persistedCount > $baseline")
    }
  }

  test("global fallback stays FIFO-bounded when no scope is open") {
    Pins.releaseAll()
    val baseline = persistedCount
    // 40 unscoped pins of distinct tiny frames: the registry must cap
    // resident entries (excess evicts oldest, which pin() materialized)
    for (i <- 1 to 40)
      Pins.pin(spark.range(i, i + 10L).toDF("n").persist())
    assert(persistedCount <= baseline + 32,
      s"unscoped pins exceeded the cap: $persistedCount vs baseline $baseline")
    Pins.releaseAll()
    assert(persistedCount <= baseline)
  }

  test("scoped release never corrupts distributed numbering (consumers ran)") {
    // force the two-phase range-partitioned path: its offsets join is
    // the multi-consumer shape whose premature unpersist resamples
    // range bounds (the wrong-__ord hazard the scope contract prevents)
    val n = 5000
    val df = spark.range(n.toLong).toDF("id")
      .withColumn("key", expr("cast(md5(cast(id as string)) as string)"))
    for (_ <- 1 to 3) {
      val rows = Pins.scoped {
        Ords.rowNumber(df, Seq(col("key")), "ord", Ords.Large)
          .select("ord").collect().map(_.getInt(0)).sorted
      }
      assert(rows.toSeq === (1 to n), "numbering must be a 1..n permutation")
    }
  }

  test("scopes nest: inner frames release at inner exit, outer at outer") {
    Pins.releaseAll()
    val baseline = persistedCount
    Pins.scoped {
      val outer = Pins.pin(spark.range(100L).toDF("n").persist())
      outer.count()
      Pins.scoped {
        val inner = Pins.pin(spark.range(200L).toDF("m").persist())
        inner.count()
        assert(persistedCount >= baseline + 2)
      }
      // inner released, outer still resident
      assert(persistedCount == baseline + 1)
    }
    assert(persistedCount == baseline)
  }
}
