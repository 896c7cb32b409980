package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Optimization-round measurement aid (guide §1.1): counts Spark jobs,
  * stages, tasks and shuffle bytes per query — the "how many passes /
  * how many blocking actions" view explain() cannot give.
  *
  * Usage: sbt "runMain graft.JobProbe q_a,q_b [passes]"
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(",").toSeq)
      .getOrElse(Seq("q1_agg"))
    val passes = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger; val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val shufW = new AtomicLong; val shufR = new AtomicLong
    // GRAFT_STAGE_DETAIL=1: per-stage lines (id, wall, shuffle bytes,
    // first plan-node line of the stage name) — the stage-level
    // attribution VERDICT r19 item 3 asks for (which stage carries the
    // bytes / the wall, not just the per-query total).
    val detail = sys.env.get("GRAFT_STAGE_DETAIL").contains("1")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(
          s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
        val w = s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
        val r = s.stageInfo.taskMetrics.shuffleReadMetrics.remoteBytesRead +
          s.stageInfo.taskMetrics.shuffleReadMetrics.localBytesRead
        shufW.addAndGet(w)
        shufR.addAndGet(r)
        if (detail) {
          val wall = (for {
            a <- s.stageInfo.completionTime
            b <- s.stageInfo.submissionTime
          } yield (a - b) / 1000.0).getOrElse(-1.0)
          val nm = s.stageInfo.name.takeWhile(_ != '\n').take(70)
          println(f"    stage ${s.stageInfo.stageId}%4d ${wall}%7.3f s " +
            f"tasks=${s.stageInfo.numTasks}%4d shufW=${w / 1024}%8d KiB " +
            f"shufR=${r / 1024}%8d KiB  $nm")
        }
      }
    })
    def force(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()
    for (pass <- 1 to passes; name <- names) {
      jobs.set(0); stages.set(0); tasks.set(0); shufW.set(0); shufR.set(0)
      val t0 = System.nanoTime()
      try graft.olap.Pins.scoped {
        graft.olap.SegmentCache.global.withLease {
          force(SparkEntry.queries(name)(spark, sfDir))
        }
      } catch { case t: Throwable => println(s"$name ERR $t") }
      Thread.sleep(300) // let the async listener bus drain
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"pass$pass $name%-28s ${sec}%7.3f s  jobs=${jobs.get}%3d " +
        f"stages=${stages.get}%3d tasks=${tasks.get}%5d " +
        f"shufW=${shufW.get / 1024}%8d KiB shufR=${shufR.get / 1024}%8d KiB")
    }
    spark.stop()
  }
}
