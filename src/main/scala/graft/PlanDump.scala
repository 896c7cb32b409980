package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Optimization-round measurement aid (guide §1.1/§7.2): writes
  * `.explain("formatted")` for every SparkEntry query to a directory so
  * plan shapes (Exchange count, join strategy, PushedFilters/ReadSchema,
  * WholeStageCodegen spans) can be swept offline. Read-only: builds each
  * DataFrame but executes nothing.
  *
  * Usage: sbt "runMain graft.PlanDump <outDir> [q_a,q_b,...]"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/plans")
    val only: Set[String] =
      if (args.length > 1) args(1).split(",").map(_.trim).toSet else Set.empty
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only(n))
    names.foreach { name =>
      try graft.olap.Pins.scoped {
        graft.olap.SegmentCache.global.withLease {
          val df = SparkEntry.queries(name)(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.write(Paths.get(outDir, s"$name.txt"),
            plan.getBytes("UTF-8"))
        }
      } catch {
        case t: Throwable =>
          Files.write(Paths.get(outDir, s"$name.ERR.txt"),
            (t.getClass.getName + ": " + t.getMessage).getBytes("UTF-8"))
      }
    }
    spark.stop()
  }
}
