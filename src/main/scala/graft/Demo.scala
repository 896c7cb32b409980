package graft

import org.apache.spark.sql.SparkSession
import graft.olap._

/** Smoke CLI: runs the flagship entry query + metadata API + an error-path
  * probe against sf0.001. `sbt "runMain graft.Demo"`.
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    println("== flagship entry() ==")
    SparkEntry.entry(spark).show(false)

    val cube = Cubes.sales(spark, "/root/testdata/sf0.001")
    val meta = new CubeMetadata(cube)
    println(s"dims=${meta.dimensionNames}")
    println(s"customer levels=${meta.levelNames("customer")}")
    println(s"nation members count=${meta.membersCount("customer", "nation")}")
    println(s"member [EUROPE].[NATION_13] exists=" +
      meta.memberExists("customer", Seq("EUROPE", "NATION_13")))
    println(s"member [EUROPE].[NATION_99] exists=" +
      meta.memberExists("customer", Seq("EUROPE", "NATION_99")))

    println("== error probe: unknown level ==")
    try {
      Query.from(cube).columns("revenue")
        .rows(LevelMembers("customer", "galaxy")).execute()
      println("ERROR: no exception thrown")
    } catch {
      case e: IllegalArgumentException => println(s"ok: ${e.getMessage}")
    }

    println("== error probe: unknown dimension ==")
    try {
      Query.from(cube).columns("revenue")
        .rows(LevelMembers("warehouse", "bin")).execute()
      println("ERROR: no exception thrown")
    } catch {
      case e: IllegalArgumentException => println(s"ok: ${e.getMessage}")
    }

    println("== explain: flagship plan ==")
    SparkEntry.entry(spark).explain("formatted")
    spark.stop()
  }
}
