package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling entry — not part of the driver contract. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    // warmup
    SparkEntry.queries("q1_agg")(spark, sfDir).collect()
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); stages.addAndGet(j.stageInfos.size)
        }
      })
    val name = args.headOption.getOrElse("q_children")
    sys.env.get("SCRATCH_CONF").foreach { kvs =>
      kvs.split(";").foreach { kv =>
        val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
      }
    }
    if (name == "sweep") {
      import org.apache.spark.sql.functions._
      for (parts <- Seq("8", "32", "128");
           mpb <- Seq("16m", "128m")) {
        val s2 = spark.newSession()
        s2.conf.set("spark.sql.shuffle.partitions", parts)
        s2.conf.set("spark.sql.files.maxPartitionBytes", mpb)
        val li = s2.read.parquet(s"$sfDir/lineitem.parquet")
        val o = s2.read.parquet(s"$sfDir/orders.parquet")
        val c = s2.read.parquet(s"$sfDir/customer.parquet")
        def q = li.join(broadcast(o), li("l_orderkey") === o("o_orderkey"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .groupBy("c_nationkey")
          .agg(sum(expr("cast(l_extendedprice*(1-l_discount)" +
            " as decimal(38,10))")).as("rev"))
        q.collect() // warm
        val t0 = System.nanoTime(); q.collect()
        println(f"parts=$parts%-4s mpb=$mpb%-5s " +
          f"${(System.nanoTime() - t0) / 1e9}%5.2f s")
      }
      spark.stop(); return
    }
    if (name == "factagg") {
      import org.apache.spark.sql.functions._
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val o = spark.read.parquet(s"$sfDir/orders.parquet")
      val c = spark.read.parquet(s"$sfDir/customer.parquet")
      val n = spark.read.parquet(s"$sfDir/nation.parquet")
      def q = li.join(broadcast(o),
          li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy("n_name")
        .agg(sum(expr("cast(l_quantity as decimal(38,10))")).as("sq"),
          sum(expr("cast(l_extendedprice*(1-l_discount) as decimal(38,10))"))
            .as("rev"))
      time("factagg run1")(q.collect())
      time("factagg run2")(q.collect())
      time("factagg run3")(q.collect())
      def liOnly = li.groupBy("l_returnflag")
        .agg(sum(expr("cast(l_quantity as decimal(38,10))")).as("sq"))
      time("li-only dec")(liOnly.collect())
      time("li-only dec2")(liOnly.collect())
      def liDbl = li.groupBy("l_returnflag")
        .agg(sum(expr("cast(l_quantity as double)")).as("sq"))
      time("li-only dbl")(liDbl.collect())
      time("li-only dbl2")(liDbl.collect())
      def joinOnly = li.join(broadcast(o),
          li("l_orderkey") === o("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)))
      time("join-only 1")(joinOnly.collect())
      time("join-only 2")(joinOnly.collect())
      spark.stop(); return
    }
    var df = SparkEntry.queries(name)(spark, sfDir)
    time(s"$name build") { df = SparkEntry.queries(name)(spark, sfDir) }
    time(s"$name plan")(df.queryExecution.executedPlan)
    time(s"$name run1")(df.collect())
    println(s"jobs=${jobs.get} stages=${stages.get}")
    time(s"$name run2")(SparkEntry.queries(name)(spark, sfDir).collect())
    args.drop(1).foreach { other =>
      time(s"$other")(SparkEntry.queries(other)(spark, sfDir).collect())
    }
    println(df.queryExecution.executedPlan.toString
      .linesIterator.filter(l => l.contains("Join") || l.contains("Exchange") ||
        l.contains("Scan") || l.contains("Aggregate"))
      .map(_.take(120)).mkString("\n"))
    spark.stop()
  }
}
