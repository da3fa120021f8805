package graft

/** Dev-only profiling main (r21): where does a warm sql_ddl_* key's timed
  * run spend its time? Runs each selected key's build() once to stage the
  * lifecycle (exactly what Bench's warm-up does), then times N further
  * build()+count() passes while counting Spark jobs — separating
  * driver-side statement overhead (rewrites, view re-registration,
  * analysis) from executor work. Not part of any driver gate.
  */
object ProfileDdl {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val trace = sys.env.contains("PROFILE_TRACE")
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          if (trace) println(s"  JOB ${j.jobId}: " +
            j.stageInfos.map(_.details.linesIterator.find(l =>
              l.contains("graft") || l.contains("Dataset")).getOrElse("?"))
              .mkString(" | "))
        }
      })
    val keys = args.headOption.map(_.split(",").toSeq).getOrElse(
      SparkEntry.queries.keys.filter(_.startsWith("sql_ddl")).toSeq.sorted)
    // one JVM/codegen warm-up
    spark.range(1000000L).selectExpr("sum(id)").collect()
    keys.foreach { k =>
      val fn = SparkEntry.queries(k)
      fn(spark, sfDir).count() // stage (bench warm-up equivalent)
      val times = (1 to 3).map { _ =>
        val j0 = jobs.get
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(30)
        (sec, jobs.get - j0)
      }
      val med = times.map(_._1).sorted.apply(1)
      println(f"PROFILE $k%-32s med=${med}%6.3f s  jobs=${times.map(_._2).mkString(",")}  runs=${times.map(t => f"${t._1}%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
