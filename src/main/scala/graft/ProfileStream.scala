package graft

/** Dev-only profiling main (r21): decompose stream_dedup_index's wall into
  * its 3-trigger ingest lifecycle (per-batch durations from the streaming
  * progress events) and the three batch-side verification steps (candidate
  * equality, index equality, truth-pair recall). Not part of any driver
  * gate.
  */
object ProfileStream {
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
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryTerminated(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
          val p = e.progress
          println(f"  BATCH ${p.batchId}%2d rows=${p.numInputRows}%6d " +
            f"total=${Option(p.durationMs.get("triggerExecution")).map(_.toLong).getOrElse(-1L)}%5d ms " +
            f"(addBatch=${Option(p.durationMs.get("addBatch")).map(_.toLong).getOrElse(-1L)}, " +
            f"latestOffset=${Option(p.durationMs.get("latestOffset")).map(_.toLong).getOrElse(-1L)}, " +
            f"queryPlanning=${Option(p.durationMs.get("queryPlanning")).map(_.toLong).getOrElse(-1L)})")
        }
      })
    // JVM/codegen warm-up
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def timed[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"PHASE $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.3f s")
      r
    }
    val key = args.headOption.getOrElse("stream_dedup_index")
    timed(s"$key full build+count") {
      SparkEntry.queries(key)(spark, sfDir).count()
    }
    // warm second run: ingest is session-cached, so this isolates the
    // batch-side verification cost
    timed(s"$key warm (verify only)") {
      SparkEntry.queries(key)(spark, sfDir).count()
    }
    spark.stop()
  }
}
