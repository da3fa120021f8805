package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: materialize and print one or more query keys' results.
  * Usage: runMain graft.ShowKeys <sfDir> <key> [key...]
  * Complements [[Explain]] (plans) during key development; the real gate
  * stays Verify + the DuckDB oracle.
  */
object ShowKeys {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val keys = if (args.length > 1) args.tail.toSeq else SparkEntry.defs.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    keys.foreach { k =>
      println(s"\n===== $k =====")
      val df = SparkEntry.defs(k).build(spark, sfDir)
      df.show(50, truncate = false)
    }
    spark.stop()
  }
}
