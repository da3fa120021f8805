package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: print the formatted physical plan for one or more query keys.
  * Usage: runMain graft.Explain <sfDir> <key> [key...]   (no keys = all)
  * The performance loop is: make it correct, then `.explain("formatted")`
  * until the plan is the one you'd want at 100 TB (broadcasts where expected,
  * filters pushed into the scan, wide WholeStageCodegen spans).
  */
object Explain {
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
      SparkEntry.defs(k).build(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
