package graft

import org.apache.spark.sql.SparkSession

/** Dev harness mirroring the driver's t1 smoke gate: SparkEntry.entry must
  * return >0 rows on sf0.001.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = SparkEntry.entry(spark).count()
    println(s"SMOKE_ROWS=$n")
    spark.stop()
  }
}
