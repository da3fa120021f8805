package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: the jaccard pair-table builders serve their consumers from a
  * localCheckpoint, so `graft.Explain` on the keys shows only the checkpoint
  * scan. This main prints the INTERIOR plans (the pre-checkpoint join
  * topology) — the evidence surface for the r20 sizes-join elimination.
  * Usage: runMain graft.ExplainDedup [sfDir]
  */
object ExplainDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("\n===== jaccard_oneshot_interior =====")
    operators.LlmDedup.jaccardPairsOneShot(spark, sfDir, 0.6)
      .explain("formatted")
    println("\n===== jaccard_prefix_interior =====")
    operators.LlmDedup.jaccardPairsPrefix(spark, sfDir, 0.6)
      .explain("formatted")
    spark.stop()
  }
}
