package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scoped measurement harness for the bitmap-scalar UDF-vs-native question
  * (r12 verdict task 7): the bitmap AGGREGATES are already native
  * TypedImperativeAggregates (the shuffle hot loop), but the SCALAR ops
  * (count/and/or/contains) are UDFs over serialized bytes. Both spellings
  * pay the same deserialize(); this harness measures whether the UDF's
  * encoder wrapper adds enough on a realistic shape to justify native
  * Expressions (rule of record: land natives if the delta clears 20%).
  *
  * Shape: per-(user, event_type) bitmaps from the sf dir's events —
  * realistic audience-analytics bitmap sizes — replicated ×REP to give the
  * scalar stage enough rows to time, then sum(bitmap_count(bm)) per
  * spelling, interleaved A/B over ITERS rounds (interleaving cancels JIT /
  * cache warm-up drift). Prints one JSON line; the conclusion lands in
  * BASELINE.md.
  */
object BitmapBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    graft.functions.NativeAggregates.register(spark)
    graft.functions.BitmapFunctions.registerNativeCount(spark)
    val B = graft.functions.BitmapFunctions

    // one bitmap per (user, event_type), replicated to a timing-sized table
    val rep = 64
    val bms = Tables.events(spark, sfDir)
      .groupBy($"user_id", $"event_type")
      .agg(B.bitmap_union($"event_id").as("bm"))
      .crossJoin(spark.range(rep.toLong).select($"id".as("r")))
      .localCheckpoint(true)
    val nRows = bms.count()

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val iters = 7
    var udfS = 0.0; var natS = 0.0
    var udfSum = 0L; var natSum = 0L
    // warm-up once each (codegen compile + JIT), then interleave
    bms.agg(sum(B.bitmap_count($"bm"))).as[Long].head()
    bms.agg(sum(B.bitmap_count_native($"bm"))).as[Long].head()
    for (_ <- 1 to iters) {
      udfS += time { udfSum = bms.agg(sum(B.bitmap_count($"bm"))).as[Long].head() }
      natS += time { natSum = bms.agg(sum(B.bitmap_count_native($"bm"))).as[Long].head() }
    }
    require(udfSum == natSum, s"spellings disagree: $udfSum vs $natSum")

    // the binary scalar path (and+count fused) — UDF only, for context on
    // where the time actually goes (deserialize dominates)
    val pairs = bms.as("a").join(bms.as("b"),
        $"a.user_id" === $"b.user_id" && $"a.r" === $"b.r" &&
          $"a.event_type" < $"b.event_type")
      .select($"a.bm".as("x"), $"b.bm".as("y"))
      .localCheckpoint(true)
    val andS = time {
      pairs.agg(sum(B.bitmap_count(B.bitmap_and($"x", $"y")))).as[Long].head()
    }

    println(s"""{"metric":"bitmap_scalar_udf_vs_native","rows":$nRows,""" +
      s""""iters":$iters,"udf_count_sec":${udfS / iters},""" +
      s""""native_count_sec":${natS / iters},""" +
      s""""native_over_udf":${natS / udfS},""" +
      s""""and_count_udf_sec":$andS,"sf_dir":"$sfDir"}""")
    spark.stop()
  }
}
