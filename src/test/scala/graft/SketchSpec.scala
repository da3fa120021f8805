package graft

import graft.functions.{BitmapFunctions => BF, EventSeqAggregators => ESA}
import org.apache.spark.sql.functions._
import org.roaringbitmap.longlong.Roaring64NavigableMap

/** Sketch-layer correctness (SURVEY.md §2.4 / M4): bitmap exactness,
  * funnel/sequence brute-force equivalence (seeded property sampling), HLL
  * error bound.
  */
class SketchSpec extends SparkSpec {
  import TestSpark.spark.implicits._

  test("bitmap union count == exact count distinct (events users)") {
    val got = run("agg_bitmap_distinct").as[(String, Long)].collect().toMap
    val exact = Tables.events(spark, sf).groupBy($"event_type")
      .agg(countDistinct($"user_id")).as[(String, Long)].collect().toMap
    assert(got == exact)
  }

  test("bitmap serialize/deserialize round-trips 64-bit values") {
    val m = new Roaring64NavigableMap()
    Seq(0L, 1L, 42L, Int.MaxValue.toLong + 7, Long.MaxValue - 1).foreach(m.addLong)
    val back = BF.deserialize(BF.serialize(m))
    assert(back.toArray.toSeq == m.toArray.toSeq)
  }

  test("hll estimate within 5% of exact on lineitem partkeys") {
    val r = Tables.lineitem(spark, sf)
      .agg(approx_count_distinct($"l_partkey").as("est"),
        countDistinct($"l_partkey").as("exact"))
      .as[(Long, Long)].head()
    assert(math.abs(r._1 - r._2).toDouble / r._2 < 0.05, s"$r")
  }

  // brute force oracle for the funnel semantics documented in EventSeqAggregators
  private def bruteFunnel(ev: Seq[(Long, Int)], window: Long, n: Int): Int = {
    val sorted = ev.sortBy(identity)
    var best = 0
    for (i <- sorted.indices if sorted(i)._2 == 1) {
      var lvl = 1
      for (j <- i + 1 until sorted.length
           if sorted(j)._1 <= sorted(i)._1 + window && lvl < n)
        if (sorted(j)._2 == lvl + 1) lvl += 1
      best = math.max(best, lvl)
    }
    best
  }

  test("window_funnel aggregator == brute force on random event sets") {
    (0 until 20).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val evs = Seq.fill(40)((rnd.nextLong(1000L), rnd.nextInt(3) + 1))
      val got = evs.toDF("ts", "step")
        .agg(ESA.window_funnel(100L, 3)($"ts", $"step")).as[Int].head()
      assert(got == bruteFunnel(evs, 100L, 3), s"seed=$seed evs=$evs")
    }
  }

  test("sequence_match aggregator == subsequence existence brute force") {
    (0 until 20).foreach { seed =>
      val rnd = new scala.util.Random(100 + seed)
      val evs = Seq.fill(30)((rnd.nextLong(500L), rnd.nextInt(2) + 1))
      val got = evs.toDF("ts", "step")
        .agg(ESA.sequence_match(2)($"ts", $"step")).as[Boolean].head()
      val sorted = evs.sortBy(identity)
      var want = 1
      sorted.foreach { case (_, s) => if (s == want && want <= 2) want += 1 }
      assert(got == (want > 2), s"seed=$seed")
    }
  }

  test("percentile_approx within 2% relative error of exact percentile") {
    val joined = run("agg_percentile_approx").as[(String, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val exact = Tables.lineitem(spark, sf).groupBy($"l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.5)"), expr("percentile(l_extendedprice, 0.95)"))
      .as[(String, Double, Double)].collect()
    exact.foreach { case (flag, e50, e95) =>
      val (a50, a95) = joined(flag)
      assert(math.abs(a50 - e50) / e50 < 0.02, s"$flag p50 $a50 vs $e50")
      assert(math.abs(a95 - e95) / e95 < 0.02, s"$flag p95 $a95 vs $e95")
    }
  }

  test("streaming funnel histogram equals batch funnel histogram") {
    val a = run("agg_window_funnel").as[(Int, Long)].collect().sorted.toSeq
    val b = run("stream_funnel").as[(Int, Long)].collect().sorted.toSeq
    assert(a == b)
  }
}
