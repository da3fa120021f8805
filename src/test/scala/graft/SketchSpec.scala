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

  test("window_funnel modes: brute-force reference + ordering invariants") {
    // independent references: exhaustive subsequence search for default /
    // increase; per-anchor scan simulation (the semantic definition) for
    // deduplication / fixed
    import scala.math.Ordering.Implicits._
    def refDefault(evs: Seq[(Long, Int)], win: Long, increase: Boolean): Int = {
      val ev = evs.sorted
      var best = if (ev.exists(_._2 == 1)) 1 else 0
      for {
        (t1, s1) <- ev if s1 == 1
        (t2, s2) <- ev if s2 == 2 && t2 <= t1 + win &&
          (if (increase) t2 > t1 else (t2, s2) > (t1, s1))
      } {
        best = math.max(best, 2)
        for ((t3, s3) <- ev
             if s3 == 3 && t3 <= t1 + win &&
               (if (increase) t3 > t2 else (t3, s3) > (t2, s2)))
          best = math.max(best, 3)
      }
      best
    }
    def refScan(evs: Seq[(Long, Int)], win: Long, fixedMode: Boolean): Int = {
      val ev = evs.sorted
      var best = 0
      for (i <- ev.indices if ev(i)._2 == 1) {
        var lvl = 1; var broken = false
        for (j <- i + 1 until ev.length
             if !broken && ev(j)._1 <= ev(i)._1 + win && lvl < 3) {
          val st = ev(j)._2
          if (st == lvl + 1) lvl += 1
          else if (fixedMode || (st >= 1 && st <= lvl)) broken = true
        }
        best = math.max(best, lvl)
      }
      best
    }
    (0 until 15).foreach { seed =>
      val rnd = new scala.util.Random(500 + seed)
      val evs = Seq.fill(25)((rnd.nextLong(300L), rnd.nextInt(3) + 1))
      val df = evs.toDF("ts", "step")
      val Seq(d, dd, fx, inc) = Seq("default", "deduplication", "fixed", "increase")
        .map(m => df.agg(ESA.window_funnel(100L, 3, m)($"ts", $"step")).as[Int].head())
      assert(d == refDefault(evs, 100L, increase = false), s"default seed=$seed")
      assert(inc == refDefault(evs, 100L, increase = true), s"increase seed=$seed")
      assert(dd == refScan(evs, 100L, fixedMode = false), s"dedup seed=$seed")
      assert(fx == refScan(evs, 100L, fixedMode = true), s"fixed seed=$seed")
      assert(fx <= dd && dd <= d && inc <= d, s"ordering seed=$seed: $fx $dd $d $inc")
    }
  }

  test("topn counter: heavy hitter survives capacity pressure with bounded overcount") {
    import graft.functions.{NativeAggregates => NA}
    NA.register(spark)
    // 100× value 7 + 20 singletons, capacity 4 -> SpaceSaving admits
    // newcomers at the eviction floor, so 7's count may overestimate but the
    // true heavy hitter must rank first and stay within count + floor
    val rows = (Seq.fill(100)(7L) ++ (100L until 120L)).zipWithIndex
      .map { case (v, i) => (i % 8, v) } // interleave across 8 partitions' worth
    val out = rows.toDF("p", "v").repartition(8, $"p")
      .agg(NA.topn_counter($"v", 1, 4).as("top")).as[String].head()
    val Array(value, count) = out.split(":").map(_.toLong)
    assert(value == 7L, s"heavy hitter lost: $out")
    assert(count >= 100L && count <= 125L, s"count out of bound: $out")
  }

  test("sequence_count aggregator == greedy non-overlap brute force") {
    (0 until 20).foreach { seed =>
      val rnd = new scala.util.Random(900 + seed)
      val evs = Seq.fill(30)((rnd.nextLong(500L), rnd.nextInt(2) + 1))
      val got = evs.toDF("ts", "step")
        .agg(ESA.sequence_count(2)($"ts", $"step")).as[Long].head()
      var want = 1; var n = 0L
      evs.sorted.foreach { case (_, st) =>
        if (st == want) { if (want == 2) { n += 1; want = 1 } else want = 2 }
      }
      assert(got == n, s"seed=$seed evs=$evs")
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
