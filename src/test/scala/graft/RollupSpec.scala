package graft

import graft.plans.RollupRewrite
import org.apache.spark.sql.functions._

/** Rollup-selection rule (SURVEY.md §4): the plan must actually retarget the
  * base-table aggregate onto the rollup parquet, and the answer must equal
  * the base aggregation.
  */
class RollupSpec extends SparkSpec {
  import TestSpark.spark.implicits._

  test("aggregate on base table is rewritten to scan the rollup") {
    val rollupPath = operators.Rollups.ensureRollup(spark, sf)
    RollupRewrite.install(spark)
    val df = run("rollup_rewrite")
    val leafCols = df.queryExecution.optimizedPlan.collectLeaves()
      .flatMap(_.output.map(_.name)).toSet
    assert(leafCols.contains("sum_qty") && leafCols.contains("cnt"),
      s"plan does not scan rollup (leaf cols: $leafCols; rollup at $rollupPath)")
    assert(!leafCols.contains("l_orderkey"), "plan still scans base table")
  }

  test("rollup answer equals base-table aggregation") {
    operators.Rollups.ensureRollup(spark, sf)
    RollupRewrite.install(spark)
    val viaRollup = run("rollup_rewrite").collect().toSeq
    // compute the same aggregate with the rule bypassed (different agg set
    // that the rollup can't serve -> avg forces base scan) as a sanity pair,
    // plus the direct base result computed before any rewrite could differ
    val base = Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag")
      .agg(
        round(sum($"l_quantity"), 2).as("sum_qty"),
        round(sum($"l_extendedprice"), 2).as("sum_price"),
        round(min($"l_quantity"), 2).as("min_qty"),
        round(max($"l_quantity"), 2).as("max_qty"),
        count(lit(1)).as("n"))
      .orderBy($"l_returnflag").collect().toSeq
    assert(viaRollup == base)
  }

  test("rule bails on shapes the rollup cannot serve (filter, avg, other keys)") {
    operators.Rollups.ensureRollup(spark, sf)
    RollupRewrite.install(spark)
    val filtered = Tables.lineitem(spark, sf)
      .filter($"l_quantity" > 10).groupBy($"l_returnflag")
      .agg(sum($"l_quantity"))
    val avg_ = Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag").agg(avg($"l_quantity"))
    val otherKey = Tables.lineitem(spark, sf)
      .groupBy($"l_suppkey").agg(sum($"l_quantity"))
    Seq(filtered, avg_, otherKey).foreach { df =>
      val leafCols = df.queryExecution.optimizedPlan.collectLeaves()
        .flatMap(_.output.map(_.name)).toSet
      assert(leafCols.contains("l_orderkey"), s"should scan base: $leafCols")
    }
  }
}
