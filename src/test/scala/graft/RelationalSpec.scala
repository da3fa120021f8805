package graft

import org.apache.spark.sql.functions._

/** Per-operator specs for the relational surface (SURVEY.md §2.1–§2.7,
  * §2.10): one assertion batch per query key over sf0.001, checking invariant
  * properties (counts, algebraic identities) rather than golden values — the
  * exact-value gate is the driver's DuckDB oracle.
  */
class RelationalSpec extends SparkSpec {
  import TestSpark.spark.implicits._

  test("every declared query key runs and is deterministic across two runs") {
    // accumulate across ALL keys (a throw or mismatch on one key must not
    // mask later keys — round 2's stream_session regression hid behind the
    // first quantile failure), then assert once
    val failures = SparkEntry.defs.keys.toSeq.sorted.flatMap { k =>
      try {
        val a = run(k).collect()
        val b = run(k).collect()
        if (a.sameElements(b)) None else Some(s"$k: not deterministic")
      } catch {
        case e: Throwable => Some(s"$k: threw ${e.getClass.getSimpleName}: ${
          Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n", "\n", ""))
  }

  test("every oracled key has matching column names contract") {
    // oracleSql keys must be a subset of queries keys
    val qk = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qk))
  }

  test("scan_parquet pushes filters and prunes columns") {
    val plan = run("scan_parquet").queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_quantity"))
    assert(!plan.contains("l_extendedprice"), "column pruning failed")
  }

  test("scan_jdbc: partitioned external read with filter pushed to remote SQL") {
    val plan = run("scan_jdbc").queryExecution.executedPlan.toString
    assert(plan.contains("JDBCRelation(nation_jdbc) [numPartitions=4]"),
      s"expected a 4-way partitioned JDBC scan in:\n$plan")
    assert(plan.contains("PushedFilters") && plan.contains("LessThan(n_regionkey,3)"),
      s"filter not pushed into the external query:\n$plan")
  }

  test("q1_agg: group count bounded by returnflag x linestatus domain") {
    val rows = run("q1_agg").collect()
    assert(rows.nonEmpty && rows.length <= 9)
  }

  test("join semi + anti partition customers exactly") {
    val cust = Tables.customer(spark, sf).count()
    val urgent = Tables.orders(spark, sf).filter($"o_orderpriority".like("1-%"))
    val semi = Tables.customer(spark, sf)
      .join(urgent, $"c_custkey" === $"o_custkey", "left_semi").count()
    val anti = Tables.customer(spark, sf)
      .join(urgent, $"c_custkey" === $"o_custkey", "left_anti").count()
    assert(semi + anti == cust)
  }

  // join plan-shape contracts live in JoinsSpec (flagships, bucketed, DPP)

  test("sql_api_q3 pushes segment and both date filters into the scans") {
    val plan = run("sql_api_q3").queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(c_mktsegment,BUILDING)"), "segment filter not pushed")
    assert(plan.contains("LessThan(o_orderdate"), "orders date filter not pushed")
    assert(plan.contains("GreaterThan(l_shipdate"), "lineitem date filter not pushed")
  }

  test("llm_sample: hash filter applies before the stratum window shuffle") {
    val df = run("llm_sample")
    // structural invariant: no stratum exceeds the cap, and two runs agree
    // (the md5-hash sample is deterministic, unlike rand())
    val a = df.collect()
    assert(a.forall(_.getLong(2) <= 50), "stratum cap exceeded")
    assert(a.sameElements(run("llm_sample").collect()))
  }

  test("set ops algebra: |A| = |A∩B| + |A\\B|") {
    val o = Tables.orders(spark, sf)
    val a = o.filter($"o_orderstatus" === "F").select($"o_custkey").distinct()
    val b = o.filter($"o_totalprice" > 50000.0).select($"o_custkey").distinct()
    assert(a.intersect(b).count() + a.except(b).count() == a.count())
  }

  test("limit_offset pagination is a strict slice of the sorted stream") {
    val all = Tables.orders(spark, sf).orderBy($"o_orderkey")
      .select($"o_orderkey").as[Long].collect()
    val page = run("limit_offset").select($"o_orderkey").as[Long].collect()
    assert(page.sameElements(all.slice(50, 70)))
  }

  test("bag set ops: INTERSECT ALL = min(multiplicities), EXCEPT ALL = clamped diff") {
    // brute-force the multiplicity algebra per custkey and compare with the
    // operator keys' aggregated outputs
    val o = Tables.orders(spark, sf)
    val cnt = (p: org.apache.spark.sql.Column) => o.filter(p)
      .groupBy($"o_custkey").count().as[(Long, Long)].collect().toMap
    val f = cnt($"o_orderstatus" === "F")
    val op = cnt($"o_orderstatus" === "O")
    val big = cnt($"o_totalprice" > 100000.0)
    val expInter = f.keySet.intersect(op.keySet)
      .map(k => k -> math.min(f(k), op(k))).filter(_._2 > 0).toMap
    val expExcept = big.map { case (k, n) =>
      k -> math.max(0L, n - f.getOrElse(k, 0L)) }.filter(_._2 > 0)
    assert(run("set_intersect_all").as[(Long, Long)].collect().toMap == expInter)
    assert(run("set_except_all").as[(Long, Long)].collect().toMap == expExcept)
  }

  test("subq_lateral decorrelates to a rank-pushdown, never a nested-loop re-execution") {
    val plan = run("subq_lateral").queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"per-group LIMIT should plan as WindowGroupLimit (rank pushdown):\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"lateral must not fall back to a nested loop:\n$plan")
    // exactly the top-3 per segment, verified against a window spelling
    val rows = run("subq_lateral").collect()
    val segs = rows.map(_.getString(0)).distinct
    assert(rows.groupBy(_.getString(0)).values.forall(_.length <= 3))
    val expected = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), $"o_custkey" === $"c_custkey")
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"c_mktsegment")
          .orderBy($"o_totalprice".desc, $"o_orderkey")))
      .filter($"rk" <= 3).count()
    assert(rows.length == expected && segs.length >= 2)
  }

  test("sql_cte_recursive gap-fills the full fixed month range") {
    val rows = run("sql_cte_recursive").collect()
    assert(rows.length == 84, s"1995-01..2001-12 must yield 84 months, got ${rows.length}")
    // conservation: filled counts sum to the direct filtered count
    val direct = Tables.orders(spark, sf)
      .filter($"o_orderpriority".like("1-%")).count()
    assert(rows.map(_.getLong(1)).sum == direct)
    // months outside the data's span exist with zero counts (the gap-fill)
    assert(rows.exists(_.getLong(1) == 0L), "expected at least one gap month")
    val plan = run("sql_cte_recursive").queryExecution.executedPlan.toString
    assert(plan.contains("UnionLoop"), "recursion should plan as UnionLoop")
    assert(plan.contains("BroadcastHashJoin"),
      s"the 84-row recursion dim must broadcast, not shuffle:\n$plan")
  }

  test("load_transform is a single-pass map over the staged file — no pre-sort shuffle") {
    val plan = run("load_transform").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"load transform must not shuffle before the output sort:\n$plan")
    // reject-filter plus SET-derived columns match a direct computation
    val n = run("load_transform").count()
    val direct = Tables.orders(spark, sf)
      .filter($"o_totalprice" > 1000.0 && $"o_orderstatus".isin("F", "O")).count()
    assert(n == direct)
  }
}
