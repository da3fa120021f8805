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
}
