package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.SparkSession

/** Subquery shapes (SURVEY.md §2.10). Doris rewrites these in the FE
  * ([doris: fe/.../rewrite/StmtRewriter.java]) to joins + AssertNumRows
  * ([doris: be/src/vec/exec/vassert_num_rows_node.cpp]); Catalyst performs the
  * same decorrelation (RewriteCorrelatedScalarSubquery, RewritePredicateSubquery)
  * so we declare the subquery and let the optimizer plan the join.
  *
  * Expressed via spark.sql over registered views — the declarative SQL is
  * identical on the oracle side, and Catalyst's decorrelated plan is the one
  * that scales (a correlated scalar subquery becomes one aggregate + one join,
  * never a per-row re-execution).
  */
object Subqueries {

  private def withViews(s: SparkSession, dir: String, sql: String) = {
    Tables.registerAll(s, dir)
    s.sql(sql)
  }

  def queries: Map[String, QueryDef] = Map(
    // Uncorrelated + correlated scalar subquery in one shape:
    // orders above the global average that also beat their customer average.
    "subq_scalar" -> QueryDef(
      (s, dir) => withViews(s, dir,
        """SELECT o_orderkey, round(o_totalprice, 2) AS totalprice
          |FROM orders o
          |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
          |  AND o_totalprice > (SELECT 1.5 * avg(o2.o_totalprice) FROM orders o2
          |                      WHERE o2.o_custkey = o.o_custkey)
          |ORDER BY o_orderkey""".stripMargin),
      """SELECT o_orderkey, round(o_totalprice, 2) AS totalprice
        |FROM orders o
        |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        |  AND o_totalprice > (SELECT 1.5 * avg(o2.o_totalprice) FROM orders o2
        |                      WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin),

    // IN subquery + correlated EXISTS -> semi joins after decorrelation.
    "subq_in_exists" -> QueryDef(
      (s, dir) => withViews(s, dir,
        """SELECT c_custkey, c_mktsegment
          |FROM customer c
          |WHERE c_nationkey IN (SELECT n_nationkey FROM nation
          |                      WHERE n_regionkey IN (0, 1))
          |  AND EXISTS (SELECT 1 FROM orders o
          |              WHERE o.o_custkey = c.c_custkey
          |                AND o.o_totalprice > 100000.0)
          |ORDER BY c_custkey""".stripMargin),
      """SELECT c_custkey, c_mktsegment
        |FROM customer c
        |WHERE c_nationkey IN (SELECT n_nationkey FROM nation
        |                      WHERE n_regionkey IN (0, 1))
        |  AND EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 100000.0)
        |ORDER BY c_custkey""".stripMargin),

    // Correlated LATERAL subquery with ORDER BY + LIMIT — top-k-per-group
    // as a join shape (Doris lateral view / MySQL 8 LATERAL,
    // [doris: fe/.../analysis/LateralViewRef.java] for the lateral surface).
    // The hard part is the planner's: Catalyst decorrelates the per-group
    // TopN into a DomainJoin + rank filter instead of re-running the inner
    // query per outer row, so at 100 TB this is one shuffle on the group
    // key + a bounded per-group sort, never nested-loop re-execution.
    // o_orderkey is unique (probed on every SF), so the (price DESC,
    // orderkey) tiebreak makes the LIMIT-3 slice deterministic.
    "subq_lateral" -> QueryDef(
      (s, dir) => withViews(s, dir,
        """SELECT c.c_mktsegment, t.o_orderkey, round(t.o_totalprice, 2) AS totalprice
          |FROM (SELECT DISTINCT c_mktsegment FROM customer) c,
          |LATERAL (
          |  SELECT o.o_orderkey, o.o_totalprice
          |  FROM orders o JOIN customer c2 ON o.o_custkey = c2.c_custkey
          |  WHERE c2.c_mktsegment = c.c_mktsegment
          |  ORDER BY o.o_totalprice DESC, o.o_orderkey
          |  LIMIT 3) t
          |ORDER BY c.c_mktsegment, t.o_totalprice DESC, t.o_orderkey""".stripMargin),
      """SELECT c.c_mktsegment, t.o_orderkey, round(t.o_totalprice, 2) AS totalprice
        |FROM (SELECT DISTINCT c_mktsegment FROM customer) c,
        |LATERAL (
        |  SELECT o.o_orderkey, o.o_totalprice
        |  FROM orders o JOIN customer c2 ON o.o_custkey = c2.c_custkey
        |  WHERE c2.c_mktsegment = c.c_mktsegment
        |  ORDER BY o.o_totalprice DESC, o.o_orderkey
        |  LIMIT 3) t
        |ORDER BY c.c_mktsegment, t.o_totalprice DESC, t.o_orderkey""".stripMargin)
  )
}
