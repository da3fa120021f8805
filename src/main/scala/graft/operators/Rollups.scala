package graft.operators

import graft.{QueryDef, Tables}
import graft.plans.RollupRewrite
import graft.plans.RollupRewrite.RollupDef
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Rollup materialization + transparent retargeting demo (SURVEY.md §4).
  *
  * Builds a physical rollup of lineitem keyed by (l_returnflag, l_linestatus)
  * once per sf dir, registers it with [[RollupRewrite]], and then runs an
  * aggregate ON THE BASE TABLE — the optimizer rule retargets the plan onto
  * the 6-row rollup (ScalaTest asserts the rewritten scan; the DuckDB oracle
  * asserts the answer equals aggregating the base table).
  */
object Rollups {

  private val built = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Create (once) and register the lineitem rollup for this sf dir. */
  def ensureRollup(s: SparkSession, dir: String): String =
    built.computeIfAbsent(dir, { _ =>
      import s.implicits._
      val out = graft.TempDirs.create("graft_rollup")
      Tables.lineitem(s, dir)
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum($"l_quantity").as("sum_qty"),
          sum($"l_extendedprice").as("sum_price"),
          min($"l_quantity").as("min_qty"),
          max($"l_quantity").as("max_qty"),
          count(lit(1)).as("cnt"),
          count($"l_quantity").as("cnt_qty"))
        .coalesce(1)
        .write.mode("overwrite").parquet(out)
      RollupRewrite.register(RollupDef(
        basePath = s"$dir/lineitem.parquet",
        rollupPath = out,
        keys = Seq("l_returnflag", "l_linestatus"),
        columns = Map(
          ("sum", "l_quantity") -> "sum_qty",
          ("sum", "l_extendedprice") -> "sum_price",
          ("min", "l_quantity") -> "min_qty",
          ("max", "l_quantity") -> "max_qty",
          ("count", "*") -> "cnt",
          // the column's own non-null count: what avg(l_quantity) merges on
          ("count", "l_quantity") -> "cnt_qty")))
      out
    })

  private val builtCoarse = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** A SECOND, coarser rollup of the same base — keyed by l_returnflag
    * alone with a reduced column set — so the rule has overlapping
    * candidates to RANK (Doris MaterializedViewSelector: among all rollups
    * that cover the aggregate, serve the cheapest). */
  def ensureCoarseRollup(s: SparkSession, dir: String): String =
    builtCoarse.computeIfAbsent(dir, { _ =>
      import s.implicits._
      val out = graft.TempDirs.create("graft_rollup_coarse")
      Tables.lineitem(s, dir)
        .groupBy($"l_returnflag")
        .agg(
          sum($"l_quantity").as("sum_qty"),
          count(lit(1)).as("cnt"),
          count($"l_quantity").as("cnt_qty"))
        .coalesce(1)
        .write.mode("overwrite").parquet(out)
      RollupRewrite.register(RollupDef(
        basePath = s"$dir/lineitem.parquet",
        rollupPath = out,
        keys = Seq("l_returnflag"),
        columns = Map(
          ("sum", "l_quantity") -> "sum_qty",
          ("count", "*") -> "cnt",
          ("count", "l_quantity") -> "cnt_qty")))
      out
    })

  /** Which registered artifact ultimately feeds this plan: inspects the
    * optimized plan's leaf relations (driver-side metadata only). */
  private def servedBy(
      df: org.apache.spark.sql.DataFrame,
      coarse: String, fine: String): String = {
    val leafPaths = df.queryExecution.optimizedPlan.collectLeaves().flatMap {
      case org.apache.spark.sql.execution.datasources.LogicalRelation(
          fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation,
          _, _, _, _) =>
        fs.location.rootPaths.map(_.toString)
      case _ => Nil
    }
    if (leafPaths.exists(_.contains(coarse))) "coarse"
    else if (leafPaths.exists(_.contains(fine))) "fine"
    else "base"
  }

  def queries: Map[String, QueryDef] = Map(
    // Aggregate declared AGAINST THE BASE lineitem scan; answered from the
    // rollup by the optimizer rule.
    "rollup_rewrite" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        ensureRollup(s, dir)
        RollupRewrite.install(s)
        // checked columns are the QUANTITY family: quantities are
        // integer-valued, so every partial sum is double-exact in any
        // summation order at any SF — while sum(l_extendedprice) crosses
        // the >=1e11 cross-engine order-drift line at sf10 (its merge
        // stays rollup-STORED and is plan+value-asserted engine-side in
        // RollupSpec; the coverage here is the served MERGE of
        // sum/min/max/count/avg across rollup partials)
        Tables.lineitem(s, dir)
          .groupBy($"l_returnflag")
          .agg(
            sum($"l_quantity").cast("long").as("sum_qty"),
            round(min($"l_quantity"), 2).as("min_qty"),
            round(max($"l_quantity"), 2).as("max_qty"),
            count(lit(1)).as("n"),
            round(avg($"l_quantity"), 4).as("avg_qty"))
          .orderBy($"l_returnflag")
      },
      """SELECT l_returnflag,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        |  round(min(l_quantity), 2) AS min_qty,
        |  round(max(l_quantity), 2) AS max_qty,
        |  count(*) AS n,
        |  round(avg(l_quantity), 4) AS avg_qty
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin),

    // DISTINCT aggregates over rollup KEY columns, served from the rollup:
    // DISTINCT erases multiplicity and the rollup preserves the exact
    // distinct key-tuple set, so count(DISTINCT key)/min/max over keys are
    // answered exactly from the 6-row rollup — the AGGREGATE-key-index
    // shape Doris's MaterializedViewSelector serves. Combined with a
    // key-column filter to exercise both widenings in one plan (RollupSpec
    // asserts the rewritten scan; the oracle replays the base table).
    "rollup_rewrite_distinct" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        ensureRollup(s, dir)
        RollupRewrite.install(s)
        Tables.lineitem(s, dir)
          .filter($"l_linestatus" =!= "X")
          .groupBy($"l_returnflag")
          .agg(
            countDistinct($"l_linestatus").as("nd_status"),
            min($"l_linestatus").as("min_status"),
            max($"l_linestatus").as("max_status"),
            count(lit(1)).as("n"),
            // aggregate FILTER clause over a key column: transplants onto
            // the merged aggregate (sum(cnt) FILTER), also rollup-served
            expr("count(*) FILTER (WHERE l_linestatus = 'F')").as("n_f"))
          .orderBy($"l_returnflag")
      },
      """SELECT l_returnflag,
        |  count(DISTINCT l_linestatus) AS nd_status,
        |  min(l_linestatus) AS min_status,
        |  max(l_linestatus) AS max_status,
        |  count(*) AS n,
        |  count(*) FILTER (WHERE l_linestatus = 'F') AS n_f
        |FROM lineitem WHERE l_linestatus <> 'X'
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // COST-RANKED rollup choice (Doris MaterializedViewSelector,
    // [doris: fe/.../planner/MaterializedViewSelector.java]): with BOTH the
    // (l_returnflag, l_linestatus) rollup and the coarser (l_returnflag)
    // rollup registered, the rule serves each aggregate from the CHEAPEST
    // covering candidate by scan-size stats — branch A is covered by both
    // and must land on the coarse one, branch B needs sum_price and must
    // land on the fine one, branch C aggregates a column in neither and
    // must fall back to the base scan. The chosen source is read from the
    // optimized plan's leaves and PINNED IN THE RESULT, so the driver
    // oracle hash breaks if the selector ever picks a wrong-but-correct
    // candidate; the aggregates themselves replay against the base table.
    "rollup_rewrite_choice" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val fine = ensureRollup(s, dir)
        val coarse = ensureCoarseRollup(s, dir)
        RollupRewrite.install(s)
        def branch(scope: String, agg: org.apache.spark.sql.Column) = {
          val df = Tables.lineitem(s, dir)
            .groupBy($"l_returnflag")
            .agg(round(agg, 2).as("metric"), count(lit(1)).as("n"))
          df.select(lit(scope).as("scope"), $"l_returnflag", $"metric", $"n",
            lit(servedBy(df, coarse, fine)).as("served_from"))
        }
        // branch metrics are drift-free at every SF: sums of
        // integer-valued doubles and a min — b_minq needs min_qty, which
        // only the FINE rollup stores (the coverage discriminator
        // sum_price used to provide), and c_linenum aggregates a column
        // in NEITHER rollup
        branch("a_qty", sum($"l_quantity"))
          .unionByName(branch("b_minq", min($"l_quantity")))
          .unionByName(branch("c_linenum", sum($"l_linenumber")))
          .orderBy($"scope", $"l_returnflag")
      },
      """SELECT scope, l_returnflag, metric, n, served_from FROM (
        |  SELECT 'a_qty' AS scope, l_returnflag,
        |    round(sum(l_quantity), 2) AS metric, count(*) AS n,
        |    'coarse' AS served_from
        |  FROM lineitem GROUP BY l_returnflag
        |  UNION ALL
        |  SELECT 'b_minq', l_returnflag,
        |    round(min(l_quantity), 2), count(*), 'fine'
        |  FROM lineitem GROUP BY l_returnflag
        |  UNION ALL
        |  SELECT 'c_linenum', l_returnflag,
        |    round(sum(l_linenumber), 2), count(*), 'base'
        |  FROM lineitem GROUP BY l_returnflag)
        |ORDER BY scope, l_returnflag""".stripMargin),

    // Incremental rollup/MV maintenance (Doris AGGREGATE-key compaction and
    // async-MV refresh): rollup(base ∪ delta) is computed as
    // re-aggregate(rollup(base) ∪ rollup(delta)) — the delta is aggregated
    // alone and MERGED into the standing rollup state, never rescanning the
    // base. That re-aggregability (sum/count/min/max; avg = sum÷cnt at read)
    // is why the 100 TB refresh cost scales with the delta, not the table.
    // The oracle is the full recompute over base ∪ delta: merged == full.
    "rollup_incremental" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        def rollupOf(slice: org.apache.spark.sql.DataFrame) = slice
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(sum($"l_quantity").as("sum_qty"),
            count(lit(1)).as("cnt"),
            min($"l_quantity").as("min_qty"),
            max($"l_quantity").as("max_qty"))
        val standing = rollupOf(
          Tables.lineitem(s, dir).filter($"l_orderkey" % 10 =!= 0))
        val delta = rollupOf(
          Tables.lineitem(s, dir).filter($"l_orderkey" % 10 === 0))
        standing.unionByName(delta)
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(round(sum($"sum_qty"), 2).as("sum_qty"),
            sum($"cnt").as("n"),
            round(min($"min_qty"), 2).as("min_qty"),
            round(max($"max_qty"), 2).as("max_qty"),
            round(sum($"sum_qty") / sum($"cnt"), 4).as("avg_qty"))
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  count(*) AS n,
        |  round(min(l_quantity), 2) AS min_qty,
        |  round(max(l_quantity), 2) AS max_qty,
        |  round(sum(l_quantity) / count(*), 4) AS avg_qty
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
  )
}
