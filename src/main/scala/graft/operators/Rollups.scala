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
      val out = java.nio.file.Files.createTempDirectory("graft_rollup").toString
      Tables.lineitem(s, dir)
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum($"l_quantity").as("sum_qty"),
          sum($"l_extendedprice").as("sum_price"),
          min($"l_quantity").as("min_qty"),
          max($"l_quantity").as("max_qty"),
          count(lit(1)).as("cnt"))
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
          ("count", "*") -> "cnt")))
      out
    })

  def queries: Map[String, QueryDef] = Map(
    // Aggregate declared AGAINST THE BASE lineitem scan; answered from the
    // rollup by the optimizer rule.
    "rollup_rewrite" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        ensureRollup(s, dir)
        RollupRewrite.install(s)
        Tables.lineitem(s, dir)
          .groupBy($"l_returnflag")
          .agg(
            round(sum($"l_quantity"), 2).as("sum_qty"),
            round(sum($"l_extendedprice"), 2).as("sum_price"),
            round(min($"l_quantity"), 2).as("min_qty"),
            round(max($"l_quantity"), 2).as("max_qty"),
            count(lit(1)).as("n"))
          .orderBy($"l_returnflag")
      },
      """SELECT l_returnflag,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_price,
        |  round(min(l_quantity), 2) AS min_qty,
        |  round(max(l_quantity), 2) AS max_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)
  )
}
