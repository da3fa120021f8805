package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Rollup / sync-materialized-view selection (SURVEY.md §4, M4 stretch).
  *
  * Doris keeps physically pre-aggregated rollups of a base table and its
  * planner transparently retargets matching aggregates onto the smallest one
  * ([doris: fe/.../planner/MaterializedViewSelector.java],
  * [doris: fe/.../alter/MaterializedViewHandler.java]). Spark equivalent: a
  * user-provided optimizer rule (spark.experimental.extraOptimizations — no
  * fork of the session builder needed) that rewrites
  *
  *   Aggregate(G, aggs, scan(base))   where G ⊆ rollup keys and every agg is
  *                                    a re-aggregable sum/min/max/count(*)
  * into
  *   Aggregate(G, merged-aggs, scan(rollup))
  *
  * with the standard merge mapping sum→sum(sum_c), min→min(min_c),
  * max→max(max_c), count(*)→sum(cnt). Output exprIds are preserved so parent
  * operators resolve unchanged.
  *
  * Scale rationale: at 100 TB the rollup is orders of magnitude smaller than
  * the fact table (|groups| vs |rows|); retargeting turns a full fact scan +
  * shuffle into a scan of an already-collapsed table — the same reason Doris
  * AGGREGATE-key tables exist. Filters/avg/distinct make the rewrite bail
  * (conservative by design).
  */
object RollupRewrite {

  /** One registered rollup: base table path -> pre-aggregated parquet. */
  case class RollupDef(
      basePath: String,
      rollupPath: String,
      keys: Seq[String],
      // base agg -> rollup column: e.g. ("sum", "l_quantity") -> "sum_qty",
      // count(*) -> ("count", "*") -> "cnt"
      columns: Map[(String, String), String])

  /** Session-wide registry (append-only; cleared by tests as needed). */
  private val registry = new java.util.concurrent.CopyOnWriteArrayList[RollupDef]()

  def register(d: RollupDef): Unit = registry.add(d)
  def clear(): Unit = registry.clear()

  /** Install the rule once per session. */
  def install(spark: SparkSession): Unit = {
    val present = spark.experimental.extraOptimizations.exists(_.isInstanceOf[RollupRewriteRule])
    if (!present)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ new RollupRewriteRule(spark)
  }

  class RollupRewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {

    private def scanPath(p: LogicalPlan): Option[String] = p match {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        fs.location.rootPaths.headOption.map(_.toString)
      case Project(projList, child) if projList.forall(_.isInstanceOf[AttributeReference]) =>
        scanPath(child)
      case _ => None
    }

    override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
      case agg @ Aggregate(_, _, child, _) =>
        val rewritten = for {
          path <- scanPath(child)
          rollup <- registry.toArray(Array.empty[RollupDef])
            .find(d => path == d.rollupBaseNorm || path == d.basePath)
          out <- tryRewrite(agg, rollup)
        } yield out
        rewritten.getOrElse(agg)
    }

    private def tryRewrite(agg: Aggregate, d: RollupDef): Option[LogicalPlan] = {
      // grouping must be plain columns within the rollup keys
      val groupNames = agg.groupingExpressions.map {
        case a: AttributeReference => Some(a.name)
        case _ => None
      }
      if (groupNames.exists(_.isEmpty)) return None
      if (!groupNames.flatten.forall(d.keys.contains)) return None

      val rollupPlan = spark.read.parquet(d.rollupPath).queryExecution.analyzed
      val rollupAttr: Map[String, Attribute] = rollupPlan.output.map(a => a.name -> a).toMap

      // generic rewrite: swap AggregateExpressions for their merge form and
      // key attributes for rollup attributes; any unmappable node -> bail
      def rewriteExpr(e: Expression): Option[Expression] = e match {
        case ae @ AggregateExpression(fn, _, false, None, _) =>
          fn match {
            case Sum(a: AttributeReference, _) =>
              d.columns.get(("sum", a.name)).map(c => ae.copy(aggregateFunction = Sum(rollupAttr(c))))
            case Min(a: AttributeReference) =>
              d.columns.get(("min", a.name)).map(c => ae.copy(aggregateFunction = Min(rollupAttr(c))))
            case Max(a: AttributeReference) =>
              d.columns.get(("max", a.name)).map(c => ae.copy(aggregateFunction = Max(rollupAttr(c))))
            case Count(Seq(Literal(1, _))) =>
              d.columns.get(("count", "*")).map(c => ae.copy(aggregateFunction = Sum(rollupAttr(c))))
            case _ => None
          }
        case a: AttributeReference =>
          if (d.keys.contains(a.name)) Some(rollupAttr(a.name)) else None
        case other =>
          val newChildren = other.children.map(rewriteExpr)
          if (newChildren.exists(_.isEmpty)) None
          else if (other.children.isEmpty) Some(other)
          else Some(other.withNewChildren(newChildren.flatten))
      }

      val newAggExprs = agg.aggregateExpressions.map { ne =>
        rewriteExpr(ne).map {
          case a: Attribute => Alias(a, ne.name)(exprId = ne.exprId)
          case al: Alias => al
          case other => Alias(other, ne.name)(exprId = ne.exprId)
        }
      }
      if (newAggExprs.exists(_.isEmpty)) return None
      val newGrouping = agg.groupingExpressions.map {
        case a: AttributeReference => rollupAttr(a.name)
      }
      Some(Aggregate(newGrouping, newAggExprs.flatten, rollupPlan))
    }
  }

  implicit private class DefOps(d: RollupDef) {
    // normalized base path (file:// prefix tolerance)
    def rollupBaseNorm: String = "file:" + d.basePath.stripPrefix("file:")
  }
}
