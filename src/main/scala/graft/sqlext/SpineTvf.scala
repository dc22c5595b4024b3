package graft.sqlext

import graft.api.SpineSpec
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.UnresolvedTableValuedFunction
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.StringType

/** SQL surface for gap-filled (date-spine) metric-view queries
  * ([[graft.api.MetricView.querySpine]]) as a table-valued function —
  * the composable FROM-clause shape (like Spark's own `range(...)`):
  *
  * {{{
  * SELECT * FROM graft_spine(
  *   'mv_order_metrics',                      -- view
  *   'order_date', 'day',                     -- spine dim + grain
  *   'market_segment,order_date',             -- query dims (csv)
  *   'total_revenue,cumulative_revenue',      -- measures (csv)
  *   'total_revenue',                         -- zero-fill measures
  *   'cumulative_revenue',                    -- forward-fill measures
  *   'order_priority = ''1-URGENT''')         -- optional WHERE
  * ORDER BY market_segment, order_date
  * }}}
  *
  * Implemented as a post-parse rewrite (the [[MetricViewSqlParser]]
  * hook): the stock parser happily produces an
  * `UnresolvedTableValuedFunction`, which is replaced by the expanded
  * (already-analyzed) spine plan BEFORE the analyzer would reject the
  * unknown function name — the same plan-splice posture as
  * [[MeasureExpansionRule]], so ORDER BY / projections / joins above
  * compose naturally, and routing (a rollup-covered spine re-aggregates
  * partials) is inherited from the DataFrame path. */
object SpineTvf {

  /** Replace every `graft_spine(...)` TVF in a freshly-parsed plan.
    * Plans without one pass through untouched (one cheap transform). */
  def rewrite(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case tvf: UnresolvedTableValuedFunction
        if tvf.name.map(_.toLowerCase) == Seq("graft_spine") =>
      val args = tvf.functionArgs.map {
        case Literal(s, StringType) if s != null => s.toString
        case other => sys.error(
          s"graft_spine arguments must be string literals; got ${other.sql}")
      }
      require(args.length == 7 || args.length == 8,
        "graft_spine(view, dateDim, grain, dims, measures, zeroFill, " +
          s"ffill[, where]) takes 7 or 8 arguments, got ${args.length}")
      val view = SqlMetricViews.get(args.head).getOrElse(
        sys.error(s"unknown metric view '${args.head}'"))
      def csv(s: String): Seq[String] =
        s.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      GraftBridge.logicalPlan(view.querySpine(
        csv(args(3)), csv(args(4)),
        SpineSpec(args(1), args(2), zeroFill = csv(args(5)), ffill = csv(args(6))),
        where = args.drop(7).headOption.filter(_.nonEmpty)))
  }
}
