package graft.sqlext

import graft.api.{MetricView, MetricViewCatalog}
import org.apache.spark.sql.SparkSessionExtensions

/** SQL-parity surface for metric views (reference README.md:122-141):
  *
  * {{{
  * spark.sql("SELECT market_segment, MEASURE(total_revenue) " +
  *           "FROM mv_order_metrics GROUP BY market_segment")
  * }}}
  *
  * Register with
  * `.config("spark.sql.extensions", "graft.sqlext.GraftExtensions")`,
  * then publish views via [[SqlMetricViews.register]] (the catalog does
  * this automatically on createOrReplace).
  *
  * `MEASURE()` is not a real aggregate — it is a resolution marker the
  * analyzer replaces (SURVEY.md §2.10). The injected rule rewrites the
  * whole Aggregate over the metric-view relation into the expanded plan
  * built by [[MetricView.query]], so the SQL path shares routing,
  * baseline fallback, window planning and join culling with the
  * DataFrame path.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // placeholder so the analyzer's eager LookupFunctions check passes;
    // MeasureExpansionRule replaces every call before resolution
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("measure"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[MeasureMarker].getCanonicalName, "measure"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MeasureMarker(args.head)))
    // engine-owned HLL (graft.functions.GraftHll) — registered so
    // measure exprs written in SQL (spec YAML, combiner templates)
    // resolve; the analyzer wraps the AggregateFunctions itself
    def fn(name: String, arity: Int = -1)(
        builder: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
          org.apache.spark.sql.catalyst.expressions.Expression): Unit =
      ext.injectFunction((
        new org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "graft.functions.GraftHll", name),
        args => {
          // loud arity error instead of the builder's raw index crash
          if (arity >= 0 && args.length != arity)
            throw new IllegalArgumentException(
              s"$name expects $arity arguments, got ${args.length}")
          builder(args)
        }))
    fn("graft_hll_agg", 1)(args => graft.functions.GraftHllAgg(args.head))
    fn("graft_hll_merge", 1)(args => graft.functions.GraftHllMerge(args.head))
    fn("graft_hll_estimate", 1)(args => graft.functions.GraftHllEstimate(args.head))
    // engine-owned bounded-range histogram (graft.functions.GraftHistogram)
    // — the routable approx-percentile sketch
    fn("graft_hist_agg", 4)(args =>
      graft.functions.GraftHistAgg(args(0), args(1), args(2), args(3)))
    fn("graft_hist_merge", 1)(args => graft.functions.GraftHistMerge(args.head))
    fn("graft_hist_quantile", 4)(args =>
      graft.functions.GraftHistQuantile(args(0), args(1), args(2), args(3)))
    fn("graft_hist_tvd", 2)(args =>
      graft.functions.GraftHistTvd(args(0), args(1)))
    fn("graft_hist_clamped", 1)(args =>
      graft.functions.GraftHistClamped(args.head))
    // measure-level sugar: graft_percentile_bounded(x, p, lo, hi, bins)
    // = quantile over the histogram of x — ONE call a spec author
    // writes; AggDecompose splits it into the storable partial + the
    // mergeable re-agg + the scalar estimate for routing. The inner
    // aggregate is wrapped explicitly because the analyzer only
    // auto-wraps the top-level function result.
    fn("graft_percentile_bounded", 5) { args =>
      graft.functions.GraftHistQuantile(
        graft.functions.GraftHistAgg(args(0), args(2), args(3), args(4))
          .toAggregateExpression(),
        args(1), args(2), args(3))
    }
    // engine-owned SpaceSaving frequent-items sketch (graft.functions
    // .GraftTopK) — the routable top-k measure
    fn("graft_topk_agg", 2)(args =>
      graft.functions.GraftTopKAgg(args(0), args(1)))
    fn("graft_topk_merge", 1)(args => graft.functions.GraftTopKMerge(args.head))
    fn("graft_topk_extract", 2)(args =>
      graft.functions.GraftTopKExtract(args(0), args(1)))
    // measure-level sugar: graft_topk(key, k, capacity) — AggDecompose
    // splits it into the storable partial + mergeable re-agg + extract
    fn("graft_topk", 3) { args =>
      graft.functions.GraftTopKExtract(
        graft.functions.GraftTopKAgg(args(0), args(2)).toAggregateExpression(),
        args(1))
    }
    ext.injectResolutionRule(s => new MeasureExpansionRule(s))
    // SQL-string DDL lifecycle (CREATE ... WITH METRICS LANGUAGE YAML /
    // DROP VIEW / DESCRIBE / SHOW TBLPROPERTIES) — see MetricViewDdl
    ext.injectParser((_, delegate) => new MetricViewSqlParser(delegate))
  }
}

/** Placeholder for MEASURE(x): never evaluated — only legal inside an
  * aggregate over a metric-view relation, where the expansion rule
  * rewrites it away. Surviving to execution means the query shape was
  * unsupported (e.g. MEASURE over a plain table). */
case class MeasureMarker(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.Unevaluable {
  override def dataType: org.apache.spark.sql.types.DataType = child.dataType
  override def nullable: Boolean = true
  override def prettyName: String = "measure"
  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): MeasureMarker =
    copy(child = newChild)
}

/** Process-wide registry the analyzer rule consults. Keyed by view
  * name; a catalog createOrReplace overwrites, drop removes. */
object SqlMetricViews {
  private val views = scala.collection.concurrent.TrieMap[String, MetricView]()
  def register(v: MetricView): Unit = views(v.name) = v
  def registerAll(cat: MetricViewCatalog): Unit = cat.list.foreach(n => register(cat.get(n)))
  def unregister(name: String): Unit = views.remove(name)
  def get(name: String): Option[MetricView] = views.get(name)
  def clear(): Unit = views.clear()

  /** Catalog that SQL `CREATE ... WITH METRICS` registers into, keyed
    * per SparkSession (ADVICE r3: a process-global last-wins binding is
    * ordering-dependent and wrong with multiple sessions/dirs in one
    * JVM). Each MetricViewCatalog binds itself for its session at the
    * end of construction — a later catalog on the same session takes
    * the binding over, and a caller that needs a specific target (e.g.
    * the q_sql_ddl wrapper on a cache hit) re-binds explicitly via
    * [[graft.api.MetricViewCatalog.bind]]. DROP/DESCRIBE go to the
    * owning catalog of the named view, so only CREATE consults this. */
  private val bound =
    scala.collection.concurrent.TrieMap[org.apache.spark.sql.SparkSession, MetricViewCatalog]()

  /** Drop bindings whose session's context has stopped (ADVICE r4: the
    * strong session→catalog reference otherwise lives for the JVM —
    * unbounded with many short-lived sessions). Swept on every bind —
    * cheap (map is small), and growth is driven by binds, so sweeping
    * there bounds it. Known residual: cloned sessions (`newSession`)
    * share a still-live context, so their bindings survive until the
    * context stops — bounded by the number of clones that ever bound a
    * catalog, not by query volume. */
  private def sweepStopped(): Unit =
    bound.keys.filter(_.sparkContext.isStopped).foreach(bound.remove)

  def bindCatalog(cat: MetricViewCatalog): Unit = { sweepStopped(); bound(cat.spark) = cat }
  def boundCatalog(session: org.apache.spark.sql.SparkSession): Option[MetricViewCatalog] =
    bound.get(session)
}
