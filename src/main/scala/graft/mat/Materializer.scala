package graft.mat

import graft.api.MetricView
import graft.plan.Expander
import graft.spec._
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Builds and routes to materialized metric-view tables (reference
  * A9/A10 + S8: models/schema.yml:39-49/:105-129, README.md:326-353,
  * :399-431).
  *
  * Layout: `<workDir>/<view>/<matView>/` parquet + `<workDir>/<view>/
  * _spec_hash`. Rollups store *decomposed partials* with
  * CONTENT-ADDRESSED column names (`gp_<slug>__<semantic hash>`,
  * AggDecompose.partialName) so any re-grouping to a dim subset stays
  * exact — never an average of averages — and measures that need the
  * SAME partial share one stored column: an avg next to a sum of the
  * same input stores sum+count, not sum+sum+count, and a p50/p95
  * percentile pair stores ONE histogram array, not two (r8; the name
  * doubles as the cross-session resolution key, so the stored-hash
  * marker carries a naming-scheme version to invalidate pre-r8
  * caches).
  *
  * Scale: a rollup is |dim-combination| rows — tiny next to the fact
  * table — so routed queries read KBs instead of TBs (the reference's
  * "~5 rows read", README.md:402). The baseline cache is the expanded
  * row-level relation: at 100 TB it would be a partitioned/Z-ordered
  * table; here plain parquet, but the routing logic is identical.
  */
final class Materializer(workDir: String, resolve: String => DataFrame) {

  private def viewDir(v: MetricView) = s"$workDir/${v.name}"
  private def path(v: MetricView, mvName: String) = s"${viewDir(v)}/$mvName"
  private def hashFile(v: MetricView) = Paths.get(s"${viewDir(v)}/_spec_hash")

  /** Stored build marker: spec hash + the partial SCHEME version —
    * naming (the cross-session column-resolution key) AND physical
    * layout. A change to either must invalidate caches built under the
    * old scheme even though the spec (and its user-visible spec_hash)
    * is unchanged. p2 = content-addressed names (r8); p3 = histogram
    * partials carry the trailing clamped-count slot (r9) — a p2 rollup
    * read under p3 would misparse 256 bins as 255 + a bogus clamp. */
  private def storedHash(v: MetricView) = v.spec.materializationHash + "#p3"

  def isBuilt(v: MetricView): Boolean =
    Files.exists(hashFile(v)) &&
      new String(Files.readAllBytes(hashFile(v))).trim == storedHash(v) &&
      v.spec.materialization.toSeq.flatMap(_.materializedViews)
        .forall(mv => VersionedTable.exists(path(v, mv.name)))

  def invalidate(v: MetricView): Unit =
    if (Files.exists(hashFile(v))) Files.delete(hashFile(v))

  /** Materialize every declared view. Idempotent per spec hash: an
    * unchanged spec is not rebuilt (CREATE OR REPLACE cache
    * preservation, reference macros/generate_metric_views.sql:78-79).
    *
    * Every write goes through [[VersionedTable]] (write next version →
    * atomic pointer flip), so a rebuild serves stale-but-complete reads
    * while in flight — `mode: relaxed`, reference schema.yml:108. */
  def build(v: MetricView, force: Boolean = false): Unit = {
    if (!force && isBuilt(v)) return
    v.spec.materialization.foreach { mat =>
      mat.materializedViews.foreach { mv =>
        val df =
          if (mv.isAggregated) rollupFrame(v, mv)
          else v.baselineFrame
        VersionedTable.write(df, path(v, mv.name))
      }
      markBuilt(v)
    }
  }

  /** Rebuild only the unaggregated (baseline) caches — the batch half of
    * an incremental refresh (rollups fold; a row-level cache without a
    * transaction log recomputes). */
  def buildUnaggregated(v: MetricView): Unit =
    v.spec.materialization.toSeq.flatMap(_.materializedViews)
      .filterNot(_.isAggregated)
      .foreach(mv => VersionedTable.write(v.baselineFrame, path(v, mv.name)))

  /** Record the spec hash after an out-of-band (incremental) build. */
  def markBuilt(v: MetricView): Unit = {
    Files.createDirectories(Paths.get(viewDir(v)))
    Files.write(hashFile(v), storedHash(v).getBytes)
  }

  /** Drop the stored rollup/baseline tables (spec changed — incremental
    * state must restart from scratch). */
  def reset(v: MetricView): Unit = {
    invalidate(v)
    v.spec.materialization.toSeq.flatMap(_.materializedViews)
      .foreach(mv => VersionedTable.destroy(path(v, mv.name)))
  }

  /** Rollup = group by the rollup's dims, store decomposed partials of
    * each listed measure. */
  private def rollupFrame(v: MetricView, mv: MatViewSpec): DataFrame = {
    val spark = SparkSession.active
    val dimCols = mv.dimensions.map(d => Expander.dimCol(spark, v.spec, d))
    val partials = graft.plan.AggDecompose.distinctPartials(
      mv.measures.flatMap { mName =>
        val m = v.spec.measure(mName)
        require(!m.isWindowed,
          s"rollup ${mv.name}: window measure $mName cannot be materialized in an aggregated view")
        val dec = v.decomposed(m).getOrElse(sys.error(
          s"rollup ${mv.name}: measure $mName ('${m.expr}') is not decomposable"))
        dec.partials
      }).map(_.agg)
    val needed = mv.dimensions.map(v.spec.dimension(_).expr) ++
      mv.measures.map(v.spec.measure(_).expr)
    Expander.rowLevel(spark, v.spec, resolve, needed)
      .groupBy(dimCols: _*)
      .agg(partials.head, partials.tail: _*)
  }

  /** The built baseline cache, if declared and current. */
  def baseline(v: MetricView): Option[DataFrame] =
    for {
      mat <- v.spec.materialization
      mv <- mat.materializedViews.find(_.mvType == "unaggregated")
      if isBuilt(v)
    } yield VersionedTable.read(SparkSession.active, path(v, mv.name))

  /** Window-measure base routing (r11): a window plan's step 1
    * collapses the fact relation to (query dims ∪ order ∪ reset keys)
    * partials; when some aggregated rollup's dims cover that base
    * grain AND its stored partial columns include every partial the
    * frame needs (content-addressed names — a rollup built for
    * `total_revenue` stores `gp_sum_total_price__…`, the exact column
    * a `trailing sum(total_price)` frame re-aggregates), the collapse
    * can re-aggregate the ROLLUP instead of scanning the fact table.
    * The frame math is unchanged — partial merges are associative, so
    * re-collapsing day-grain rollup partials is bit-identical to
    * collapsing fact rows — only the input is rollup-scale. Returns
    * the (where-filtered) rollup table; the WindowPlanner re-collapses
    * it to the base grain itself (`preAggregated` path). The reference
    * never routes windows (README.md:431) because its rollups store
    * FINALIZED measures; storing decomposed partials is what makes
    * this legal here. */
  def windowBase(
      v: MetricView,
      baseGrain: Seq[String],
      neededPartials: Seq[String],
      where: Option[String],
      whereDims: Seq[String]): Option[DataFrame] = {
    if (!isBuilt(v)) return None
    val spark = SparkSession.active
    val needed = (baseGrain ++ whereDims).toSet
    val candidates = v.spec.materialization.toSeq
      .flatMap(_.materializedViews)
      .filter(_.isAggregated)
      .filter { r =>
        needed.subsetOf(r.dimensions.toSet) && {
          val stored = graft.plan.AggDecompose.distinctPartials(
            r.measures.flatMap(n =>
              v.decomposed(v.spec.measure(n)).toSeq.flatMap(_.partials)))
            .map(_.name).toSet
          neededPartials.forall(stored.contains)
        }
      }
    candidates.sortBy(r =>
      (VersionedTable.rowCount(path(v, r.name)).getOrElse(Long.MaxValue),
        r.dimensions.size)).headOption.map { r =>
      val pre = VersionedTable.read(spark, path(v, r.name))
      where.fold(pre)(w => pre.filter(
        Expander.dimFilter(spark, identityDims(v), w)))
    }
  }

  /** Routing decision + routed plan (reference A10, README.md:399-431):
    * eligible iff some aggregated rollup covers the query dims, the
    * WHERE's dims, and every requested measure (all decomposable, none
    * windowed). Smallest covering rollup wins — by ACTUAL row count
    * (recorded at build time, [[VersionedTable.rowCount]]), because
    * dimension count is only a proxy: one high-cardinality dim (e.g.
    * order_date, thousands of groups) makes a bigger table than two
    * low-cardinality ones (segment x status, ~15). Cost-based choice is
    * what matters at 100 TB, where the rollup size spread spans orders
    * of magnitude; dim count stays as the tie-break and the fallback
    * for stats-less tables. */
  def route(
      v: MetricView,
      dims: Seq[String],
      measures: Seq[Measure],
      where: Option[String],
      whereDims: Seq[String]): Option[DataFrame] = {
    if (!isBuilt(v)) return None
    val spark = SparkSession.active
    val needed = (dims ++ whereDims).toSet
    val candidates = v.spec.materialization.toSeq
      .flatMap(_.materializedViews)
      .filter(_.isAggregated)
      .filter { r =>
        needed.subsetOf(r.dimensions.toSet) &&
          measures.forall(m => r.measures.contains(m.name)) &&
          measures.forall(m => !m.isWindowed && v.decomposed(m).isDefined)
      }
    candidates.sortBy(r =>
      (VersionedTable.rowCount(path(v, r.name)).getOrElse(Long.MaxValue),
        r.dimensions.size)).headOption.map { r =>
      val pre0 = VersionedTable.read(spark, path(v, r.name))
      val pre = where.fold(pre0)(w => pre0.filter(
        Expander.dimFilter(spark, identityDims(v), w)))
      val aggCols = measures.map { m =>
        v.decomposed(m).get.reaggregate(identity).as(m.name)
      }
      pre.groupBy(dims.map(col): _*).agg(aggCols.head, aggCols.tail: _*)
    }
  }

  private def identityDims(v: MetricView): MetricViewSpec =
    v.spec.copy(dimensions = v.spec.dimensions.map(d => d.copy(expr = d.name)), joins = Nil)
}
