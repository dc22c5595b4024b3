package graft.plan

import graft.spec._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Planner for window measures (reference models/schema.yml:92-103,
  * README.md:250-277).
  *
  * == Semantics (our documented contract; encoded identically in the
  * DuckDB oracle SQL so it is testable) ==
  *
  * For a query with dims D and a window measure `agg(x)` with primary
  * level (order o, range R, semiadditive s) and zero or more outer
  * `range: current` levels with order columns C (frame-reset keys — the
  * YTD pattern, README.md:267-277):
  *
  *  1. Base grain G = D ∪ {o} ∪ C: compute *decomposed partials* of the
  *     aggregate per G-group (map-side-combinable; one shuffle).
  *  2. Frame value per base row: re-aggregate the partials over
  *     Window.partitionBy((D \ {o}) ∪ C).orderBy(o) with the frame from
  *     R — `trailing n day` = RANGE [n-1 days preceding, current],
  *     `cumulative` = [unbounded preceding, current],
  *     `current` = [current, current].
  *  3. If G == D the frame value is the result; otherwise the group is
  *     coarser than the order grain and the semiadditive rule resolves
  *     it: `last` = value at max(o) per D-group (`max_by`), `first` =
  *     value at min(o) (`min_by`).
  *
  * Scale: step 1 collapses the raw fact table to the (dims × order)
  * grain *before* any window function runs, so the sort behind the
  * window operates on pre-aggregated data (|distinct o| rows per
  * partition, not |fact|). The window partitions by the query dims —
  * no single-partition global sort unless the query itself is global
  * (D ⊆ {o}), which is inherently a small result.
  */
object WindowPlanner {

  /** True if this measure can be answered by this planner. */
  def supported(spark: SparkSession, spec: MetricViewSpec, m: Measure): Boolean =
    m.isWindowed && m.window.tail.forall(_.range == RangeSpec.Current) &&
      AggDecompose(spark,
        Expander.rewriteExpr(
          // same pre-pass as MetricView.measureExpr: variance-family
          // aggregates decompose via their algebraic rewrite
          AggDecompose.rewriteVariance(spark, Expander.parse(spark, m.expr)),
          Expander.joinPaths(spec.joins).map(_._1)), m.name).isDefined

  /** Day-number / period-number ordering column for a range unit. */
  private def orderNumber(o: Column, unit: String): Column = unit match {
    case "day"   => unix_date(to_date(o))
    case "week"  => unix_date(to_date(o)) // weeks expressed as 7n days by caller
    case "hour"  => floor(unix_timestamp(o) / 3600L)
    case "month" => year(o) * 12 + month(o) - 1
    case "year"  => year(o).cast("long")
    case u       => sys.error(s"unsupported trailing-window unit '$u'")
  }

  /** Tripwire for the empty-partition window path: an unpartitioned
    * window must only ever see input pre-collapsed to the order grain
    * ({order} ∪ reset keys) — anything wider means fact-scale rows
    * through a single partition. */
  private[plan] def requireCollapsedForGlobalWindow(
      baseGrain: Seq[String], order: String, currentKeys: Seq[String]): Unit =
    require(baseGrain.toSet.subsetOf(currentKeys.toSet + order),
      s"global-grain window over uncollapsed input: base grain " +
        s"(${baseGrain.mkString(", ")}) exceeds the order grain " +
        s"(${(currentKeys :+ order).mkString(", ")}) — this would single-" +
        "partition fact-scale data")

  /** The frame-sharing key: measures with the same (order, reset keys)
    * can share one base-grain partial aggregate and one window
    * partitioning — only the frame bounds differ per measure. */
  def frameKey(m: Measure): (String, Seq[String]) =
    (m.window.head.order, m.window.tail.map(_.order))

  /** Plan one window measure at query grain `dims` (single-measure
    * convenience over [[planShared]]). */
  def plan(
      spark: SparkSession,
      spec: MetricViewSpec,
      m: Measure,
      dims: Seq[String],
      rows: DataFrame,
      dimExprFor: String => Column,
      measureExpr: String => org.apache.spark.sql.catalyst.expressions.Expression): DataFrame =
    planShared(spark, spec, Seq(m), Nil, dims, rows, dimExprFor, measureExpr)

  /** Plan a GROUP of window measures sharing one [[frameKey]] — one
    * base-grain partial aggregate, one window partitioning (Spark plans
    * the per-measure frames as window expressions over the same
    * exchange), one semiadditive resolution — plus optional decomposable
    * PLAIN measures folded into the same base so they cost no extra
    * scan/shuffle: their partials ride the base aggregate and are
    * re-aggregated in the resolution step.
    *
    * Scale: for a query with k window measures over one order column
    * this is one collapse of the fact table + one sorted window stage,
    * instead of k independent scan→agg→window pipelines joined at the
    * end (k+1 scans, 2k+1 shuffles → 2 shuffles total).
    *
    * @param ms       window measures, all with the same frameKey
    * @param plainMs  decomposable plain measures to fold into the base
    * @return DataFrame with columns: dims ++ ms.names ++ plainMs.names
    */
  def planShared(
      spark: SparkSession,
      spec: MetricViewSpec,
      ms: Seq[Measure],
      plainMs: Seq[Measure],
      dims: Seq[String],
      rows: DataFrame,
      dimExprFor: String => Column,
      measureExpr: String => org.apache.spark.sql.catalyst.expressions.Expression,
      /** rows already hold base partials (a routed rollup,
        * Materializer.windowBase): step 1 MERGES stored partial columns
        * (associative re-agg) instead of computing them from raw rows */
      preAggregated: Boolean = false): DataFrame = {

    require(ms.nonEmpty, "planShared needs at least one window measure")
    require(ms.map(frameKey).distinct.size == 1,
      s"measures ${ms.map(_.name).mkString(",")} do not share a frame key")
    ms.foreach { m =>
      require(m.window.tail.forall(_.range == RangeSpec.Current),
        s"measure ${m.name}: only 'current' ranges may stack above the primary window level")
    }

    val o = ms.head.window.head.order
    val currentKeys = ms.head.window.tail.map(_.order)
    val baseGrain = (dims ++ Seq(o) ++ currentKeys).distinct

    def decompose(m: Measure): (Measure, Decomposed) =
      m -> AggDecompose(spark, measureExpr(m.expr), m.name).getOrElse(
        sys.error(s"window measure ${m.name}: expression '${m.expr}' is not decomposable"))
    val winDecs = ms.map(decompose)
    val plainDecs = plainMs.map(decompose)

    // 1. collapse to base grain with ALL measures' decomposed partials
    //    (content-addressed names: measures sharing a partial — e.g. a
    //    trailing sum next to a cumulative sum of the same column —
    //    collapse it ONCE; name-distinct is a safe dedup)
    val allPartials = AggDecompose.distinctPartials(
      (winDecs ++ plainDecs).flatMap(_._2.partials))
    // preAggregated input: the rollup stores the partial COLUMNS; the
    // collapse to base grain is a merge (reagg) of those columns under
    // the same names — posts stay in the combiner, exactly as when the
    // partials come off raw rows
    val baseAggs =
      if (preAggregated) allPartials.map(p => p.reagg(p.name).as(p.name))
      else allPartials.map(_.agg)
    val base = rows
      .groupBy(baseGrain.map(d => dimExprFor(d).as(d)): _*)
      .agg(baseAggs.head, baseAggs.tail: _*)

    // 2. frame value per window measure, all over ONE partitioning —
    //    Spark's window planner shares the exchange (and the sort, when
    //    the order expression matches) across frames
    val partitionKeys = (dims.filterNot(_ == o) ++ currentKeys).distinct
    val part = if (partitionKeys.isEmpty) {
      // Global-grain window: every input row lands in ONE partition
      // (the `WindowExec: No Partition Defined` warning). Safe only
      // because step 1 collapsed the input to the {o} ∪ reset-keys
      // grain — |distinct order values| rows, never |fact| rows. The
      // tripwire keeps a future edit to baseGrain from silently
      // single-partitioning real data.
      requireCollapsedForGlobalWindow(baseGrain, o, currentKeys)
      Window.partitionBy()
    } else
      Window.partitionBy(partitionKeys.map(col): _*)
    def frameFor(m: Measure): org.apache.spark.sql.expressions.WindowSpec =
      m.window.head.range match {
        case RangeSpec.Trailing(n, unit) =>
          val days = if (unit == "week") n * 7 else n
          part.orderBy(orderNumber(col(o), unit)).rangeBetween(-(days - 1).toLong, 0L)
        case RangeSpec.Cumulative =>
          part.orderBy(col(o)).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        case RangeSpec.Current =>
          part.orderBy(col(o)).rowsBetween(Window.currentRow, Window.currentRow)
        case RangeSpec.Prior(n, unit) =>
          // the single period exactly n units back: a RANGE frame pinned
          // at offset -n over the period number — empty (→ null) when
          // that period has no rows, which is the honest PoP answer
          part.orderBy(orderNumber(col(o), unit)).rangeBetween(-n.toLong, -n.toLong)
      }
    val valued = winDecs.foldLeft(base) { case (df, (m, dec)) =>
      df.withColumn(m.name, dec.overWindow(frameFor(m), identity))
    }

    val outNames = ms.map(_.name) ++ plainMs.map(_.name)

    // 3. semiadditive resolution down to the query grain; folded plain
    //    measures re-aggregate their partials in the same pass
    if (baseGrain.toSet == dims.toSet) {
      // base grain IS the query grain: each group is a single base row,
      // so a plain measure's re-aggregation is the partial itself
      val plainCols = plainDecs.map { case (m, dec) =>
        dec.finalizeAtGrain(identity).as(m.name)
      }
      valued.select(dims.map(col) ++ ms.map(m => col(m.name)) ++ plainCols: _*)
    } else {
      val resolvers = winDecs.map { case (m, _) =>
        (m.window.head.semiadditive.getOrElse("last") match {
          case "last"  => max_by(col(m.name), col(o))
          case "first" => min_by(col(m.name), col(o))
          case other   => sys.error(s"unsupported semiadditive rule '$other'")
        }).as(m.name)
      }
      val plainAggs = plainDecs.map { case (m, dec) => dec.reaggregate(identity).as(m.name) }
      val aggCols = resolvers ++ plainAggs
      val resolved =
        if (dims.isEmpty) valued.agg(aggCols.head, aggCols.tail: _*)
        else valued.groupBy(dims.map(col): _*).agg(aggCols.head, aggCols.tail: _*)
      resolved.select((dims ++ outNames).map(col): _*)
    }
  }
}
