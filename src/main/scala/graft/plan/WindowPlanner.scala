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
        Expander.rewriteExpr(Expander.parse(spark, m.expr),
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

  /** Plan one window measure at query grain `dims`.
    *
    * @param dimExprFor dimension name → Column in `rows`'s terms (raw
    *        expansion or precomputed baseline column)
    * @param rows row-level input (expanded source or baseline cache)
    * @return DataFrame with columns: dims ++ [m.name]
    */
  def plan(
      spark: SparkSession,
      spec: MetricViewSpec,
      m: Measure,
      dims: Seq[String],
      rows: DataFrame,
      dimExprFor: String => Column,
      measureExpr: String => org.apache.spark.sql.catalyst.expressions.Expression): DataFrame = {

    val primary = m.window.head
    val currents = m.window.tail
    require(currents.forall(_.range == RangeSpec.Current),
      s"measure ${m.name}: only 'current' ranges may stack above the primary window level")

    val o = primary.order
    val currentKeys = currents.map(_.order)
    val baseGrain = (dims ++ Seq(o) ++ currentKeys).distinct

    val dec = AggDecompose(spark, measureExpr(m.expr), m.name).getOrElse(
      sys.error(s"window measure ${m.name}: expression '${m.expr}' is not decomposable"))

    // 1. collapse to base grain with decomposed partials
    val base = rows
      .groupBy(baseGrain.map(d => dimExprFor(d).as(d)): _*)
      .agg(dec.partials.head.agg, dec.partials.tail.map(_.agg): _*)

    // 2. frame value over the window
    val partitionKeys = (dims.filterNot(_ == o) ++ currentKeys).distinct
    val part = if (partitionKeys.isEmpty) Window.partitionBy() else
      Window.partitionBy(partitionKeys.map(col): _*)
    val w = primary.range match {
      case RangeSpec.Trailing(n, unit) =>
        val days = if (unit == "week") n * 7 else n
        part.orderBy(orderNumber(col(o), unit)).rangeBetween(-(days - 1).toLong, 0L)
      case RangeSpec.Cumulative =>
        part.orderBy(col(o)).rowsBetween(Window.unboundedPreceding, Window.currentRow)
      case RangeSpec.Current =>
        part.orderBy(col(o)).rowsBetween(Window.currentRow, Window.currentRow)
    }
    val valued = base.withColumn(m.name, dec.overWindow(w, identity))

    // 3. semiadditive resolution down to the query grain
    if (baseGrain.toSet == dims.toSet) valued.select(dims.map(col) :+ col(m.name): _*)
    else {
      val resolver = primary.semiadditive.getOrElse("last") match {
        case "last"  => max_by(col(m.name), col(o))
        case "first" => min_by(col(m.name), col(o))
        case other   => sys.error(s"unsupported semiadditive rule '$other'")
      }
      if (dims.isEmpty) valued.agg(resolver.as(m.name))
      else valued.groupBy(dims.map(col): _*).agg(resolver.as(m.name))
    }
  }
}
