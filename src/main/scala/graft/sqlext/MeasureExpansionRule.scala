package graft.sqlext

import graft.api.MetricView
import org.apache.spark.sql.{GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAlias, UnresolvedAttribute, UnresolvedFunction, UnresolvedHaving, UnresolvedOrdinal, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Analyzer rule expanding `MEASURE()` queries over metric-view
  * relations (SURVEY.md §4: "custom analyzer rule (SQL path)").
  *
  * Fires while the tree is still unresolved — the metric-view relation
  * is not a real table, so nothing below the Aggregate can resolve
  * until this rule replaces it. Supported shape (the reference's query
  * contract, README.md:124-141, :402-421):
  *
  *   SELECT <dim | MEASURE(m) | scalar-of-those> ...
  *   FROM <metric view> [alias]  [WHERE <pred over dims>]
  *   [GROUP BY <dims | ordinals>]  [HAVING <pred over MEASURE()/dims>]
  *
  * The rewrite delegates to MetricView.query(dims, measures, where), so
  * rollup routing / baseline fallback / window measures behave exactly
  * as on the DataFrame path; the SELECT list is projected over that
  * expansion (HAVING becomes a Filter between them). ORDER BY / LIMIT /
  * further joins compose naturally above the emitted Project.
  */
class MeasureExpansionRule(spark: SparkSession) extends Rule[LogicalPlan] {

  // top-down so wrappers (Sort / UnresolvedHaving) are seen before the
  // Aggregate they decorate
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsDown {
    case s @ Sort(order, global, UnresolvedHaving(cond, Aggregate(g, a, child, _)), _)
        if hasMeasureCall(order.map(_.child)) =>
      expand(g, a, child, having = Some(cond), sort = Some((order, global))).getOrElse(s)
    case s @ Sort(order, global, Aggregate(g, a, child, _), _)
        if hasMeasureCall(order.map(_.child)) =>
      expand(g, a, child, having = None, sort = Some((order, global))).getOrElse(s)
    case h @ UnresolvedHaving(cond, Aggregate(g, a, child, _)) =>
      expand(g, a, child, having = Some(cond)).getOrElse(h)
    case agg @ Aggregate(groupExprs, aggExprs, child, _) =>
      expand(groupExprs, aggExprs, child, having = None).getOrElse(agg)
    case proj @ Project(projList, child) if hasMeasureCall(projList) =>
      expand(Nil, projList, child, having = None).getOrElse(proj)
  }

  private def isMeasureFn(f: UnresolvedFunction): Boolean =
    f.nameParts.map(_.toLowerCase) == Seq("measure")

  private def hasMeasureCall(exprs: Seq[Expression]): Boolean =
    exprs.exists(_.exists {
      case f: UnresolvedFunction => isMeasureFn(f)
      case _ => false
    })

  /** Unwrap [SubqueryAlias|Filter]* down to an UnresolvedRelation that
    * names a registered view. Returns (view, qualifier names, filters). */
  private def unwrap(p: LogicalPlan, quals: Set[String], filters: Seq[Expression])
      : Option[(MetricView, Set[String], Seq[Expression])] = p match {
    case r: UnresolvedRelation =>
      SqlMetricViews.get(r.multipartIdentifier.last)
        .map(v => (v, quals + r.multipartIdentifier.last, filters))
    case SubqueryAlias(id, c) => unwrap(c, quals + id.name, filters)
    case Filter(cond, c)      => unwrap(c, quals, filters :+ cond)
    case _ => None
  }

  private def expand(
      groupExprs: Seq[Expression],
      outExprs: Seq[NamedExpression],
      child: LogicalPlan,
      having: Option[Expression],
      sort: Option[(Seq[SortOrder], Boolean)] = None): Option[LogicalPlan] =
    unwrap(child, Set.empty, Nil).map { case (view, quals, filters) =>
      val dimNames = view.spec.dimensions.map(_.name).toSet
      val measureNames = view.spec.measures.map(_.name).toSet

      def asDim(e: Expression): Option[String] = e match {
        case ua: UnresolvedAttribute
            if dimNames(ua.nameParts.last) &&
              (ua.nameParts.length == 1 || quals(ua.nameParts.init.mkString("."))) =>
          Some(ua.nameParts.last)
        case UnresolvedOrdinal(i) if i >= 1 && i <= outExprs.length =>
          asDim(stripAlias(outExprs(i - 1)))
        case _ => None
      }

      def dimOf(g: Expression): String = asDim(g).getOrElse(sys.error(
        s"metric view ${view.name}: GROUP BY must reference dimensions " +
          s"(${view.spec.dimensions.map(_.name).mkString(", ")}); got: ${g.sql}"))

      // GROUP BY CUBE / ROLLUP / GROUPING SETS (r11): one
      // BaseGroupingSets node carries every grain — delegate to
      // queryGroupingSets so multi-grain SQL inherits per-grain rollup
      // routing / the native single-pass exactly like the DataFrame path
      val multiGrain: Option[Seq[Seq[String]]] = groupExprs match {
        case Seq(b: BaseGroupingSets) => Some(b.selectedGroupByExprs.map(_.map(dimOf)))
        case _ => None
      }
      val dims =
        if (multiGrain.isDefined) Nil
        else groupExprs.map(dimOf)

      def measuresIn(es: Seq[Expression]): Seq[String] = es.flatMap(_.collect {
        case f: UnresolvedFunction if isMeasureFn(f) =>
          f.arguments match {
            case Seq(ua: UnresolvedAttribute) if measureNames(ua.nameParts.last) =>
              ua.nameParts.last
            case other => sys.error(
              s"MEASURE() takes a single measure name (one of " +
                s"${view.spec.measures.map(_.name).mkString(", ")}); got: $other")
          }
      })
      val measures = (measuresIn(outExprs) ++ measuresIn(having.toSeq) ++
        measuresIn(sort.toSeq.flatMap(_._1.map(_.child)))).distinct

      val where = filters.map(f => s"(${f.sql})").reduceOption(_ + " AND " + _)
      val expanded = GraftBridge.logicalPlan(multiGrain match {
        case Some(sets) => view.queryGroupingSets(sets, measures, where)
        case None       => view.query(dims, measures, where)
      })

      // MEASURE(m) -> column m; grouping_id() -> the expansion's
      // grouping_id column; strip view/alias qualifiers off dims
      def rewrite(e: Expression): Expression = e.transformUp {
        case f: UnresolvedFunction if isMeasureFn(f) =>
          val Seq(ua: UnresolvedAttribute) = f.arguments
          UnresolvedAttribute(Seq(ua.nameParts.last))
        case f: UnresolvedFunction
            if multiGrain.isDefined && f.arguments.isEmpty &&
              f.nameParts.map(_.toLowerCase) == Seq("grouping_id") =>
          UnresolvedAttribute(Seq("grouping_id"))
        // ResolveFunctions may beat this rule to it and resolve the
        // call into the Catalyst GroupingID marker — same rewrite
        case g: GroupingID if multiGrain.isDefined && g.groupByExprs.isEmpty =>
          UnresolvedAttribute(Seq("grouping_id"))
        // grouping(dim): the dim's bit of the expansion's grouping_id
        // (first union dim most significant — the standard), handled in
        // both the unresolved-function and resolved (Grouping) forms
        case f: UnresolvedFunction
            if multiGrain.isDefined && f.arguments.length == 1 &&
              f.nameParts.map(_.toLowerCase) == Seq("grouping") =>
          groupingBit(multiGrain.get, f.arguments.head, asDim)
        case g: Grouping if multiGrain.isDefined =>
          groupingBit(multiGrain.get, g.child, asDim)
        case ua: UnresolvedAttribute
            if ua.nameParts.length > 1 && quals(ua.nameParts.init.mkString(".")) =>
          UnresolvedAttribute(Seq(ua.nameParts.last))
      }

      val filtered = having.fold(expanded)(c => Filter(rewrite(c), expanded))
      // ORDER BY MEASURE(...) sorts below the projection — equivalent
      // (the projection is 1:1) and lets sort refs resolve against the
      // expansion's dim+measure columns even when unselected
      val sorted = sort.fold(filtered) { case (order, global) =>
        Sort(order.map(so => so.copy(child = rewrite(so.child))), global, filtered)
      }
      Project(outExprs.map(ne => rewrite(ne).asInstanceOf[NamedExpression]), sorted)
    }

  /** `grouping(dim)` over the expansion: extract the dim's bit from the
    * grouping_id column (TINYINT like Spark's native `grouping`). */
  private def groupingBit(sets: Seq[Seq[String]], arg: Expression,
      asDim: Expression => Option[String]): Expression = {
    val unionDims = sets.flatten.distinct
    val d = asDim(arg).getOrElse(sys.error(
      s"grouping() takes a dimension; got: ${arg.sql}"))
    val idx = unionDims.indexOf(d)
    require(idx >= 0, s"grouping($d): '$d' is not in any grouping set")
    val shift = unionDims.length - 1 - idx
    Cast(
      BitwiseAnd(
        ShiftRight(UnresolvedAttribute(Seq("grouping_id")), Literal(shift)),
        Literal(1L)),
      org.apache.spark.sql.types.ByteType)
  }

  private def stripAlias(e: Expression): Expression = e match {
    case Alias(c, _) => stripAlias(c)
    case UnresolvedAlias(c, _) => stripAlias(c)
    case other => other
  }
}
