package graft.plan

import org.apache.spark.sql.{Column, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions._

/** Decomposition of a measure expression into partial aggregates + a
  * re-aggregation + a scalar combiner — the same partial/final split
  * Spark's own HashAggregateExec uses, lifted to the semantic layer so
  * that (a) rollup tables store *decomposed* partials (`avg` = sum+count,
  * never an average of averages — SURVEY.md §4 correctness rule) and
  * (b) window measures can frame-aggregate per-order-grain partials
  * instead of raw rows.
  *
  * A measure expr may be any scalar combination of aggregate calls
  * (e.g. `sum(a) / sum(b)`, `avg(x)`, `count_if(p)`); each aggregate
  * node is extracted into a partial. Non-decomposable aggregates
  * (DISTINCT, percentile, ...) yield None — such measures are computed
  * only on the fly and are never routed to rollups.
  */
final case class PartialAgg(
    name: String,
    /** aggregate for the base/rollup grain, e.g. sum(x) */
    agg: Column,
    /** re-aggregation over stored partials — must be a bare aggregate
      * function so `.over(window)` applies to it directly */
    reagg: String => Column,
    /** scalar post-step applied AFTER re-aggregation/windowing (e.g.
      * coalesce(count, 0)); wrapping it inside `.over` would hoist the
      * inner aggregate out of the frame */
    post: Column => Column = identity)

final case class Decomposed(partials: Seq[PartialAgg], combiner: Map[String, Column] => Column) {
  /** Re-aggregate stored partials in a groupBy and combine. `colName`
    * maps partial name → stored column name. */
  def reaggregate(colName: String => String): Column =
    combiner(partials.map(p => p.name -> p.post(p.reagg(colName(p.name)))).toMap)

  /** Frame-aggregate partials over a window spec and combine. */
  def overWindow(w: org.apache.spark.sql.expressions.WindowSpec, colName: String => String): Column =
    combiner(partials.map(p => p.name -> p.post(p.reagg(colName(p.name)).over(w))).toMap)

  /** Combine when the stored grain IS the query grain: each group holds
    * exactly one partial row, so re-aggregation is the identity and the
    * combiner applies straight to the stored partial columns. */
  def finalizeAtGrain(colName: String => String): Column =
    combiner(partials.map(p => p.name -> p.post(col(colName(p.name)))).toMap)
}

object AggDecompose {

  /** Decompose `exprSql` (already in source terms; callers rewrite join
    * dot-paths first). `prefix` namespaces the partial column names. */
  def apply(spark: SparkSession, parsed: Expression, prefix: String): Option[Decomposed] = {
    val partials = scala.collection.mutable.ArrayBuffer[PartialAgg]()
    var ok = true

    def fresh(agg: Column, reagg: String => Column,
        post: Column => Column = identity): UnresolvedAttribute = {
      val nm = AggDecompose.partialName(agg)
      // content-addressed names make equal partials IDENTICAL across
      // measures (and within one), so dedup is just name-distinct —
      // but a same-name hit must BE the same aggregate (the same loud
      // collision guard as distinctPartials; a silent 32-bit collision
      // would bind this partial to another's column)
      partials.find(_.name == nm) match {
        case Some(existing) =>
          AggDecompose.requireSameAggregate(nm, colExpr(agg),
            AggDecompose.unaliased(existing.agg))
        case None =>
          partials += PartialAgg(nm, agg.as(nm), reagg, post)
      }
      UnresolvedAttribute(Seq(nm))
    }

    val template = parsed.transformUp {
      case f: UnresolvedFunction =>
        val fname = f.nameParts.last.toLowerCase
        val args = f.arguments.map(GraftBridge.column)
        if (f.isDistinct && aggNames(fname)) { ok = false; f }
        else fname match {
          case "sum" =>
            fresh(sum(args.head), c => sum(col(c)))
          case "count" =>
            // count(*) parses to count(1); count never null after re-agg
            val partial =
              if (f.arguments.isEmpty) count(lit(1)) else count(args.head)
            fresh(partial, c => sum(col(c)), post = coalesce(_, lit(0L)))
          case "min" => fresh(min(args.head), c => min(col(c)))
          case "max" => fresh(max(args.head), c => max(col(c)))
          case "avg" | "mean" =>
            val s = fresh(sum(args.head), c => sum(col(c)))
            val n = fresh(count(args.head), c => sum(col(c)), post = coalesce(_, lit(0L)))
            // avg = sum/count, null (not error) on empty — matches avg()
            UnresolvedFunction(
              Seq("divide_null_safe_graft"), Seq(s, n), isDistinct = false)
          case "count_if" =>
            fresh(
              sum(when(args.head, 1L).otherwise(0L)),
              c => sum(col(c)), post = coalesce(_, lit(0L)))
          case "hll_sketch_agg" if f.arguments.length == 1 =>
            // the 100 TB answer to distinct counts: HLL sketches are
            // STORABLE, MERGEABLE partials (register-max union is exact
            // over unions of inputs), so approx-distinct measures route
            // through rollups — unlike count(DISTINCT), which refuses.
            // The scalar hll_sketch_estimate stays in the combiner
            // template and applies after re-aggregation.
            fresh(hll_sketch_agg(args.head), c => hll_union_agg(col(c)))
          case "graft_hll_agg" if f.arguments.length == 1 =>
            // the engine-owned HLL (same routing/fold story as above,
            // but PolyHash61-hashed → fully DuckDB-oracled; the scalar
            // graft_hll_estimate stays in the combiner template)
            fresh(graft.functions.GraftHll.agg(args.head),
              c => graft.functions.GraftHll.merge(col(c)))
          case "graft_topk" if f.arguments.length == 3 =>
            // heavy hitters route as well: the SpaceSaving counter state
            // is a storable binary partial whose merge is counter-wise
            // sum (exact while per-group distinct ≤ capacity, bounded-
            // error beyond), so top-k measures decompose like HLL —
            // partial graft_topk_agg, re-agg graft_topk_merge, and the
            // (cnt desc, item asc) extract stays in the combiner.
            val stAttr = fresh(
              graft.functions.GraftTopK.agg(args(0), args(2)),
              c => graft.functions.GraftTopK.merge(col(c)))
            UnresolvedFunction(Seq("graft_topk_extract"),
              Seq(stAttr, f.arguments(1)), isDistinct = false)
          case "graft_percentile_bounded" if f.arguments.length == 5 =>
            // approx-percentile routes too: the bounded-range histogram
            // partial is a storable array<bigint> of bin counts whose
            // merge (element-wise add) is EXACT over unions, so the
            // measure decomposes like HLL — partial graft_hist_agg,
            // re-agg graft_hist_merge, and the interpolating
            // graft_hist_quantile stays in the combiner template.
            // (Exact `percentile`/`median` stay non-decomposable below
            // — this is their declared-domain routable counterpart.)
            val histAttr = fresh(
              graft.functions.GraftHistogram.agg(
                args(0), args(2), args(3), args(4)),
              c => graft.functions.GraftHistogram.merge(col(c)))
            UnresolvedFunction(Seq("graft_hist_quantile"),
              Seq(histAttr, f.arguments(1), f.arguments(2), f.arguments(3)),
              isDistinct = false)
          case _ if aggNames(fname) => { ok = false; f }
          case _ => f // scalar function — leave in the combiner template
        }
    }
    if (!ok || partials.isEmpty) None
    else Some(Decomposed(partials.toSeq, substitute(template)))
  }

  /** Rewrite the variance family — `stddev`/`stddev_samp`/`variance`/
    * `var_samp`/`stddev_pop`/`var_pop` — into its exact algebraic
    * (n, Σx, Σx²) form BEFORE decomposition or evaluation:
    *
    *   var_samp(x) = (Σx² − (Σx)²/n) / (n−1),  null when n < 2
    *
    * spelled as `count`/`sum`/`sum(x*x)` aggregates under one scalar
    * combiner, so (a) the decomposer's existing sum/count cases make
    * variance a ROUTABLE measure for free — the three partials are
    * storable, summable rollup columns (shared content-addressed with
    * any avg/sum over the same column) and the same partials window —
    * and (b) every evaluation path computes ONE deterministic formula:
    * for decimal inputs the partial sums are exact (order-independent),
    * floating point enters only in the final fixed double expression,
    * so results are bit-identical across cluster sizes and engines —
    * unlike Spark's native Welford-style `StddevSamp`, whose
    * double-accumulator result depends on row order and can never be
    * hash-oracled. The (Σx², Σx) cancellation risk of textbook-form
    * variance is clamped by `greatest(0, ·)` (mirrored in oracles).
    * Population variants divide by n (null when n < 1). */
  def rewriteVariance(spark: SparkSession, parsed: Expression): Expression = {
    val parser = spark.sessionState.sqlParser
    parsed.transformUp {
      case f: UnresolvedFunction
          if f.arguments.length == 1 && !f.isDistinct &&
            f.nameParts.length == 1 &&
            varianceFns(f.nameParts.head.toLowerCase) =>
        val fname = f.nameParts.head.toLowerCase
        val pop = fname.endsWith("_pop")
        val minN = if (pop) "1" else "2"
        val div = if (pop) "count(__gx)" else "(count(__gx) - 1)"
        val core = "(cast(sum(__gx * __gx) as double) - " +
          "cast(sum(__gx) as double) * cast(sum(__gx) as double) / count(__gx)) / " + div
        val clamped = s"greatest(cast(0.0 as double), $core)"
        val body = if (fname.startsWith("stddev")) s"sqrt($clamped)" else clamped
        parser.parseExpression(
          s"case when count(__gx) >= $minN then $body else cast(null as double) end")
          .transformUp {
            case ua: UnresolvedAttribute if ua.nameParts == Seq("__gx") =>
              f.arguments.head
          }
    }
  }

  private val varianceFns = Set(
    "stddev", "stddev_samp", "variance", "var_samp", "stddev_pop", "var_pop")

  /** Build the combiner: substitute partial-name attributes in the
    * template with the caller's re-aggregated columns. */
  private def substitute(template: Expression)(cols: Map[String, Column]): Column = {
    val substituted = template.transformUp {
      case ua: UnresolvedAttribute if ua.nameParts.length == 1 && cols.contains(ua.nameParts.head) =>
        colExpr(cols(ua.nameParts.head))
      case f: UnresolvedFunction if f.nameParts == Seq("divide_null_safe_graft") =>
        val Seq(s, n) = f.arguments
        val sc = GraftBridge.column(s)
        val nc = GraftBridge.column(n)
        colExpr(sc / nullif(nc, lit(0L)))
    }
    GraftBridge.column(substituted)
  }

  private def colExpr(c: Column): Expression = {
    // Column → Expression without a SparkSession: go through the active one
    val spark = org.apache.spark.sql.SparkSession.active
    GraftBridge.expression(spark, c)
  }

  /** Content-addressed stored-column name for a partial aggregate:
    * a readable slug of the expression plus the canonicalized
    * expression's semantic hash. Two measures that need the same
    * partial (p50/p95 over one histogram; a sum measure next to an
    * avg of the same column) thus name the same column — rollups
    * store it ONCE and consumers dedup by name alone
    * ([[distinctPartials]]). Deterministic across sessions (case-class
    * structural hashing, no expr-ids in unresolved trees), so a rollup
    * written in one session resolves in the next. */
  private[graft] def partialName(agg: Column): String = {
    val e = colExpr(agg)
    val slug = (try e.sql catch { case scala.util.control.NonFatal(_) => "partial" })
      .toLowerCase.replaceAll("[^a-z0-9]+", "_").replaceAll("^_+|_+$", "").take(40)
    f"gp_${slug}__${e.semanticHash() & 0xffffffffL}%08x"
  }

  /** Order-preserving name-dedup of partials collected across measures,
    * with a loud guard: same-named partials must be semantically equal
    * aggregates — turns a (vanishingly unlikely) 32-bit hash collision
    * into an error instead of silently serving one measure from
    * another's partial. */
  def distinctPartials(ps: Seq[PartialAgg]): Seq[PartialAgg] = {
    ps.groupBy(_.name).values.filter(_.size > 1).foreach { g =>
      val e0 = unaliased(g.head.agg)
      g.tail.foreach(p => requireSameAggregate(p.name, unaliased(p.agg), e0))
    }
    val seen = scala.collection.mutable.Set[String]()
    ps.filter(p => seen.add(p.name))
  }

  /** Compare under the alias: Alias exprIds are instance-unique and not
    * normalized by semanticEquals, but partial names are hashed
    * pre-alias — shared by both collision guards ([[distinctPartials]]
    * and the within-measure check in the decomposer). */
  private def unaliased(c: Column): Expression = colExpr(c) match {
    case a: org.apache.spark.sql.catalyst.expressions.Alias => a.child
    case e => e
  }

  private def requireSameAggregate(name: String, a: Expression, b: Expression): Unit =
    require(a.semanticEquals(b),
      s"partial name collision: '$name' names two different aggregates")

  private val aggNames = Set(
    "sum", "count", "min", "max", "avg", "mean", "count_if",
    "first", "last", "collect_list", "collect_set", "stddev", "variance",
    "stddev_samp", "var_samp", "percentile", "median", "approx_count_distinct",
    "first_value", "last_value", "any_value", "max_by", "min_by",
    "hll_sketch_agg", "hll_union_agg", "graft_hll_agg", "graft_hll_merge",
    "graft_percentile_bounded", "graft_hist_agg", "graft_hist_merge",
    "graft_topk", "graft_topk_agg", "graft_topk_merge")
}
