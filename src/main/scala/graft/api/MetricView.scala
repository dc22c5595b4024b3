package graft.api

import graft.plan.{AggDecompose, Expander, WindowPlanner}
import graft.spec._
import org.apache.spark.sql.{Column, DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions._

/** A registered metric view: the engine's queryable semantic object
  * (reference README.md:122-141 — `SELECT dims, MEASURE(m) FROM mv
  * GROUP BY dims`).
  *
  * `query(dims, measures, where)` is the DataFrame-native equivalent of
  * the MEASURE() SQL (the SQL path itself is in graft.sqlext). The plan
  * it builds is fully lazy/composable; source selection implements the
  * reference's routing ladder (README.md:399-431): aggregated rollup ≫
  * unaggregated baseline cache ≫ raw source, with window measures never
  * routed to rollups.
  */
final class MetricView(
    val name: String,
    val spec: MetricViewSpec,
    catalog: MetricViewCatalog,
    /** CREATE VIEW ... COMMENT '...' (reference macro :84) */
    val comment: Option[String] = None,
    /** The YAML text the spec was parsed from — kept verbatim so the
      * catalog can persist and replay the view (save/load round-trip);
      * the YAML is the durable contract, the parsed spec is derived. */
    private[graft] val yamlSource: String = "") {

  private def spark: SparkSession = catalog.spark

  /** Catalog this view is registered in (SQL DDL routes drop/describe
    * through the owning catalog). */
  private[graft] def owner: MetricViewCatalog = catalog
  private val paths = Expander.joinPaths(spec.joins).map(_._1)

  /** Observed-range domain for auto-domained percentile measures (r9,
    * VERDICT r8 stretch 9): `graft_percentile_auto(x, q, bins)`
    * rewrites to `graft_percentile_bounded(x, q, lo, hi, bins)` with
    * `[lo, hi) = [floor(min x), floor(max x) + 1)` derived from the
    * view's row-level relation — the profile card's min/max stat. The
    * derivation is ONE min/max pass over that relation (an honest scan,
    * not metadata — at a 100 TB posture it belongs with the other
    * offline profile stats), so it is cached JVM-wide keyed by
    * (spec hash, input expr, data identity): the catalog's CREATE-time
    * validation probe, the retained instance, and any re-instantiation
    * of the same spec all share one derivation, and rollup build and
    * direct evaluation bake the SAME literals — routed == direct by
    * construction, and the clamping risk of a mis-DECLARED domain is
    * designed out. Integer-snapped bounds keep the literals stable;
    * data drifting outside a previously-built rollup's domain still
    * surfaces via the histogram's clamped-count slot.
    *
    * The data identity (ADVICE r9): the spec hash covers only the
    * spec, so the same spec instantiated over a DIFFERENT data
    * directory — or re-evaluated after the files changed — must not
    * silently reuse the first-derived bounds (clamped, oracle-
    * diverging percentiles). The key therefore also carries a digest
    * of the row-level relation's leaf file names — a metadata-scale
    * listing; every parquet rewrite generates fresh part names, so
    * refreshed data re-derives. Non-file sources digest the empty
    * list and keep the spec-keyed behavior. */
  private def autoDomain(inputSql: String): (Double, Double) = {
    val rows = Expander.rowLevel(spark, spec, catalog.resolve, Seq(inputSql))
    val dataKey = java.security.MessageDigest.getInstance("MD5")
      .digest(rows.inputFiles.sorted.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    MetricView.autoDomains.computeIfAbsent(
      (spec.materializationHash, inputSql, dataKey), { _ =>
        val c = GraftBridge.column(Expander.rewriteExpr(Expander.parse(spark, inputSql), paths))
        val r = rows.agg(floor(min(c)).cast("double").as("lo"),
          (floor(max(c)) + lit(1)).cast("double").as("hi")).head()
        if (r.isNullAt(0) || r.isNullAt(1)) (0.0, 1.0)
        else (r.getDouble(0), r.getDouble(1))
      })
  }

  /** Measure expr rewritten into (flat) source terms; auto-domained
    * percentiles resolve to bounded ones first (see [[autoDomain]]). */
  private[graft] def measureExpr(exprSql: String): Expression = {
    val parsed = Expander.parse(spark, exprSql).transformUp {
      case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
          if f.nameParts.map(_.toLowerCase) == Seq("graft_percentile_auto") &&
            f.arguments.length == 3 =>
        val (lo, hi) = autoDomain(f.arguments.head.sql)
        f.copy(nameParts = Seq("graft_percentile_bounded"),
          arguments = Seq(f.arguments(0), f.arguments(1),
            org.apache.spark.sql.catalyst.expressions.Literal(lo),
            org.apache.spark.sql.catalyst.expressions.Literal(hi),
            f.arguments(2)))
    }
    // variance-family aggregates rewrite to their exact algebraic
    // (n, Σx, Σx²) form first — routable partials + a deterministic
    // double combiner on every path (see AggDecompose.rewriteVariance)
    Expander.rewriteExpr(AggDecompose.rewriteVariance(spark, parsed), paths)
  }

  private[graft] def decomposed(m: Measure): Option[graft.plan.Decomposed] =
    AggDecompose(spark, measureExpr(m.expr), m.name)

  /** Raw source columns (flat names) referenced by the given measures —
    * what an unaggregated baseline must store besides the dims. */
  private[graft] def measureInputColumns(ms: Seq[Measure]): Seq[String] = {
    val dimNames = spec.dimensions.map(_.name).toSet
    ms.flatMap { m =>
      measureExpr(m.expr).collect {
        case ua: UnresolvedAttribute if ua.nameParts.length == 1 => ua.nameParts.head
      }
    }.distinct.filterNot(dimNames.contains)
  }

  /** Dimension names referenced by a query-level WHERE. */
  private def whereDims(whereSql: String): Seq[String] = {
    val dimNames = spec.dimensions.map(_.name).toSet
    Expander.parse(spark, whereSql).collect {
      case ua: UnresolvedAttribute if ua.nameParts.length == 1 && dimNames(ua.nameParts.head) =>
        ua.nameParts.head
    }.distinct
  }

  /** Query the view: group by `dims`, evaluate `measures`, optional
    * `where` over dimension names. */
  def query(dims: Seq[String], measures: Seq[String], where: Option[String] = None): DataFrame = {
    dims.foreach(spec.dimension)
    val ms = measures.map(spec.measure)
    val (windowMs, plainMs) = ms.partition(_.isWindowed)

    if (ms.isEmpty) { // dims-only query: the distinct dimension space
      val (rows, dimFor, _) = rowsFor(dims, Nil, where)
      return rows.select(dims.map(d => dimFor(d).as(d)): _*).distinct()
    }

    val parts = scala.collection.mutable.ArrayBuffer[DataFrame]()

    // window measures sharing a frame key (order column + reset keys)
    // share ONE base-grain partial aggregate and ONE window stage —
    // k measures over one order column must not cost k scans
    val frameKeys = windowMs.map(WindowPlanner.frameKey).distinct
    val windowGroups = frameKeys.map(k => windowMs.filter(m => WindowPlanner.frameKey(m) == k))

    // plain measures: rollup route ≫ folded into a window base ≫
    // baseline ≫ raw. Folding is free (the partials ride the window
    // group's base aggregate) but only valid when every plain measure
    // decomposes and no rollup can serve them.
    val routed =
      if (plainMs.isEmpty) None
      else catalog.materializer.flatMap(
        _.route(this, dims, plainMs, where, where.toSeq.flatMap(whereDims)))
    val foldedPlain =
      if (routed.isEmpty && windowGroups.nonEmpty && plainMs.forall(decomposed(_).isDefined))
        plainMs
      else Nil
    if (plainMs.nonEmpty && foldedPlain.isEmpty)
      parts += routed.getOrElse(aggregateFromRows(dims, plainMs, where))

    // window measures: frame math always runs on the fly, but the
    // base-grain collapse ROUTES through a rollup when one stores the
    // needed partials at a covering grain (Materializer.windowBase,
    // r11) — the reference's never-route rule (README.md:431) exists
    // because its rollups store finalized measures; ours store
    // mergeable partials, which makes the route semantically invisible
    windowGroups.zipWithIndex.foreach { case (group, gi) =>
      val fold = if (gi == 0) foldedPlain else Nil
      val baseGrain = (dims ++ group.head.window.map(_.order)).distinct
      val neededPartials = graft.plan.AggDecompose.distinctPartials(
        (group ++ fold).flatMap(m => decomposed(m).toSeq.flatMap(_.partials)))
        .map(_.name)
      val routedBase = catalog.materializer.flatMap(_.windowBase(
        this, baseGrain, neededPartials, where, where.toSeq.flatMap(whereDims)))
      parts += (routedBase match {
        case Some(pre) =>
          WindowPlanner.planShared(spark, spec, group, fold, dims, pre,
            d => col(d), measureExpr, preAggregated = true)
        case None =>
          val (rows, dimFor, mExpr) = rowsFor(dims, group ++ fold, where,
            extraDims = group.head.window.map(_.order))
          WindowPlanner.planShared(spark, spec, group, fold, dims, rows, dimFor, mExpr)
      })
    }

    val joined = parts.reduceLeft(joinParts(dims))
    // stable output column order: dims, then measures as requested
    joined.select((dims ++ measures).map(col): _*)
  }

  /** Gap-filled (date-spine) variant of [[query]]: densify the result
    * over a complete calendar of `spine.dateDim` values so time-grain
    * output has one row per period per dimension combination, with
    * per-measure fill rules for the periods the data skips — the
    * metrics-layer companion every BI consumer of a sparse time series
    * needs (a daily chart with missing days reads as data loss; a
    * carry-forward balance must repeat, not vanish).
    *
    * Mechanics: evaluate the query normally, then LEFT-join it onto
    * (distinct other-dim combos) × (dense calendar). The calendar spans
    * the observed [min, max] of the date dim over the (filtered)
    * row-level relation — one narrow column scan, same posture as the
    * auto-domain derivation. Fills: `zeroFill` measures coalesce to 0
    * in their native type; `ffill` measures carry the last non-null
    * value forward per combo in date order (the right rule for
    * cumulative/semiadditive measures); untouched measures stay null.
    *
    * Contract: the date dim's values must sit AT the grain (day dates
    * for `day`, month-start dates for `month`, year-start for `year`) —
    * gap fill densifies a series, it does not re-bucket one; off-grain
    * values would not match the calendar and their rows would drop.
    *
    * Scale: the densified frame is (combos × periods) — result-grain,
    * never fact-grain. The ffill window partitions by the combo dims;
    * with no other dims the single partition holds one calendar of
    * rows, bounded by the spine length. */
  def querySpine(
      dims: Seq[String],
      measures: Seq[String],
      spine: SpineSpec,
      where: Option[String] = None): DataFrame = {
    require(dims.contains(spine.dateDim),
      s"spine date dim '${spine.dateDim}' must be one of the query dims")
    val step = spine.grain match {
      case "day" | "month" | "year" => expr(s"interval 1 ${spine.grain}")
      case g => sys.error(s"unsupported spine grain '$g' (day/month/year)")
    }
    (spine.zeroFill ++ spine.ffill).foreach { m =>
      require(measures.contains(m), s"fill rule for '$m' which is not queried") }

    // cached: the result frame feeds the bounds derivation below, the
    // combo distinct AND the densify join, and aliased subplans are
    // not deduped by ReuseExchange — without the cache the source
    // would scan three times. Registered for 2 actions: the internal
    // bounds head() and the caller's terminal action (which consumes
    // both remaining references in one plan). Result-grain rows, so
    // the cache is small.
    val result = graft.ops.Persists.cacheFor(query(dims, measures, where), 2)

    // observed bounds from the CACHED result itself: the date dim is a
    // group key, so its min/max over the result equals its min/max
    // over the (filtered) rows — no second source scan; the 1-row
    // collect is metadata and warms the cache for the joins below
    val b = result.agg(min(col(spine.dateDim)).as("lo"),
      max(col(spine.dateDim)).as("hi")).head()
    if (b.isNullAt(0)) {
      // no rows at all: nothing to densify. Drop the cache now — the
      // joins that would have consumed the second registration never
      // build, and recomputing an empty result is cheap (ADVICE r10).
      result.unpersist()
      return result
    }

    val cal = spark.range(1).select(
      explode(sequence(lit(b.get(0)), lit(b.get(1)), step)).as(spine.dateDim))
    val others = dims.filterNot(_ == spine.dateDim)
    val dense =
      if (others.isEmpty) cal
      else result.select(others.map(col): _*).distinct().crossJoin(cal)

    // alias both sides: `dense` derives from `result` (the combos), so
    // unqualified refs are ambiguous under Spark's self-join check
    val dn = dense.alias("gspine_dense"); val rs = result.alias("gspine_res")
    val cond = dims.map(d => col(s"gspine_dense.$d") <=> col(s"gspine_res.$d")).reduce(_ && _)
    val joined = dn.join(rs, cond, "left")
      .select(dims.map(d => col(s"gspine_dense.$d")) ++
        measures.map(m => col(s"gspine_res.$m")): _*)

    val zeroed = spine.zeroFill.foldLeft(joined) { (df, m) =>
      df.withColumn(m, coalesce(col(m), lit(0).cast(df.schema(m).dataType))) }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(others.map(col): _*).orderBy(col(spine.dateDim))
      .rowsBetween(Long.MinValue, 0)
    val filled = spine.ffill.foldLeft(zeroed) { (df, m) =>
      df.withColumn(m, last(col(m), ignoreNulls = true).over(w)) }
    filled.select((dims ++ measures).map(col): _*)
  }

  /** Null-safe equi-join of result parts on the dim columns. */
  private def joinParts(dims: Seq[String])(l: DataFrame, r: DataFrame): DataFrame =
    if (dims.isEmpty) l.crossJoin(r)
    else {
      val rKeep = r.columns.filterNot(dims.contains)
      val la = l.alias("l"); val ra = r.alias("r")
      val cond = dims.map(d => col(s"l.$d") <=> col(s"r.$d")).reduce(_ && _)
      la.join(ra, cond, "inner")
        .select(l.columns.map(c => col(s"l.$c")) ++ rKeep.map(c => col(s"r.$c")): _*)
    }

  /** Row-level input + resolvers, from baseline cache if built else the
    * raw expansion. Returns (rows, dimName→Column, measureSql→Expression). */
  private[graft] def rowsFor(
      dims: Seq[String],
      ms: Seq[Measure],
      where: Option[String],
      extraDims: Seq[String] = Nil): (DataFrame, String => Column, String => Expression) = {
    val baseline = catalog.materializer.flatMap(_.baseline(this))
    baseline match {
      case Some(df) =>
        val rows = where.fold(df)(w => df.filter(Expander.dimFilter(spark, identitySpec, w)))
        (rows, d => col(d), measureExpr)
      case None =>
        val filterDims = where.toSeq.flatMap(whereDims)
        val needed = (dims ++ extraDims ++ filterDims).distinct
          .map(spec.dimension(_).expr) ++ ms.map(_.expr)
        val raw = Expander.rowLevel(spark, spec, catalog.resolve, needed)
        val rows = where.fold(raw)(w => raw.filter(Expander.dimFilter(spark, spec, w)))
        (rows, d => Expander.dimCol(spark, spec, d), measureExpr)
    }
  }

  /** Multi-grain (GROUPING SETS) query: evaluate `measures` at every
    * grain in `sets` and union the results — each output row carries
    * every union dim (null where aggregated away) plus a standard
    * `grouping_id` (bit i set when union dim i is aggregated away,
    * first dim most significant — Spark's `grouping_id()` and SQL
    * GROUPING() convention), so a dashboard reads one frame for the
    * detail grain, subtotals, and the grand total.
    *
    * Two plans, chosen by rollup coverage:
    *  - **all sets rollup-covered** → per-set [[query]] union: every
    *    grain re-aggregates rollup partials (count/sum/HLL/topk/
    *    histogram/variance partials are all summable), so k grains
    *    cost k rollup-scale aggregates and the fact table is never
    *    scanned — the multi-grain analogue of A10 routing.
    *  - **otherwise** → ONE native grouping-sets pass over the
    *    row-level relation (Spark's partial-aggregate grouping-set
    *    expansion): one fact scan and one shuffle serve every grain
    *    simultaneously; per-set delegation here would scan the fact
    *    k times, exactly the 100 TB mistake.
    * Window measures always take the per-set path (their frame depends
    * on the grain; rollups never serve them anyway). */
  def queryGroupingSets(
      sets: Seq[Seq[String]],
      measures: Seq[String],
      where: Option[String] = None): DataFrame = {
    require(sets.nonEmpty, "at least one grouping set")
    val unionDims = sets.flatten.distinct
    unionDims.foreach(spec.dimension)
    val ms = measures.map(spec.measure)
    sets.foreach(s => require(s.distinct == s, s"duplicate dim in grouping set $s"))

    def gidOf(set: Seq[String]): Long =
      unionDims.zipWithIndex.map { case (d, i) =>
        if (set.contains(d)) 0L else 1L << (unionDims.length - 1 - i)
      }.sum

    val allRouted = catalog.materializer.exists(m =>
      ms.forall(!_.isWindowed) &&
        sets.forall(s => m.route(this, s, ms, where,
          where.toSeq.flatMap(whereDims)).isDefined))
    if (allRouted || ms.exists(_.isWindowed)) {
      // per-set union; dim types come from the widest grain's schema
      // (lazy — analysis only, no job)
      val widest = query(unionDims, measures, where)
      val dimType = unionDims.map(d => d -> widest.schema(d).dataType).toMap
      val parts = sets.map { set =>
        val q = if (set == unionDims) widest else query(set, measures, where)
        val filled = unionDims.filterNot(set.contains).foldLeft(q)(
          (df, d) => df.withColumn(d, lit(null).cast(dimType(d))))
        filled.withColumn("grouping_id", lit(gidOf(set)))
          .select(((unionDims :+ "grouping_id") ++ measures).map(col): _*)
      }
      parts.reduce(_ unionByName _)
    } else {
      val (rows, dimFor, mExpr) = rowsFor(unionDims, ms, where)
      val aggCols = ms.map(m => GraftBridge.column(mExpr(m.expr)).as(m.name))
      // materialize dim exprs as named columns first: groupingSets
      // matches set entries against the grouping columns by attribute,
      // so both must reference the SAME resolved column (fresh .as()
      // aliases would read as distinct grouping expressions)
      val withDims = unionDims.foldLeft(rows)(
        (df, d) => df.withColumn(s"__gs_$d", dimFor(d)))
      withDims.groupingSets(
          sets.map(_.map(d => col(s"__gs_$d"))),
          unionDims.map(d => col(s"__gs_$d")): _*)
        .agg(grouping_id().as("grouping_id"), aggCols: _*)
        .select(unionDims.map(d => col(s"__gs_$d").as(d))
          ++ (col("grouping_id") +: measures.map(col)): _*)
    }
  }

  /** CUBE sugar: [[queryGroupingSets]] over every subset of `dims`
    * (2^n grains, detail grain first). */
  def queryCube(dims: Seq[String], measures: Seq[String],
      where: Option[String] = None): DataFrame = {
    require(dims.size <= 10, s"cube over ${dims.size} dims is 2^${dims.size} grains")
    val sets = ((1 << dims.size) - 1 to 0 by -1).map(mask =>
      dims.zipWithIndex.collect { case (d, i) if (mask & (1 << (dims.size - 1 - i))) != 0 => d })
    queryGroupingSets(sets, measures, where)
  }

  /** ROLLUP sugar: [[queryGroupingSets]] over the prefixes of `dims`,
    * detail grain down to the grand total. */
  def queryRollup(dims: Seq[String], measures: Seq[String],
      where: Option[String] = None): DataFrame =
    queryGroupingSets((dims.size to 0 by -1).map(dims.take), measures, where)

  /** Spec whose dims are identity over their own names — used to filter
    * baseline/rollup tables where dims are already materialized columns. */
  private lazy val identitySpec: MetricViewSpec =
    spec.copy(dimensions = spec.dimensions.map(d => d.copy(expr = d.name)), joins = Nil)

  private def aggregateFromRows(dims: Seq[String], ms: Seq[Measure], where: Option[String]): DataFrame = {
    val (rows, dimFor, mExpr) = rowsFor(dims, ms, where)
    val aggCols = ms.map(m => GraftBridge.column(mExpr(m.expr)).as(m.name))
    rows.groupBy(dims.map(d => dimFor(d).as(d)): _*)
      .agg(aggCols.head, aggCols.tail: _*)
  }

  /** The fully expanded row-level relation with every dimension and all
    * measure input columns — the shape an `unaggregated` baseline stores. */
  private[graft] def baselineFrame: DataFrame = {
    val needed = spec.dimensions.map(_.expr) ++ spec.measures.map(_.expr)
    val rows = Expander.rowLevel(spark, spec, catalog.resolve, needed)
    val dimCols = spec.dimensions.map(d => Expander.dimCol(spark, spec, d.name))
    val dimNames = spec.dimensions.map(_.name).toSet
    val inputCols = measureInputColumns(spec.measures).filterNot(dimNames.contains).map(col)
    rows.select(dimCols ++ inputCols: _*)
  }
}

/** Gap-fill request for [[MetricView.querySpine]]: densify over
  * `dateDim` at `grain` (day/month/year); `zeroFill` measures read 0 on
  * missing periods, `ffill` measures carry the last value forward. */
final case class SpineSpec(
    dateDim: String,
    grain: String,
    zeroFill: Seq[String] = Nil,
    ffill: Seq[String] = Nil)

object MetricView {
  /** JVM-wide auto-domain cache keyed by (spec hash, input expr, data
    * identity) — see [[MetricView.autoDomain]]: one observed-range
    * derivation per distinct spec/input/data, shared across probe and
    * retained instances. */
  private[api] val autoDomains =
    new java.util.concurrent.ConcurrentHashMap[(String, String, String), (Double, Double)]()
}

/** In-memory registry of metric views + lifecycle ops (reference S5-S8:
  * create/drop/describe/refresh — macros/generate_metric_views.sql:80-91,
  * macros/drop_metric_views.sql:19-23, scripts/refresh_metric_views.py).
  */
final class MetricViewCatalog(
    val spark: SparkSession,
    val resolve: String => DataFrame,
    materializationDir: Option[String] = None,
    /** Streaming view of a source table's NEW rows (by source name),
      * when the source is append-only — enables incremental refresh. */
    streamSource: String => Option[DataFrame] = _ => None) {

  private val views = scala.collection.mutable.LinkedHashMap[String, MetricView]()
  private[graft] val materializer: Option[graft.mat.Materializer] =
    materializationDir.map(new graft.mat.Materializer(_, resolve))
  private[graft] val incremental: Option[graft.streaming.IncrementalMaterializer] =
    materializationDir.map(d =>
      new graft.streaming.IncrementalMaterializer(spark, d, s"$d/_checkpoints", resolve))

  /** Make this catalog the target of SQL `CREATE ... WITH METRICS` on
    * its session. Called once construction is complete (binding in the
    * middle of the constructor would publish a partially-initialized
    * `this` — ADVICE r3); call again to take the binding over from a
    * later-constructed catalog on the same session. */
  def bind(): this.type = { graft.sqlext.SqlMetricViews.bindCatalog(this); this }

  bind() // default SQL CREATE target for this session (last field is initialized above)

  /** CREATE OR REPLACE (not drop+create): an unchanged spec keeps its
    * materialization caches — reference macros/generate_metric_views
    * .sql:78-79. */
  def createOrReplace(name: String, yaml: String, comment: Option[String] = None): MetricView = {
    // the persistent catalog resolves "<name>.yaml" under its dir, so a
    // name is also a (relative) file name: reject anything that could
    // escape the catalog directory on save/load (ADVICE r7)
    MetricViewCatalog.requireSafeName(name)
    val spec = YamlParser.parse(yaml)
    validate(name, spec)
    val view = new MetricView(name, spec, this, comment, yaml)
    val specChanged = views.get(name).exists(_.spec.materializationHash != spec.materializationHash)
    if (specChanged) materializer.foreach(_.invalidate(view))
    views(name) = view
    graft.sqlext.SqlMetricViews.register(view) // SQL MEASURE() path
    view
  }

  /** Validate every dimension/measure expr resolves against the expanded
    * source schema — fail at CREATE time like Databricks does. */
  private def validate(name: String, spec: MetricViewSpec): Unit = {
    val probe = new MetricView(name, spec, this)
    val needed = spec.dimensions.map(_.expr) ++ spec.measures.map(_.expr)
    val rows = Expander.rowLevel(spark, spec, resolve, needed)
    // resolving the full projection + a global aggregate forces analysis
    val dimCols = spec.dimensions.map(d => Expander.dimCol(spark, spec, d.name))
    rows.select(dimCols: _*).schema // throws AnalysisException on bad dim exprs
    val aggCols = spec.measures.filterNot(_.isWindowed)
      .map(m => GraftBridge.column(probe.measureExpr(m.expr)).as(m.name))
    if (aggCols.nonEmpty) rows.groupBy().agg(aggCols.head, aggCols.tail: _*).schema
    spec.measures.filter(_.isWindowed).foreach { m =>
      m.window.map(_.order).foreach(spec.dimension) // order cols must be dims
      require(WindowPlanner.supported(spark, spec, m),
        s"window measure ${m.name} is not plannable (non-decomposable expr or bad stack)")
    }
  }

  def get(name: String): MetricView =
    views.getOrElse(name, sys.error(s"unknown metric view '$name'"))
  def maybeGet(name: String): Option[MetricView] = views.get(name)
  def list: Seq[String] = views.keys.toSeq

  def drop(name: String, ifExists: Boolean = true): Unit = {
    if (!ifExists && !views.contains(name)) sys.error(s"metric view '$name' does not exist")
    views.remove(name).foreach { v =>
      materializer.foreach(_.invalidate(v))
      graft.sqlext.SqlMetricViews.unregister(name)
    }
  }

  /** DESCRIBE EXTENDED analogue: one (key, value) row per property
    * (reference README.md:385-397). Since r11 the measure section also
    * surfaces per-measure metadata a consumer can't see from the name
    * alone: window-frame definitions (`measure.<m>.window`) and sketch
    * parameters (`measure.<m>.sketch` — top-k k/capacity, histogram
    * domain/bins, HLL) — the introspection parity gap VERDICT r10
    * flagged. */
  def describe(name: String): DataFrame = {
    import spark.implicits._
    val v = get(name)
    val s = v.spec
    val props = Seq(
      "name" -> name,
      "comment" -> v.comment.getOrElse(""),
      "version" -> s.version,
      "source" -> s.source,
      "filter" -> s.filter.getOrElse(""),
      "dimensions" -> s.dimensions.map(_.name).mkString(", "),
      "measures" -> s.measures.map(_.name).mkString(", "),
      "joins" -> Expander.joinPaths(s.joins).map(_._1.mkString(".")).mkString(", "),
      "spec_hash" -> s.materializationHash) ++
      s.measures.flatMap(MetricViewCatalog.measureMetaRows) ++
      s.materialization.toSeq.flatMap { m =>
        Seq(
          "metric_view.materialization.mode" -> m.mode.getOrElse(""),
          "metric_view.materialization.schedule" -> m.schedule.map(_.json).getOrElse(""),
          "metric_view.materialization.views" ->
            m.materializedViews.map(mv => s"${mv.name}(${mv.mvType})").mkString(", "),
          "metric_view.materialization.built" ->
            materializer.exists(_.isBuilt(v)).toString)
      }
    props.toDF("key", "value")
  }

  /** Persist every registered view to `dir` (r5 stretch #8): one
    * `<name>.yaml` per view — the verbatim CREATE-time YAML, which IS
    * the durable contract (the reference's views live as YAML in dbt
    * metadata, models/schema.yml) — plus `<name>.comment` when set, and
    * a `_manifest` recording registration order. Overwrites `dir`'s
    * previous manifest, so dropped views do not resurrect on load.
    * Materialization caches are NOT copied: they are derived state,
    * keyed by spec hash, and rebuild/revalidate on the loading side. */
  def save(dir: String): Unit = {
    val p = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(p)
    val manifest = new StringBuilder
    views.values.foreach { v =>
      java.nio.file.Files.write(p.resolve(s"${v.name}.yaml"),
        v.yamlSource.getBytes("UTF-8"))
      val cpath = p.resolve(s"${v.name}.comment")
      v.comment match {
        case Some(c) => java.nio.file.Files.write(cpath, c.getBytes("UTF-8"))
        case None    => java.nio.file.Files.deleteIfExists(cpath)
      }
      manifest.append(v.name).append('\n')
    }
    java.nio.file.Files.write(p.resolve("_manifest"),
      manifest.toString.getBytes("UTF-8"))
  }

  /** Replay a [[save]]d catalog into this one (typically fresh, in a
    * new session): each view re-runs the full CREATE path — YAML parse
    * + CREATE-time validation against THIS catalog's sources — so a
    * load against drifted source schemas fails loudly at load time,
    * not at first query. Returns this catalog for chaining. */
  def load(dir: String): this.type = {
    val p = java.nio.file.Paths.get(dir)
    val names = java.nio.file.Files.readAllLines(p.resolve("_manifest"))
    names.forEach { n =>
      // a tampered _manifest must not read arbitrary "*.yaml" paths:
      // every name resolves strictly inside `dir` (ADVICE r7;
      // createOrReplace re-checks, but that is AFTER the reads here)
      MetricViewCatalog.requireSafeName(n)
      val yaml = new String(
        java.nio.file.Files.readAllBytes(p.resolve(s"$n.yaml")), "UTF-8")
      val cpath = p.resolve(s"$n.comment")
      val comment =
        if (java.nio.file.Files.exists(cpath))
          Some(new String(java.nio.file.Files.readAllBytes(cpath), "UTF-8"))
        else None
      createOrReplace(n, yaml, comment)
    }
    this
  }

  /** Recompute materializations (reference refresh_metric_views.py —
    * there a REST call to a pipeline service; here a synchronous batch
    * job, the indirection existed only to drive a managed service).
    *
    * Incremental whenever possible (reference README.md:118): when the
    * catalog has a streaming view of the source's new rows (append-only
    * source) and the view declares aggregated rollups, the rollups are
    * maintained by folding only the arrived delta — the first refresh
    * folds everything, later refreshes cost O(delta), never a source
    * rescan. A spec change resets fold state and starts over. Baseline
    * (unaggregated) caches recompute in batch — a row-level cache can't
    * fold without a transaction log. Without a stream source, refresh
    * is the full batch build. Either path writes versioned snapshots
    * with an atomic pointer flip (`mode: relaxed` stale reads). */
  def refresh(name: String): Unit = {
    val v = get(name)
    val mat = materializer.getOrElse(sys.error("catalog has no materialization dir"))
    val hasRollups = v.spec.materialization.exists(_.materializedViews.exists(_.isAggregated))
    streamSource(v.spec.source) match {
      case Some(stream) if hasRollups =>
        val inc = incremental.get
        if (!mat.isBuilt(v)) { mat.reset(v); inc.resetCheckpoint(v) }
        inc.maintain(v, stream)
        mat.buildUnaggregated(v)
        mat.markBuilt(v)
      // force: a refresh exists to pick up NEW SOURCE ROWS under an
      // unchanged spec — `build`'s spec-hash idempotence would no-op it
      // and serve stale data forever (r5 fix; the incremental branch
      // above always folds for the same reason). Ensure-built-cheaply
      // is the materializer's `build(v)` without force.
      case _ => mat.build(v, force = true)
    }
  }
}

object MetricViewCatalog {

  /** DESCRIBE rows for one measure's window frames and sketch
    * parameters (empty for a plain aggregate). Sketch parameters are
    * read from the measure EXPR — the literals a spec author wrote —
    * so DESCRIBE shows exactly what the sketch was configured with. */
  private[api] def measureMetaRows(m: graft.spec.Measure): Seq[(String, String)] = {
    import graft.spec.RangeSpec
    val windowRow =
      if (m.window.isEmpty) Nil
      else {
        val levels = m.window.map { ws =>
          val r = ws.range match {
            case RangeSpec.Trailing(n, u) => s"trailing $n $u"
            case RangeSpec.Cumulative     => "cumulative"
            case RangeSpec.Current        => "current"
            case RangeSpec.Prior(n, u)    => s"prior $n $u"
          }
          s"$r over ${ws.order}" +
            ws.semiadditive.map(sa => s", semiadditive $sa").getOrElse("")
        }
        Seq(s"measure.${m.name}.window" -> levels.mkString(" -> "))
      }
    val e = m.expr
    val topk = "graft_topk\\s*\\(\\s*[^,]+,\\s*(\\d+)\\s*,\\s*(\\d+)\\s*\\)".r
    val pctB = ("graft_percentile_bounded\\s*\\(\\s*[^,]+,\\s*([0-9.]+)\\s*," +
      "\\s*([0-9.eE+-]+)\\s*,\\s*([0-9.eE+-]+)\\s*,\\s*(\\d+)\\s*\\)").r
    val pctA = "graft_percentile_auto\\s*\\(\\s*[^,]+,\\s*([0-9.]+)\\s*,\\s*(\\d+)\\s*\\)".r
    val hll = "graft_hll_agg\\s*\\(".r
    val sketchRow =
      topk.findFirstMatchIn(e).map(g =>
          s"topk(k=${g.group(1)}, capacity=${g.group(2)})")
        .orElse(pctB.findFirstMatchIn(e).map(g =>
          s"percentile(q=${g.group(1)}, lo=${g.group(2)}, hi=${g.group(3)}, bins=${g.group(4)})"))
        .orElse(pctA.findFirstMatchIn(e).map(g =>
          s"percentile(q=${g.group(1)}, bins=${g.group(2)}, domain=observed-range)"))
        .orElse(hll.findFirstMatchIn(e).map(_ => "hll(approx distinct)"))
        .map(sk => s"measure.${m.name}.sketch" -> sk).toSeq
    windowRow ++ sketchRow
  }

  /** View names double as catalog FILE names ("<name>.yaml"), so they
    * must resolve strictly inside the catalog dir: no path separators,
    * no "..", no leading dot, nothing empty (ADVICE r7). Enforced at
    * CREATE (the only way in) and again on load (tampered manifests). */
  def requireSafeName(name: String): Unit =
    require(name.nonEmpty && !name.contains("/") && !name.contains("\\")
      && !name.contains("..") && !name.startsWith(".")
      && !name.exists(_.isControl),
      s"unsafe metric-view name: '$name'")
}
