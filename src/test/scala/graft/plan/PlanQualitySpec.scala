package graft.plan

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec

/** Plan-shape regression gate (the builder brief's "explain and iterate
  * until it's the plan you'd want"): pushdown, pruning, broadcast and
  * join culling must actually reach the physical plan — these are the
  * properties that keep 100 TB runs scan-bound instead of
  * shuffle-bound. */
class PlanQualitySpec extends SparkSpec {

  private def scans(df: DataFrame): Seq[FileSourceScanExec] =
    df.queryExecution.executedPlan.collect { case s: FileSourceScanExec => s } ++
      df.queryExecution.executedPlan.collect {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan.collect { case s: FileSourceScanExec => s }
      }.flatten

  private def cat = SparkEntry.catalog(spark, sfDir)

  test("view-level filter pushes into the parquet scan") {
    val df = cat.get("mv_sales_geo").query(Seq("nation_name"), Seq("order_count"))
    val orderScan = scans(df).find(_.schema.fieldNames.contains("o_orderstatus"))
    assert(orderScan.isDefined, scans(df).map(_.schema).mkString("\n"))
    assert(orderScan.get.metadata("PushedFilters").contains("EqualTo(o_orderstatus,X)"),
      orderScan.get.metadata("PushedFilters"))
  }

  test("column pruning: scans read only referenced columns") {
    val df = cat.get("mv_order_metrics").query(Seq("market_segment"), Seq("total_revenue"))
    val orderScan = scans(df).find(_.schema.fieldNames.contains("o_totalprice")).get
    // only join key + measure input needed from orders
    assert(orderScan.schema.fieldNames.toSet == Set("o_custkey", "o_totalprice"),
      orderScan.schema.fieldNames.mkString(","))
  }

  test("small dims broadcast; fact side never broadcast") {
    val df = cat.get("mv_sales_geo").query(Seq("region_name"), Seq("order_count"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("join culling: region not scanned for a nation-grain query") {
    val df = cat.get("mv_sales_geo").query(Seq("nation_name"), Seq("order_count"))
    val files = scans(df).flatMap(_.relation.location.rootPaths.map(_.toString))
    assert(!files.exists(_.contains("region")), files.mkString("\n"))
    assert(files.exists(_.contains("nation")), files.mkString("\n"))
  }

  test("whole-stage codegen covers the aggregation pipeline") {
    // AQE hides codegen subtrees until runtime; disable it to inspect
    // the compiled shape of the static plan
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = cat.get("mv_order_metrics").query(Seq("market_segment"), Seq("total_revenue"))
      val codegen = df.queryExecution.explainString(
        org.apache.spark.sql.execution.CodegenMode)
      assert(codegen.contains("WholeStageCodegen subtrees"), codegen.take(500))
      assert(!codegen.startsWith("Found 0"), codegen.take(500))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("month/year window frames share one window exchange") {
    // two frames with different order numbers (month, year) over the
    // same partition keys must cost one exchange + two sorts, never two
    // independent scan→agg→window pipelines
    val df = graft.WindowQueries.trailingMonthYear(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    val windowNodes = plan.split("\n").count(_.trim.startsWith("Window ")) +
      plan.split("\n").count(_.contains("+- Window "))
    assert(windowNodes >= 2, plan)
    val windowExchanges = "Exchange hashpartitioning\\(market_segment#\\d+, \\d+\\)".r
      .findAllIn(plan).size
    assert(windowExchanges == 1, plan)
  }

  test("pii/pack scans prune to the referenced document columns") {
    // q_pii needs only (doc_id, text); q_pack only (doc_id, source,
    // text) — a scan reading lang/n_chars for these is wasted I/O at
    // corpus scale
    val pii = graft.ExtQueries.piiScrub(spark, sfDir)
    val piiScan = scans(pii).find(_.relation.location.rootPaths
      .exists(_.toString.contains("documents"))).get
    assert(piiScan.schema.fieldNames.toSet == Set("doc_id", "text"),
      piiScan.schema.fieldNames.mkString(","))
    val pack = graft.ExtQueries.packSequences(spark, sfDir)
    val packScan = scans(pack).find(_.relation.location.rootPaths
      .exists(_.toString.contains("documents"))).get
    assert(packScan.schema.fieldNames.toSet == Set("doc_id", "source", "text"),
      packScan.schema.fieldNames.mkString(","))
  }

  test("metric expansion emits a single aggregation (no extra shuffles)") {
    val df = cat.get("mv_order_metrics")
      .query(Seq("market_segment"), Seq("total_revenue", "total_orders", "avg_order_value"))
    val exchanges = df.queryExecution.executedPlan.toString
      .split("\n").count(_.contains("Exchange"))
    // one shuffle for the groupBy + one broadcast for the dim join
    assert(exchanges <= 2, df.queryExecution.executedPlan.toString)
  }
}
