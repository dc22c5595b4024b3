package graft

import org.apache.spark.sql.functions._

/** The routing-speedup measurement must measure the thing it claims:
  * same semantics on both sides, rollup actually consulted, honest
  * fixture. (The speedup VALUE is hardware-dependent and asserted only
  * to be positive — BENCH_r*.json carries the measured number.)
  */
class RoutingBenchSpec extends SparkSpec {

  private val base = "/root/testdata/sf0.001"

  test("replicated fixture: R-fold orders, disjoint ids, symlinked dims") {
    val r = RoutingBench.measure(spark, base, replicas = 2, runs = 1)
    assert(r.replicas == 2 && r.unroutedSec > 0 && r.routedSec > 0)
    val dir = s"/root/repo/target/routing_fixture_${base.replaceAll("[^A-Za-z0-9.]", "_")}_x2"
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val baseOrders = spark.read.parquet(s"$base/orders.parquet")
    assert(orders.count() == 2 * baseOrders.count())
    assert(orders.select("o_orderkey").distinct().count() == orders.count(),
      "replica id spaces must be disjoint")
    // dims are symlinks to the base fixture, not copies
    assert(java.nio.file.Files.isSymbolicLink(
      java.nio.file.Paths.get(s"$dir/customer.parquet")))
  }

  test("routed and unrouted agree on the replicated corpus") {
    RoutingBench.measure(spark, base, replicas = 2, runs = 1) // ensures fixture+rollups
    val dir = s"/root/repo/target/routing_fixture_${base.replaceAll("[^A-Za-z0-9.]", "_")}_x2"
    def rows(cat: graft.api.MetricViewCatalog) =
      cat.get("mv_order_metrics")
        .query(Seq("market_segment"), Seq("total_orders", "total_revenue"))
        .select(col("market_segment"), col("total_orders"),
          col("total_revenue").cast("double").as("total_revenue"))
        .collect().map(_.toSeq).toSet
    val unrouted = rows(SparkEntry.catalog(spark, dir))
    val routed = rows(SparkEntry.matCatalog(spark, dir))
    assert(routed == unrouted)
    // and the replicated totals are exactly 2x the base corpus's
    val baseRows = rows(SparkEntry.catalog(spark, base))
      .map { case Seq(seg, n: Long, rev: Double) => Seq(seg, 2 * n, 2 * rev) }
    assert(unrouted == baseRows)
  }
}
