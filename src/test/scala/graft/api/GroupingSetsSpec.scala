package graft.api

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Multi-grain (GROUPING SETS / CUBE / ROLLUP) metric queries:
  * grouping_id bit semantics, grain arithmetic, and agreement between
  * the two plans (per-set union vs native single-pass). */
class GroupingSetsSpec extends SparkSpec {

  private def view = SparkEntry.catalog(spark, sfDir).get("mv_order_metrics")

  test("grouping_id bits: first union dim most significant; grain rows re-sum") {
    val r = view.queryGroupingSets(
      Seq(Seq("market_segment", "order_status"), Seq("order_status"), Seq()),
      Seq("total_orders")).collect()
    val byGid = r.groupBy(_.getLong(2))
    // (seg, status) = 0; status-only drops dim0 (MSB) = 2; global = 3
    assert(byGid.keySet == Set(0L, 2L, 3L))
    assert(byGid(3L).length == 1)
    val total = byGid(3L).head.getLong(3)
    assert(byGid(0L).map(_.getLong(3)).sum == total)
    assert(byGid(2L).map(_.getLong(3)).sum == total)
    // aggregated-away dims are null; kept dims are not
    assert(byGid(2L).forall(row => row.isNullAt(0) && !row.isNullAt(1)))
  }

  test("queryRollup = prefix grains; queryCube = every subset") {
    val roll = view.queryRollup(Seq("market_segment", "order_status"), Seq("total_orders"))
    assert(roll.select("grouping_id").distinct().collect().map(_.getLong(0)).toSet
      == Set(0L, 1L, 3L))
    val cube = view.queryCube(Seq("market_segment", "order_status"), Seq("total_orders"))
    assert(cube.select("grouping_id").distinct().collect().map(_.getLong(0)).toSet
      == Set(0L, 1L, 2L, 3L))
  }

  test("where applies at every grain; windowed measures take the per-set path") {
    val r = view.queryGroupingSets(
      Seq(Seq("market_segment"), Seq()),
      Seq("total_orders"), where = Some("order_status = 'F'"))
    val global = r.filter(col("grouping_id") === 3).collect()
    // union dims = just market_segment → gid bits = 1 for the global set
    val globalRows = r.filter(col("grouping_id") === 1).collect()
    assert(global.isEmpty && globalRows.length == 1)
    val direct = view.query(Seq(), Seq("total_orders"), Some("order_status = 'F'"))
      .head().getLong(0)
    assert(globalRows.head.getLong(2) == direct)

    // windowed measure at two grains: per-set delegation, frames per grain
    val w = view.queryGroupingSets(
      Seq(Seq("market_segment", "order_date"), Seq("order_date")),
      Seq("trailing_7d_revenue"))
    assert(w.filter(col("grouping_id") === 0).count() > 0)
    // (order_date) drops market_segment — the MSB — so gid = 2
    assert(w.filter(col("grouping_id") === 2).count() > 0)
  }
}
