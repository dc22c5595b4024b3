package graft.plan

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Semantics of the variance-family algebraic rewrite
  * (AggDecompose.rewriteVariance): agreement with Spark's native
  * stddev/variance (up to fp noise), exact edge cases, and window
  * behavior. */
class VarianceSpec extends SparkSpec {

  private def view = SparkEntry.catalog(spark, sfDir).get("mv_orders_stats")

  test("rewritten stddev/var agree with Spark native aggregates (fp tolerance)") {
    val got = view
      .query(Seq("market_segment"),
        Seq("order_count", "revenue_stddev", "revenue_var", "revenue_stddev_pop"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    val want = graft.model.Models.resolve(spark, sfDir, "fct_orders")
      .groupBy("market_segment")
      .agg(stddev(col("total_price")).as("sd"), var_samp(col("total_price")).as("v"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, (sd, v)) =>
      val (wsd, wv) = want(k)
      assert(math.abs(sd - wsd) <= 1e-6 * math.max(1.0, wsd), s"$k stddev $sd vs $wsd")
      assert(math.abs(v - wv) <= 1e-6 * math.max(1.0, wv), s"$k var $v vs $wv")
    }
  }

  test("n = 1 group: sample variants null, population variants zero") {
    import spark.implicits._
    val cat = new graft.api.MetricViewCatalog(spark, {
      case "one" => Seq(("a", java.math.BigDecimal.valueOf(12345, 2)))
        .toDF("k", "x").select(col("k"), col("x").cast("decimal(18,2)").as("x"))
      case n => sys.error(s"unexpected source $n")
    })
    cat.createOrReplace("mv_one",
      """version: 0.1
        |source: one
        |dimensions:
        |  - name: k
        |    expr: k
        |measures:
        |  - name: sd
        |    expr: stddev(x)
        |  - name: v
        |    expr: var_samp(x)
        |  - name: sdp
        |    expr: stddev_pop(x)
        |  - name: vp
        |    expr: var_pop(x)
        |""".stripMargin)
    val r = cat.get("mv_one").query(Seq("k"), Seq("sd", "v", "sdp", "vp")).collect()
    assert(r.length == 1)
    assert(r(0).isNullAt(1) && r(0).isNullAt(2), "sample variants must be null at n=1")
    assert(r(0).getDouble(3) == 0.0 && r(0).getDouble(4) == 0.0,
      "population variants must be 0 at n=1")
  }

  test("trailing-window stddev: frame of one day is null, multi-day frame matches direct") {
    val rows = view
      .query(Seq("market_segment", "order_date"), Seq("trailing_30d_stddev"))
      .orderBy("market_segment", "order_date")
      .limit(200).collect()
    assert(rows.nonEmpty)
    // cross-check one (segment, date) against a direct computation over
    // the raw fact rows in the trailing frame
    val probe = rows.filter(!_.isNullAt(2)).last
    val (seg, d) = (probe.getString(0), probe.getDate(1))
    val direct = graft.model.Models.resolve(spark, sfDir, "fct_orders")
      .filter(col("market_segment") === seg &&
        col("order_date") > date_sub(lit(d), 30) && col("order_date") <= lit(d))
      .agg(stddev(col("total_price"))).head().getDouble(0)
    assert(math.abs(probe.getDouble(2) - direct) <= 1e-6 * math.max(1.0, direct),
      s"window stddev ${probe.getDouble(2)} vs direct $direct at ($seg, $d)")
  }
}
