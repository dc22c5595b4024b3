package graft.plan

import graft.{SparkEntry, SparkSpec}
import graft.spec.{Specs, YamlParser}

class ExpanderSpec extends SparkSpec {

  private def cat = SparkEntry.catalog(spark, sfDir)

  test("join culling: unreferenced joins are not applied") {
    val mv = cat.get("mv_sales_geo")
    // order_year only references the source — no join should appear
    val plan = mv.query(Seq("order_year"), Seq("order_count"))
      .queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("join"),
      s"expected no joins for a source-only dim, got:\n$plan")
  }

  test("join culling: nested dim pulls its ancestor chain only") {
    val mv = cat.get("mv_sales_geo")
    val plan = mv.query(Seq("nation_name"), Seq("order_count"))
      .queryExecution.analyzed.toString
    // customer + nation joined, region not
    assert(plan.contains("customer__nation__n_name"))
    assert(!plan.contains("region__r_name"))
  }

  test("dot-path dims resolve through nested joins to correct values") {
    val mv = cat.get("mv_sales_geo")
    val rows = mv.query(Seq("region_name"), Seq("order_count"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // every order has a customer -> nation -> region chain in fixtures
    assert(rows.keySet.subsetOf(Set("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")))
    assert(rows.values.sum > 0)
  }

  test("view-level filter applies before aggregation") {
    val mvYaml = Specs.mvOrdersSimple.replace(
      "source: stg_orders", "source: stg_orders\nfilter: order_status = 'F'")
    val c = cat
    val v = c.createOrReplace("mv_filtered_test", mvYaml)
    val all = c.get("mv_orders_simple").query(Seq("order_status"), Seq("order_count"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val filtered = v.query(Seq("order_status"), Seq("order_count"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(filtered.keySet == Set("F"))
    assert(filtered("F") == all("F"))
  }

  test("ambiguous join reference is rejected") {
    val yaml =
      """version: 1.1
        |source: stg_orders
        |joins:
        |  - name: a
        |    source: customer
        |    on: source.customer_id = a.c_custkey
        |    joins:
        |      - name: dup
        |        source: nation
        |        on: a.c_nationkey = dup.n_nationkey
        |  - name: b
        |    source: customer
        |    on: source.customer_id = b.c_custkey
        |    joins:
        |      - name: dup
        |        source: nation
        |        on: b.c_nationkey = dup.n_nationkey
        |dimensions:
        |  - name: x
        |    expr: dup.n_name
        |measures:
        |  - name: c
        |    expr: count(*)
        |""".stripMargin
    val e = intercept[RuntimeException](cat.createOrReplace("mv_ambig", yaml))
    assert(e.getMessage.contains("ambiguous"))
  }

  test("create-time validation rejects unresolvable exprs") {
    val bad = Specs.mvOrdersSimple.replace("expr: sum(total_price)", "expr: sum(no_such_column)")
    assertThrows[Exception](cat.createOrReplace("mv_bad", bad))
  }

  test("query rejects unknown dims and measures") {
    val mv = cat.get("mv_orders_simple")
    assertThrows[RuntimeException](mv.query(Seq("nope"), Seq("order_count")))
    assertThrows[RuntimeException](mv.query(Seq("order_status"), Seq("nope")))
  }

  test("describe surfaces spec + materialization properties") {
    val c = SparkEntry.matCatalog(spark, sfDir)
    val props = c.describe("mv_order_metrics").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("source") == "fct_orders")
    assert(props("metric_view.materialization.mode") == "relaxed")
    // typed schedule rendering (reference README.md:396)
    assert(props("metric_view.materialization.schedule") ==
      """{"type":"periodic","interval":6,"unit":"HOURS"}""")
    assert(props("metric_view.materialization.built") == "true")
    assert(props("metric_view.materialization.views").contains("revenue_by_segment(aggregated)"))
  }

  test("query-level WHERE on a joined dot-path dimension pulls its join chain") {
    val mv = cat.get("mv_sales_geo")
    val rows = mv.query(Seq("nation_name"), Seq("order_count"),
      where = Some("region_name = 'EUROPE'")).collect()
    assert(rows.nonEmpty)
    // every returned nation must be in EUROPE per the fixture star
    val eur = graft.model.Tables.nation(spark, sfDir)
      .join(graft.model.Tables.region(spark, sfDir),
        org.apache.spark.sql.functions.col("n_regionkey") ===
          org.apache.spark.sql.functions.col("r_regionkey"))
      .filter(org.apache.spark.sql.functions.col("r_name") === "EUROPE")
      .select("n_name").collect().map(_.getString(0)).toSet
    assert(rows.map(_.getString(0)).toSet.subsetOf(eur))
  }

  test("SQL MEASURE over the semantic-join view with dot-path dims") {
    SparkEntry.catalog(spark, sfDir)
    val sql = spark.sql(
      """SELECT region_name, MEASURE(total_revenue) AS rev
        |FROM mv_sales_geo WHERE region_name <> 'AFRICA'
        |GROUP BY region_name ORDER BY region_name""".stripMargin)
      .collect().map(r => r.getString(0)).toSeq
    assert(sql.nonEmpty && !sql.contains("AFRICA"))
  }

  test("global-grain query (no dims): plain, window and mixed measures") {
    val mv = cat.get("mv_order_metrics")
    val n = graft.model.Models.stgOrders(spark, sfDir).count()
    // plain global
    val plain = mv.query(Nil, Seq("total_orders", "total_revenue")).collect()
    assert(plain.length == 1 && plain(0).getLong(0) == n)
    // window global: semiadditive last over the whole series
    val win = mv.query(Nil, Seq("cumulative_revenue")).collect()
    assert(win.length == 1)
    assert(win(0).getDecimal(0).doubleValue > 0)
    // mixed: cross-joined single rows
    val mixed = mv.query(Nil, Seq("total_orders", "cumulative_revenue")).collect()
    assert(mixed.length == 1 && mixed(0).getLong(0) == n)
    // cumulative over everything == total revenue
    val rev = mv.query(Nil, Seq("total_revenue")).collect()(0).getDecimal(0)
    assert(mixed(0).getDecimal(1) == rev)
  }

  test("dims-only query returns the distinct dimension space") {
    val mv = cat.get("mv_orders_simple")
    val got = mv.query(Seq("order_status"), Nil).collect().map(_.getString(0)).sorted
    assert(got.toSeq == Seq("F", "O", "P"))
  }

  test("drop removes the view") {
    val c = cat
    c.createOrReplace("mv_tmp", Specs.mvOrdersSimple)
    assert(c.list.contains("mv_tmp"))
    c.drop("mv_tmp")
    assert(!c.list.contains("mv_tmp"))
    assertThrows[RuntimeException](c.drop("mv_tmp", ifExists = false))
  }
}
