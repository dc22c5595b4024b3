package graft.sqlext

import graft.{SparkEntry, SparkSpec}

/** The SQL-string DDL lifecycle (reference macros/generate_metric_views
  * .sql:80-91, drop_metric_views.sql:19-23): create → query → describe
  * → drop, driven through spark.sql only. */
class SqlDdlSpec extends SparkSpec {

  // explicit bind: another suite's catalog on the shared session may
  // hold the CREATE binding (per-session, last bind wins)
  private def init(): Unit = SparkEntry.catalog(spark, sfDir).bind()

  private val createSql =
    """CREATE OR REPLACE VIEW mv_ddl_test
      |COMMENT 'Orders by status, created via SQL DDL'
      |WITH METRICS
      |LANGUAGE YAML
      |AS $$
      |version: 0.1
      |source: stg_orders
      |dimensions:
      |  - name: order_status
      |    expr: order_status
      |measures:
      |  - name: order_count
      |    expr: count(*)
      |  - name: total_revenue
      |    expr: sum(total_price)
      |$$""".stripMargin

  test("CREATE ... WITH METRICS LANGUAGE YAML, then MEASURE() query") {
    init()
    spark.sql(createSql)
    val rows = spark.sql(
      """SELECT order_status, MEASURE(order_count) AS n
        |FROM mv_ddl_test GROUP BY order_status""".stripMargin).collect()
    val want = graft.model.Models.stgOrders(spark, sfDir)
      .groupBy("order_status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(r => r.getString(0) -> r.getLong(1)).toMap == want)
  }

  test("DESCRIBE EXTENDED and SHOW TBLPROPERTIES return the view properties") {
    init()
    spark.sql(createSql)
    val props = spark.sql("DESCRIBE EXTENDED mv_ddl_test").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("name") == "mv_ddl_test")
    assert(props("comment") == "Orders by status, created via SQL DDL")
    assert(props("measures") == "order_count, total_revenue")
    val show = spark.sql("SHOW TBLPROPERTIES mv_ddl_test").collect()
    assert(show.nonEmpty && show.head.schema.fieldNames.toSeq == Seq("key", "value"))
  }

  test("COMMENT is optional and '' escapes a quote") {
    init()
    spark.sql(
      """CREATE OR REPLACE VIEW mv_ddl_nocomment WITH METRICS LANGUAGE YAML AS $$
        |version: 0.1
        |source: stg_orders
        |dimensions:
        |  - name: order_status
        |    expr: order_status
        |measures:
        |  - name: order_count
        |    expr: count(*)
        |$$""".stripMargin)
    assert(spark.sql("SELECT MEASURE(order_count) AS n FROM mv_ddl_nocomment").count() == 1)
    spark.sql(
      """CREATE OR REPLACE VIEW mv_ddl_quote COMMENT 'it''s quoted'
        |WITH METRICS LANGUAGE YAML AS $$
        |version: 0.1
        |source: stg_orders
        |dimensions:
        |  - name: order_status
        |    expr: order_status
        |measures:
        |  - name: order_count
        |    expr: count(*)
        |$$""".stripMargin)
    val c = spark.sql("DESCRIBE mv_ddl_quote").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap.apply("comment")
    assert(c == "it's quoted")
    spark.sql("DROP VIEW mv_ddl_nocomment")
    spark.sql("DROP VIEW mv_ddl_quote")
  }

  test("DROP VIEW IF EXISTS removes the view; MEASURE() then fails") {
    init()
    spark.sql(createSql)
    spark.sql("DROP VIEW IF EXISTS mv_ddl_test")
    assert(SqlMetricViews.get("mv_ddl_test").isEmpty)
    intercept[Exception] {
      spark.sql("SELECT order_status, MEASURE(order_count) FROM mv_ddl_test GROUP BY 1").collect()
    }
  }

  test("CREATE-time validation: bad measure expr fails the DDL") {
    init()
    val e = intercept[Exception] {
      spark.sql(
        """CREATE OR REPLACE VIEW mv_ddl_bad WITH METRICS LANGUAGE YAML AS $$
          |version: 0.1
          |source: stg_orders
          |dimensions:
          |  - name: order_status
          |    expr: order_status
          |measures:
          |  - name: broken
          |    expr: sum(no_such_column)
          |$$""".stripMargin)
    }
    assert(e.getMessage.toLowerCase.contains("no_such_column")
      || e.getMessage.contains("UNRESOLVED"))
    assert(SqlMetricViews.get("mv_ddl_bad").isEmpty)
  }

  test("CREATE routes to the explicitly bound catalog, not the last-constructed one") {
    init()
    val target = SparkEntry.catalog(spark, sfDir)
    // a later catalog takes the session binding over by default...
    val later = new graft.api.MetricViewCatalog(spark, graft.model.Models.resolve(spark, sfDir, _))
    assert(SqlMetricViews.boundCatalog(spark).contains(later))
    // ...but an explicit bind() re-targets deterministically (the
    // q_sql_ddl cache-hit path) and CREATE lands in the bound catalog
    target.bind()
    spark.sql(createSql)
    assert(target.maybeGet("mv_ddl_test").isDefined)
    assert(later.maybeGet("mv_ddl_test").isEmpty)
    spark.sql("DROP VIEW IF EXISTS mv_ddl_test")
  }

  test("non-metric-view statements still hit the stock parser") {
    init()
    spark.range(3).createOrReplaceTempView("ddl_plain_view")
    assert(spark.sql("SELECT count(*) FROM ddl_plain_view").collect()(0).getLong(0) == 3)
    spark.sql("DROP VIEW ddl_plain_view") // stock DROP path, not intercepted
    intercept[Exception] { spark.table("ddl_plain_view").collect() }
  }
}
