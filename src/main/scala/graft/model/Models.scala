package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's model DAG re-expressed as lazy DataFrame functions.
  *
  * Mirrors the dbt models (reference: models/staging/stg_orders.sql,
  * models/staging/stg_customers.sql, models/marts/fct_orders.sql,
  * models/marts/fct_customer_summary.sql) but with no templating layer:
  * the DAG is a plain Scala registry evaluated lazily, so Catalyst sees
  * one composed plan per query and can push filters/pruning through the
  * whole "view" chain — exactly what a warehouse does with stacked views.
  *
  * Scale notes:
  *  - staging models are pure projections (no shuffle);
  *  - fct_orders is a fact⟕dim equi-join on customer_id — left to
  *    Catalyst/AQE to pick broadcast vs shuffle-hash vs sort-merge (the
  *    dim side is small per-SF here, but at 100 TB customer is itself
  *    huge, so hard-coding broadcast() would be wrong);
  *  - fct_customer_summary is a shuffle-agg keyed by customer_id with
  *    map-side partial aggregation for free from HashAggregateExec.
  */
object Models {

  /** stg_orders (reference models/staging/stg_orders.sql:10-19): rename
    * projection; order_date normalized ts→date (FIXTURES.md type drift). */
  def stgOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).select(
      col("o_orderkey").as("order_id"),
      col("o_custkey").as("customer_id"),
      col("o_orderstatus").as("order_status"),
      // money staged as decimal(18,2) — real TPC-H typing (FIXTURES.md
      // notes the fixtures drifted to double); decimal sums are exact
      // and order-independent, which matters for both cross-engine
      // reproducibility and 100 TB aggregations (no FP drift).
      col("o_totalprice").cast("decimal(18,2)").as("total_price"),
      to_date(col("o_orderdate")).as("order_date"),
      col("o_orderpriority").as("order_priority"))

  /** stg_customers (reference models/staging/stg_customers.sql:10-18). */
  def stgCustomers(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(
      col("c_custkey").as("customer_id"),
      col("c_name").as("customer_name"),
      col("c_nationkey").as("nation_id"),
      col("c_acctbal").cast("decimal(18,2)").as("account_balance"),
      col("c_mktsegment").as("market_segment"))

  /** fct_orders (reference models/marts/fct_orders.sql:10-24): orders ⟕
    * customers + derived date parts. */
  def fctOrders(spark: SparkSession, dir: String): DataFrame = {
    val o = stgOrders(spark, dir)
    val c = stgCustomers(spark, dir)
      .select("customer_id", "customer_name", "market_segment")
    o.join(c, Seq("customer_id"), "left")
      .select(
        col("order_id"), col("customer_id"), col("customer_name"),
        col("market_segment"), col("order_status"), col("total_price"),
        col("order_date"), col("order_priority"),
        year(col("order_date")).as("order_year"),
        month(col("order_date")).as("order_month"),
        quarter(col("order_date")).as("order_quarter"))
  }

  /** fct_customer_summary (reference models/marts/fct_customer_summary
    * .sql:10-23): customers ⟕ orders, per-customer rollup. Left side is
    * the dim table so order-less customers survive with count=0/sum=NULL. */
  def fctCustomerSummary(spark: SparkSession, dir: String): DataFrame = {
    val c = stgCustomers(spark, dir)
    val o = stgOrders(spark, dir)
      .select("customer_id", "order_id", "total_price", "order_date")
    c.join(o, Seq("customer_id"), "left")
      .groupBy(col("customer_id"), col("customer_name"),
        col("market_segment"), col("account_balance"))
      .agg(
        count(col("order_id")).as("total_orders"),
        sum(col("total_price")).as("total_spent"),
        avg(col("total_price")).as("avg_order_value"),
        min(col("order_date")).as("first_order_date"),
        max(col("order_date")).as("last_order_date"))
  }

  /** Model registry — the dbt DAG as data. Metric-view specs reference
    * sources by these names (reference macros/generate_metric_views
    * .sql:40-43 replaces __SOURCE__ with the model's relation). */
  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "orders"               -> ((s, d) => Tables.orders(s, d)),
    "customer"             -> ((s, d) => Tables.customer(s, d)),
    "nation"               -> ((s, d) => Tables.nation(s, d)),
    "region"               -> ((s, d) => Tables.region(s, d)),
    "supplier"             -> ((s, d) => Tables.supplier(s, d)),
    "part"                 -> ((s, d) => Tables.part(s, d)),
    "lineitem"             -> ((s, d) => Tables.lineitem(s, d)),
    "stg_orders"           -> stgOrders _,
    "stg_customers"        -> stgCustomers _,
    "fct_orders"           -> fctOrders _,
    "fct_customer_summary" -> fctCustomerSummary _)

  def resolve(spark: SparkSession, dir: String, name: String): DataFrame =
    registry.getOrElse(name,
      sys.error(s"unknown model/source '$name' (known: ${registry.keys.toSeq.sorted.mkString(", ")})")
    )(spark, dir)
}
