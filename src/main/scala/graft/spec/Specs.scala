package graft.spec

/** The reference's metric-view specs, verbatim modulo `__SOURCE__` →
  * model-registry name (the reference macro substitutes the dbt
  * relation the same way, macros/generate_metric_views.sql:40-43).
  */
object Specs {

  /** models/schema.yml:13-49 (on stg_orders), plus two engine
    * extensions: `unique_customers` (a DISTINCT aggregate — exercises
    * the non-additive routing refusal, since count(distinct) can never
    * be served from pre-aggregated partials) and
    * `approx_unique_customers` (HLL sketch — the scale answer to the
    * same question: sketches ARE storable mergeable partials, so this
    * one routes through the orders_by_status rollup). */
  val mvOrdersSimple: String =
    """version: 0.1
      |source: stg_orders
      |dimensions:
      |  - name: order_status
      |    expr: order_status
      |  - name: order_priority
      |    expr: order_priority
      |  - name: order_date
      |    expr: order_date
      |measures:
      |  - name: order_count
      |    expr: count(*)
      |  - name: total_revenue
      |    expr: sum(total_price)
      |  - name: avg_order_value
      |    expr: avg(total_price)
      |  - name: unique_customers
      |    expr: count(distinct customer_id)
      |  - name: approx_unique_customers
      |    expr: graft_hll_estimate(graft_hll_agg(customer_id))
      |materialization:
      |  schedule: every 8 weeks
      |  mode: relaxed
      |  materialized_views:
      |    - name: baseline
      |      type: unaggregated
      |    - name: orders_by_status
      |      type: aggregated
      |      dimensions:
      |        - order_status
      |      measures:
      |        - order_count
      |        - total_revenue
      |        - approx_unique_customers
      |    - name: orders_by_day
      |      type: aggregated
      |      dimensions:
      |        - order_status
      |        - order_date
      |      measures:
      |        - order_count
      |        - total_revenue
      |""".stripMargin

  /** models/schema.yml:65-130 (on fct_orders) — window measures +
    * materialization. */
  val mvOrderMetrics: String =
    """version: 0.1
      |source: fct_orders
      |dimensions:
      |  - name: market_segment
      |    expr: market_segment
      |  - name: order_status
      |    expr: order_status
      |  - name: order_priority
      |    expr: order_priority
      |  - name: order_date
      |    expr: order_date
      |  - name: order_year
      |    expr: order_year
      |  - name: order_month
      |    expr: order_month
      |measures:
      |  - name: total_orders
      |    expr: count(*)
      |  - name: total_revenue
      |    expr: sum(total_price)
      |  - name: avg_order_value
      |    expr: avg(total_price)
      |  - name: max_order_value
      |    expr: max(total_price)
      |  - name: trailing_7d_revenue
      |    expr: sum(total_price)
      |    window:
      |      - order: order_date
      |        range: trailing 7 day
      |        semiadditive: last
      |  - name: cumulative_revenue
      |    expr: sum(total_price)
      |    window:
      |      - order: order_date
      |        range: cumulative
      |        semiadditive: last
      |  - name: ytd_revenue
      |    expr: sum(total_price)
      |    window:
      |      - order: order_date
      |        range: cumulative
      |        semiadditive: last
      |      - order: order_year
      |        range: current
      |        semiadditive: last
      |materialization:
      |  schedule: every 6 hours
      |  mode: relaxed
      |  materialized_views:
      |    - name: baseline
      |      type: unaggregated
      |    - name: revenue_by_segment
      |      type: aggregated
      |      dimensions:
      |        - market_segment
      |        - order_status
      |      measures:
      |        - total_revenue
      |        - total_orders
      |    - name: monthly_revenue
      |      type: aggregated
      |      dimensions:
      |        - order_year
      |        - order_month
      |      measures:
      |        - total_revenue
      |""".stripMargin

  /** models/schema.yml:140-208 (on fct_customer_summary) — v1.1
    * semantic metadata. */
  val mvCustomerMetrics: String =
    """version: 1.1
      |source: fct_customer_summary
      |dimensions:
      |  - name: market_segment
      |    expr: market_segment
      |    display_name: "Market Segment"
      |    comment: "Customer market segment classification"
      |    synonyms:
      |      - "segment"
      |      - "business segment"
      |      - "customer type"
      |measures:
      |  - name: total_customers
      |    expr: count(*)
      |    display_name: "Total Customers"
      |    synonyms: ["customer count", "number of customers"]
      |  - name: total_revenue
      |    expr: sum(total_spent)
      |    display_name: "Total Revenue"
      |    format:
      |      type: currency
      |      currency_code: USD
      |  - name: avg_customer_value
      |    expr: avg(total_spent)
      |    display_name: "Average Customer Lifetime Value"
      |    format:
      |      type: currency
      |      currency_code: USD
      |  - name: avg_orders_per_customer
      |    expr: avg(total_orders)
      |  - name: high_value_customers
      |    expr: count_if(total_spent > 100000)
      |  - name: avg_order_frequency
      |    expr: avg(total_orders / nullif(datediff(last_order_date, first_order_date), 0))
      |""".stripMargin

  /** Semantic-join demo (README.md:281-300 pattern) over the fixture
    * star: stg_orders → customer → nation → region, with dot-path
    * dimensions and a view-level filter. */
  val mvSalesGeo: String =
    """version: 1.1
      |source: stg_orders
      |filter: order_status <> 'X'
      |joins:
      |  - name: customer
      |    source: customer
      |    on: source.customer_id = customer.c_custkey
      |    joins:
      |      - name: nation
      |        source: nation
      |        on: customer.c_nationkey = nation.n_nationkey
      |        joins:
      |          - name: region
      |            source: region
      |            on: nation.n_regionkey = region.r_regionkey
      |dimensions:
      |  - name: customer_name
      |    expr: customer.c_name
      |  - name: nation_name
      |    expr: customer.nation.n_name
      |  - name: region_name
      |    expr: customer.nation.region.r_name
      |  - name: market_segment
      |    expr: customer.c_mktsegment
      |  - name: order_year
      |    expr: year(order_date)
      |measures:
      |  - name: order_count
      |    expr: count(*)
      |  - name: total_revenue
      |    expr: sum(total_price)
      |  - name: avg_account_balance
      |    expr: avg(cast(customer.c_acctbal as decimal(18,2)))
      |""".stripMargin

  /** Window measures over fct_customer_summary with month/year trailing
    * units (the schema.yml window grammar's other `range` units —
    * README.md:250-259 documents `trailing N <unit>` generically). */
  val mvCustomerWindow: String =
    """version: 0.1
      |source: fct_customer_summary
      |dimensions:
      |  - name: market_segment
      |    expr: market_segment
      |  - name: last_order_date
      |    expr: last_order_date
      |measures:
      |  - name: customers
      |    expr: count(*)
      |  - name: trailing_6m_spend
      |    expr: sum(total_spent)
      |    window:
      |      - order: last_order_date
      |        range: trailing 6 months
      |        semiadditive: last
      |  - name: trailing_2y_spend
      |    expr: sum(total_spent)
      |    window:
      |      - order: last_order_date
      |        range: trailing 2 years
      |        semiadditive: last
      |""".stripMargin

  /** Engine extension: distribution measures. `graft_percentile_bounded`
    * (GraftHistogram) is the routable counterpart of the exact
    * `percentile`/`median` the routing layer refuses — the declared
    * [0, 600000] domain covers TPC-H order totals (~850 to ~560k) and
    * 1024 bins bound the value error to (hi−lo)/bins ≈ 586 (~0.4% of a
    * typical median). The dist_by_status rollup stores the bin-count
    * partials, so status-grain percentile queries re-aggregate 8 KB
    * arrays instead of rescanning orders. */
  val mvOrdersDist: String =
    """version: 0.1
      |source: stg_orders
      |dimensions:
      |  - name: order_status
      |    expr: order_status
      |  - name: order_priority
      |    expr: order_priority
      |  - name: order_date
      |    expr: order_date
      |measures:
      |  - name: order_count
      |    expr: count(*)
      |  - name: p50_order_value
      |    expr: graft_percentile_bounded(total_price, 0.5, 0.0, 600000.0, 1024)
      |  - name: p95_order_value
      |    expr: graft_percentile_bounded(total_price, 0.95, 0.0, 600000.0, 1024)
      |  - name: p50_order_value_auto
      |    expr: graft_percentile_auto(total_price, 0.5, 1024)
      |  - name: trailing_30d_p50_value
      |    expr: graft_percentile_bounded(total_price, 0.5, 0.0, 600000.0, 256)
      |    window:
      |      - order: order_date
      |        range: trailing 30 day
      |        semiadditive: last
      |materialization:
      |  schedule: every 8 weeks
      |  mode: relaxed
      |  materialized_views:
      |    - name: dist_by_status
      |      type: aggregated
      |      dimensions:
      |        - order_status
      |      measures:
      |        - order_count
      |        - p50_order_value
      |        - p95_order_value
      |        - p50_order_value_auto
      |""".stripMargin

  /** Engine extension: period-over-period window measures (`range:
    * prior N <unit>`, RangeSpec.Prior) at a calendar-month grain — the
    * MoM/YoY comparison every metrics layer grows next to trailing/
    * cumulative. The order column is a DATE-typed month start so the
    * query grain IS the period; `prior 1 month` pins the frame one
    * month back, `prior 12 month` the same month a year back. Growth
    * ratios are plain SELECT arithmetic over the measures. */
  val mvRevenuePop: String =
    """version: 0.1
      |source: fct_orders
      |dimensions:
      |  - name: order_month_start
      |    expr: trunc(order_date, 'month')
      |  - name: market_segment
      |    expr: market_segment
      |measures:
      |  - name: total_revenue
      |    expr: sum(total_price)
      |  - name: prior_month_revenue
      |    expr: sum(total_price)
      |    window:
      |      - order: order_month_start
      |        range: prior 1 month
      |        semiadditive: last
      |  - name: yoy_month_revenue
      |    expr: sum(total_price)
      |    window:
      |      - order: order_month_start
      |        range: prior 12 months
      |        semiadditive: last
      |""".stripMargin

  /** Engine extension: heavy-hitter measures (`graft_topk` —
    * SpaceSaving counters, the third mergeable sketch next to HLL and
    * the histogram). Capacity 16384 exceeds TOTAL distinct customers
    * through sf0.1 (15k) — not just sf0.01 — so the sketch is EXACT
    * across the whole documented verification range (hash-oracled);
    * beyond capacity (sf1+) the published SpaceSaving bounds take
    * over. The topk_by_status rollup stores the counter states, so
    * status-grain top-customer queries re-aggregate sketches instead
    * of rescanning orders. */
  val mvOrdersTopK: String =
    """version: 0.1
      |source: stg_orders
      |dimensions:
      |  - name: order_status
      |    expr: order_status
      |  - name: order_priority
      |    expr: order_priority
      |measures:
      |  - name: order_count
      |    expr: count(*)
      |  - name: top_customers
      |    expr: graft_topk(customer_id, 5, 16384)
      |materialization:
      |  schedule: every 8 weeks
      |  mode: relaxed
      |  materialized_views:
      |    - name: topk_by_status
      |      type: aggregated
      |      dimensions:
      |        - order_status
      |      measures:
      |        - order_count
      |        - top_customers
      |""".stripMargin

  /** Variance-family measures (r11): stddev/var_samp/stddev_pop
    * decompose to exact (n, Σx, Σx²) partials (AggDecompose.
    * rewriteVariance) so dispersion measures ROUTE through rollups and
    * window like sum/avg — including a trailing-30-day stddev. */
  val mvOrdersStats: String =
    """version: 0.1
      |source: fct_orders
      |dimensions:
      |  - name: market_segment
      |    expr: market_segment
      |  - name: order_status
      |    expr: order_status
      |  - name: order_date
      |    expr: order_date
      |measures:
      |  - name: order_count
      |    expr: count(*)
      |  - name: revenue_stddev
      |    expr: stddev(total_price)
      |  - name: revenue_var
      |    expr: var_samp(total_price)
      |  - name: revenue_stddev_pop
      |    expr: stddev_pop(total_price)
      |  - name: trailing_30d_stddev
      |    expr: stddev(total_price)
      |    window:
      |      - order: order_date
      |        range: trailing 30 day
      |        semiadditive: last
      |materialization:
      |  schedule: every 12 hours
      |  mode: relaxed
      |  materialized_views:
      |    - name: stats_by_seg_status
      |      type: aggregated
      |      dimensions:
      |        - market_segment
      |        - order_status
      |      measures:
      |        - order_count
      |        - revenue_stddev
      |        - revenue_var
      |        - revenue_stddev_pop
      |    - name: stats_by_seg_day
      |      type: aggregated
      |      dimensions:
      |        - market_segment
      |        - order_date
      |      measures:
      |        - order_count
      |        - revenue_stddev
      |""".stripMargin

  /** Corpus metric view over the documents table (r11): the metrics
    * face of the ingest daemon — its by_source_lang rollup is
    * maintained per microbatch by ContinuousIngest's `metrics` family
    * / catalog.refresh's incremental path, so MEASURE() dashboards
    * (doc counts, char mass, size percentiles) answer from a
    * stream-maintained partial store, never a corpus rescan. NOT in
    * [[all]]: it resolves the `documents` source, not the orders
    * models — register it on a catalog with a documents resolver. */
  val corpusMetrics: String =
    """version: 0.1
      |source: documents
      |dimensions:
      |  - name: source
      |    expr: source
      |  - name: lang
      |    expr: lang
      |measures:
      |  - name: doc_count
      |    expr: count(*)
      |  - name: char_sum
      |    expr: sum(n_chars)
      |  - name: char_p90
      |    expr: graft_percentile_bounded(n_chars, 0.9, 0.0, 1024.0, 256)
      |materialization:
      |  schedule: every 8 weeks
      |  mode: relaxed
      |  materialized_views:
      |    - name: by_source_lang
      |      type: aggregated
      |      dimensions:
      |        - source
      |        - lang
      |      measures:
      |        - doc_count
      |        - char_sum
      |        - char_p90
      |""".stripMargin

  val all: Map[String, String] = Map(
    "mv_orders_simple"    -> mvOrdersSimple,
    "mv_order_metrics"    -> mvOrderMetrics,
    "mv_customer_metrics" -> mvCustomerMetrics,
    "mv_sales_geo"        -> mvSalesGeo,
    "mv_customer_window"  -> mvCustomerWindow,
    "mv_orders_dist"      -> mvOrdersDist,
    "mv_revenue_pop"      -> mvRevenuePop,
    "mv_orders_topk"      -> mvOrdersTopK,
    "mv_orders_stats"     -> mvOrdersStats)
}
