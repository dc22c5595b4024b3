package graft.spec

import org.scalatest.funsuite.AnyFunSuite

class YamlParserSpec extends AnyFunSuite {

  test("parses mv_order_metrics: dims, measures, windows, materialization") {
    val s = YamlParser.parse(Specs.mvOrderMetrics)
    assert(s.version == "0.1")
    assert(s.source == "fct_orders")
    assert(s.dimensions.map(_.name) == Seq("market_segment", "order_status",
      "order_priority", "order_date", "order_year", "order_month"))
    assert(s.measures.map(_.name).contains("trailing_7d_revenue"))
    val t7 = s.measure("trailing_7d_revenue")
    assert(t7.window == Seq(WindowSpec("order_date", RangeSpec.Trailing(7, "day"), Some("last"))))
    val ytd = s.measure("ytd_revenue")
    assert(ytd.window.map(_.range) == Seq(RangeSpec.Cumulative, RangeSpec.Current))
    val mat = s.materialization.get
    assert(mat.schedule.contains(Schedule(6, "HOURS")))
    assert(mat.mode.contains("relaxed"))
    assert(mat.materializedViews.map(_.name) == Seq("baseline", "revenue_by_segment", "monthly_revenue"))
    assert(mat.materializedViews.find(_.name == "revenue_by_segment").get.dimensions ==
      Seq("market_segment", "order_status"))
  }

  test("parses v1.1 semantic metadata (display_name, synonyms, format)") {
    val s = YamlParser.parse(Specs.mvCustomerMetrics)
    assert(s.version == "1.1")
    val d = s.dimension("market_segment")
    assert(d.displayName.contains("Market Segment"))
    assert(d.synonyms.contains("business segment"))
    val rev = s.measure("total_revenue")
    assert(rev.format.get("type") == "currency")
    assert(rev.format.get("currency_code") == "USD")
  }

  test("parses nested joins with dot paths (Norway-problem 'on' keys)") {
    val s = YamlParser.parse(Specs.mvSalesGeo)
    assert(s.joins.head.name == "customer")
    assert(s.joins.head.on == "source.customer_id = customer.c_custkey")
    val nation = s.joins.head.joins.head
    assert(nation.name == "nation")
    assert(nation.joins.head.name == "region")
    assert(s.filter.contains("order_status <> 'X'"))
  }

  test("range spec grammar") {
    assert(RangeSpec.parse("trailing 7 day") == RangeSpec.Trailing(7, "day"))
    assert(RangeSpec.parse("trailing 30 days") == RangeSpec.Trailing(30, "day"))
    assert(RangeSpec.parse("trailing 2 week") == RangeSpec.Trailing(2, "week"))
    assert(RangeSpec.parse("cumulative") == RangeSpec.Cumulative)
    assert(RangeSpec.parse("current") == RangeSpec.Current)
    assertThrows[RuntimeException](RangeSpec.parse("sliding 3"))
  }

  test("schedule grammar: typed parse, JSON render, garbage rejected") {
    assert(Schedule.parse("every 6 hours") == Schedule(6, "HOURS"))
    assert(Schedule.parse("every 1 hour") == Schedule(1, "HOURS"))
    assert(Schedule.parse("every 8 weeks") == Schedule(8, "WEEKS"))
    assert(Schedule.parse("every 30 minutes") == Schedule(30, "MINUTES"))
    assert(Schedule.parse("EVERY 2 Days") == Schedule(2, "DAYS"))
    assert(Schedule(6, "HOURS").json == """{"type":"periodic","interval":6,"unit":"HOURS"}""")
    assert(Schedule(8, "WEEKS").periodMillis == 8L * 7 * 86400 * 1000)
    assertThrows[RuntimeException](Schedule.parse("every tuesday"))
    assertThrows[RuntimeException](Schedule.parse("6 hours"))
    assertThrows[RuntimeException](Schedule.parse("every 0 hours"))
    // rejection happens at YAML-parse (= CREATE) time
    assertThrows[RuntimeException](YamlParser.parse(
      Specs.mvOrdersSimple.replace("every 8 weeks", "whenever")))
  }

  test("spec hash is stable and materialization-sensitive") {
    val a = YamlParser.parse(Specs.mvOrderMetrics)
    val b = YamlParser.parse(Specs.mvOrderMetrics)
    assert(a.materializationHash == b.materializationHash)
    val c = a.copy(filter = Some("order_year > 1995"))
    assert(a.materializationHash != c.materializationHash)
  }
}
