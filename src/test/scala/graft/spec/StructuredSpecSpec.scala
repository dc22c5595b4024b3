package graft.spec

import graft.{SparkEntry, SparkSpec}
import StructuredSpec.Field

class StructuredSpecSpec extends SparkSpec {

  test("structured mode synthesizes the macro's YAML shape") {
    val spec = StructuredSpec.parse(
      source = "stg_orders",
      dimensions = Seq(Field("order_status"), Field("oy", Some("year(order_date)"))),
      measures = Seq(Field("n", Some("count(*)")), Field("rev", Some("sum(total_price)"))),
      filter = Some("order_status <> 'X'"))
    assert(spec.version == "0.1")
    assert(spec.dimension("order_status").expr == "order_status") // expr defaults to name
    assert(spec.dimension("oy").expr == "year(order_date)")
    assert(spec.filter.contains("order_status <> 'X'"))
    assert(spec.measures.map(_.name) == Seq("n", "rev"))
  }

  test("structured-mode view registers and answers queries") {
    val cat = SparkEntry.catalog(spark, sfDir)
    val yaml = StructuredSpec.yaml(
      source = "stg_orders",
      dimensions = Seq(Field("order_status")),
      measures = Seq(Field("n", Some("count(*)"))))
    val v = cat.createOrReplace("mv_structured", yaml,
      comment = Some("structured-mode test view"))
    val rows = v.query(Seq("order_status"), Seq("n")).collect()
    assert(rows.map(_.getLong(1)).sum ==
      graft.model.Models.stgOrders(spark, sfDir).count())
    val props = cat.describe("mv_structured").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("comment") == "structured-mode test view")
    cat.drop("mv_structured")
  }

  test("measure without expr is rejected") {
    assertThrows[RuntimeException] {
      StructuredSpec.yaml("stg_orders", Nil, Seq(Field("broken")))
    }
  }
}
