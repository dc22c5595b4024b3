package graft.api

import graft.SparkSpec
import graft.model.Models
import graft.spec.Specs

/** Catalog persistence (r5 stretch #8): save() writes each view's
  * verbatim CREATE-time YAML + comment + a registration-order manifest;
  * load() replays the full CREATE path into a fresh catalog/session.
  */
class CatalogPersistSpec extends SparkSpec {

  private val tmpYaml =
    """version: 0.1
      |source: fct_orders
      |dimensions:
      |  - name: order_priority
      |    expr: order_priority
      |measures:
      |  - name: n
      |    expr: count(*)
      |""".stripMargin

  test("save -> new session -> load -> query round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("graft-catalog").toString
    val cat1 = new MetricViewCatalog(spark, Models.resolve(spark, sfDir, _))
    Specs.all.foreach { case (n, y) => cat1.createOrReplace(n, y) }
    cat1.createOrReplace("mv_tmp", tmpYaml, Some("it's a 'quoted'\ncomment"))
    cat1.save(dir)

    val s2 = spark.newSession()
    val cat2 = new MetricViewCatalog(s2, Models.resolve(s2, sfDir, _)).load(dir)

    // registration order, comments, and the spec-hash contract survive
    assert(cat2.list == cat1.list)
    assert(cat2.get("mv_tmp").comment.contains("it's a 'quoted'\ncomment"))
    assert(cat2.get("mv_order_metrics").spec.materializationHash ==
      cat1.get("mv_order_metrics").spec.materializationHash)

    // the loaded catalog answers queries identically, in its own session
    def rows(c: MetricViewCatalog) =
      c.get("mv_order_metrics")
        .query(Seq("market_segment"), Seq("total_revenue", "total_orders"))
        .collect().map(_.toSeq).toSet
    assert(rows(cat2) == rows(cat1))

    // dropped views do not resurrect: save rewrites the manifest
    cat1.drop("mv_tmp")
    cat1.save(dir)
    val cat3 = new MetricViewCatalog(spark, Models.resolve(spark, sfDir, _)).load(dir)
    assert(!cat3.list.contains("mv_tmp"))
    assert(cat3.list == cat1.list)
  }

  test("load validates against the loading catalog's sources (fails loudly)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-catalog-bad").toString
    val cat1 = new MetricViewCatalog(spark, Models.resolve(spark, sfDir, _))
    cat1.createOrReplace("mv_tmp", tmpYaml)
    cat1.save(dir)
    // a resolver that serves a schema missing the dim column
    val broken = new MetricViewCatalog(spark,
      name => Models.resolve(spark, sfDir, name).drop("order_priority"))
    intercept[Exception] { broken.load(dir) }
  }

  test("path-escaping view names are rejected at CREATE and on tampered manifests (ADVICE r7)") {
    val cat = new MetricViewCatalog(spark, Models.resolve(spark, sfDir, _))
    Seq("../evil", "a/b", "a\\b", ".hidden", "").foreach { bad =>
      intercept[IllegalArgumentException] { cat.createOrReplace(bad, tmpYaml) }
    }
    // a tampered _manifest must not read "*.yaml" outside the dir
    val dir = java.nio.file.Files.createTempDirectory("graft-catalog-tamper")
    cat.createOrReplace("mv_tmp", tmpYaml)
    cat.save(dir.toString)
    java.nio.file.Files.write(dir.resolve("_manifest"), "../outside\n".getBytes)
    val fresh = new MetricViewCatalog(spark, Models.resolve(spark, sfDir, _))
    intercept[IllegalArgumentException] { fresh.load(dir.toString) }
  }
}
