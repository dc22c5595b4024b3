package graft.ops

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("split assignment is stable under corpus growth") {
    // a document's split must not change when more docs arrive — the
    // md5-mod contract (no dependence on corpus size or ordering)
    val small = spark.range(0, 100).toDF("doc_id")
      .withColumn("split", Sampling.splitAssign(col("doc_id")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val large = spark.range(0, 10000).toDF("doc_id")
      .withColumn("split", Sampling.splitAssign(col("doc_id")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    small.foreach { case (id, s) => assert(large(id) == s, s"doc $id flipped split") }
  }

  test("split ratios approximate the requested percentages") {
    val counts = spark.range(0, 20000).toDF("doc_id")
      .withColumn("split", Sampling.splitAssign(col("doc_id")))
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = counts.values.sum.toDouble
    assert(math.abs(counts("train") / n - 0.80) < 0.02, counts)
    assert(math.abs(counts("val") / n - 0.10) < 0.02, counts)
    assert(math.abs(counts("test") / n - 0.10) < 0.02, counts)
  }

  test("topKPerGroup returns exactly the k best per group, ranked") {
    val df = Seq(
      ("a", 1L, 0.9), ("a", 2L, 0.8), ("a", 3L, 0.95), ("a", 4L, 0.8),
      ("b", 5L, 0.1), ("b", 6L, 0.2)).toDF("g", "id", "score")
    val got = Sampling.topKPerGroup(df, col("g"), col("score"), col("id"), 2)
      .select("g", "rk", "id").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    // ties broken by ascending id: a -> (0.95, id 3), (0.9, id 1)
    assert(got == Set(("a", 1, 3L), ("a", 2, 1L), ("b", 1, 6L), ("b", 2, 5L)))
  }

  test("stratifiedSample: deterministic, k per stratum, unbiased by id order") {
    val sp = spark
    import sp.implicits._
    val df = (1L to 100L).map(i => (if (i % 2 == 0) "even" else "odd", i))
      .toDF("g", "id")
    val a = Sampling.stratifiedSample(df, col("g"), col("id"), 5)
      .select("g", "rk", "id").collect().map(_.toSeq).toSet
    val b = Sampling.stratifiedSample(df.orderBy(rand(7)), col("g"), col("id"), 5)
      .select("g", "rk", "id").collect().map(_.toSeq).toSet
    assert(a == b) // input order cannot change the draw
    assert(a.count(_.head == "even") == 5 && a.count(_.head == "odd") == 5)
  }

  test("topKPerGroup plan shuffles once on the group key") {
    val scored = TextOps.textStats(Tables.documents(spark, sfDir))
      .select(col("doc_id"), col("quality_score"),
        TextOps.langId(col("text")).as("lang_pred"))
    val df = Sampling.topKPerGroup(scored, col("lang_pred"),
      col("quality_score"), col("doc_id"), 5)
    val exchanges = df.queryExecution.executedPlan.toString
      .split("\n").filter(_.contains("Exchange hashpartitioning"))
    assert(exchanges.length == 1, exchanges.mkString("\n"))
  }
}
