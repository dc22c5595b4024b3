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

  test("mixtureSample: quotas sum to n, proportional within 1 (Hamilton), deterministic") {
    import spark.implicits._
    // 3 strata with weight mass 5:3:2 → quotas 50/30/20 at n=100
    val df = (0 until 300).map { i =>
      val (g, w) = i % 3 match {
        case 0 => ("a", 0.5); case 1 => ("b", 0.3); case _ => ("c", 0.2)
      }
      (i.toLong, g, w)
    }.toDF("id", "g", "w")
    val got = Sampling.mixtureSample(df, col("g"), col("w"), col("id"), 100L)
      .select("g", "quota", "rk", "id").collect()
    assert(got.length == 100)
    val quotas = got.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(quotas == Map("a" -> 50L, "b" -> 30L, "c" -> 20L), quotas.toString)
    // Hamilton on a non-divisible mass: every quota within 1 of the
    // exact proportional share, and they always sum to n
    val df2 = (0 until 301).map(i => (i.toLong, s"g${i % 7}", 0.1 + (i % 7) * 0.05))
      .toDF("id", "g", "w")
    val q2 = Sampling.mixtureSample(df2, col("g"), col("w"), col("id"), 97L)
      .select("g", "quota").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val mass = df2.groupBy("g").agg(sum(round(col("w") * 1000000)).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val total = mass.values.sum
    assert(q2.values.sum == 97L, q2.toString)
    q2.foreach { case (g, q) =>
      val exact = 97.0 * mass(g) / total
      assert(math.abs(q - exact) < 1.0, s"stratum $g: quota $q vs exact $exact")
    }
    // input order cannot change the draw
    val again = Sampling.mixtureSample(df.orderBy(rand(3)), col("g"), col("w"),
      col("id"), 100L).select("g", "quota", "rk", "id").collect()
    assert(got.map(_.toSeq).toSet == again.map(_.toSeq).toSet)
  }

  test("mixtureSample fails loudly on zero total weight mass (oracle parity)") {
    import spark.implicits._
    // DuckDB's `//` errors on a zero divisor; Spark must fail loudly
    // too, never return an empty sample. Under ANSI (the default) the
    // decimal div itself throws DIVIDE_BY_ZERO; with ANSI off the
    // explicit raise_error guard in mixtureSample fires instead.
    val df = (0 until 10).map(i => (i.toLong, "a", 0.0)).toDF("id", "g", "w")
    val ex = intercept[Exception] {
      Sampling.mixtureSample(df, col("g"), col("w"), col("id"), 5L).collect()
    }
    val msg = ex.getMessage + Option(ex.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("total weight mass is zero") || msg.contains("DIVIDE_BY_ZERO"), msg)
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
