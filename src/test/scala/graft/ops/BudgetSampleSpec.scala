package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class BudgetSampleSpec extends SparkSpec {

  private def docs(n: Int) = {
    import spark.implicits._
    (1 to n).map(i => (i.toLong, s"s${i % 3}", 10L + i % 17)).toDF("id", "src", "tok")
  }

  private def budgets(rows: (String, Long)*) = {
    import spark.implicits._
    rows.toDF("b_src", "token_budget")
  }

  test("bucketed two-phase prefix cut == naive per-stratum window cumsum") {
    val d = docs(500)
    val b = budgets("s0" -> 300L, "s1" -> 700L, "s2" -> 123L)
    val got = Sampling.tokenBudgetSample(d, col("src"), col("tok"), col("id"), b)
      .select("id").collect().map(_.getLong(0)).toSet
    val naive = d
      .withColumn("cum", sum("tok").over(
        Window.partitionBy("src")
          .orderBy(md5(col("id").cast("string")).asc, col("id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(b, col("src") === col("b_src"))
      .filter(col("cum") <= col("token_budget"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == naive && got.nonEmpty)
  }

  test("budget edges: zero keeps nothing, >= total keeps everything, oversized first doc blocks its prefix") {
    import spark.implicits._
    val d = docs(60)
    val total = d.groupBy("src").agg(sum("tok")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val all = Sampling.tokenBudgetSample(d, col("src"), col("tok"), col("id"),
      budgets(total.toSeq.map { case (s, t) => s -> t }: _*))
    assert(all.count() == 60)
    val none = Sampling.tokenBudgetSample(d, col("src"), col("tok"), col("id"),
      budgets("s0" -> 0L, "s1" -> 0L, "s2" -> 0L))
    assert(none.count() == 0)
    // one stratum whose md5-first doc is larger than the budget: the
    // prefix cut keeps nothing even though later docs would fit
    val d2 = Seq((1L, "z", 100L), (2L, "z", 1L)).toDF("id", "src", "tok")
    val first = d2.orderBy(md5(col("id").cast("string"))).head().getLong(0)
    val r2 = Sampling.tokenBudgetSample(d2, col("src"), col("tok"), col("id"),
      budgets("z" -> 50L)).select("id").collect().map(_.getLong(0)).toSet
    if (first == 1L) assert(r2.isEmpty) else assert(r2 == Set(2L))
  }

  test("cum_tokens is the within-budget running total and output keeps input columns") {
    val d = docs(50)
    val out = Sampling.tokenBudgetSample(d, col("src"), col("tok"), col("id"),
      budgets("s0" -> 200L, "s1" -> 200L, "s2" -> 200L))
    assert(out.columns.toSet == Set("id", "src", "tok", "cum_tokens"))
    out.groupBy("src").agg(max("cum_tokens").as("m"), sum("tok").as("t"))
      .collect().foreach { r =>
        assert(r.getLong(1) == r.getLong(2), "max cum == kept token sum")
        assert(r.getLong(1) <= 200L)
      }
  }
}
