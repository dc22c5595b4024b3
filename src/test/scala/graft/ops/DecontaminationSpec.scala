package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Decontamination semantics: gram construction edges, overlap
  * counting, and the broadcast plan shape. */
class DecontaminationSpec extends SparkSpec {
  import spark.implicits._

  test("wordNgrams: exact windows, short docs yield empty") {
    val df = Seq("a b c d", "a b", "").toDF("text")
      .select(Decontamination.wordNgrams(col("text"), 3).as("g"))
    val got = df.collect().map(_.getSeq[String](0).toList).toList
    assert(got == List(List("a b c", "b c d"), Nil, List.empty))
  }

  test("counts distinct overlapping grams per doc; clean docs report 0") {
    val train = Seq(
      (1L, "x y z w q"),       // shares "x y z" and "y z w"
      (2L, "x y z x y z"),     // repeated gram counts once
      (3L, "p q r s t"))       // clean
      .toDF("doc_id", "text")
    val bench = Seq((100L, "x y z w")).toDF("doc_id", "text")
    val out = Decontamination.scan(train, bench, n = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.toList == List((1L, 2L, true), (2L, 1L, true), (3L, 0L, false)))
  }

  test("q_decontam plan broadcasts the benchmark gram set") {
    val plan = graft.ExtQueries.decontam(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"))
  }
}
