package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Concat-and-chunk packing invariants: deterministic assignment,
  * contiguous per-shard sequence ids, token conservation, and the
  * first-token rule. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    // (doc_id, source, text) — token counts 3, 4, 2, 5, 1
    (1L, "a", "x y z"), (2L, "a", "p q r s"), (3L, "a", "m n"),
    (4L, "b", "a b c d e"), (5L, "b", "k"))
    .toDF("doc_id", "source", "text")

  test("first-token rule: doc joins the sequence containing its first token") {
    val out = Packing.assign(docs, seqTokens = 4)
      .select("doc_id", "seq_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // source a, budget 4: cum_before = 0, 3, 7 → seqs 0, 0, 1
    assert(out(1L) == 0L && out(2L) == 0L && out(3L) == 1L)
    // source b: cum_before = 0, 5 → seqs 0, 1 (independent of shard a)
    assert(out(4L) == 0L && out(5L) == 1L)
  }

  test("token totals are conserved and ids are contiguous per shard") {
    val sum = Packing.summary(docs, seqTokens = 4)
    val total = sum.agg(org.apache.spark.sql.functions.sum("total_tokens"))
      .collect()(0).getLong(0)
    assert(total == 15L)
    sum.collect().groupBy(_.getString(0)).foreach { case (_, rows) =>
      val ids = rows.map(_.getLong(1)).sorted
      assert(ids.head == 0L && ids.sameElements(ids.head to ids.last))
    }
  }

  test("q_pack on the fixture: deterministic across evaluations") {
    val a = graft.ExtQueries.packSequences(spark, sfDir).collect().map(_.toSeq).toSeq
    val b = graft.ExtQueries.packSequences(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(a == b && a.nonEmpty)
  }

  test("plan: window is partitioned by the shard key (no single-partition window)") {
    val plan = graft.ExtQueries.packSequences(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan)
  }
}
