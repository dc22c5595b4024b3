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

  test("fill rate on the fixture clears the floor (VERDICT r7 task 5)") {
    // concat-and-chunk wastes tokens only in the LAST sequence of each
    // shard — fill = 1 - O(shards/sequences). On the sf fixture (20
    // shards x ~1400 tokens, 512 budget) that is ~0.87; a packer
    // regression (e.g. per-doc instead of per-shard chunking) would
    // crater it, so gate at 0.85.
    val docs = graft.model.Tables.documents(spark, sfDir)
    val assigned = Packing.assign(docs, seqTokens = 512)
    val fill = Packing.fillRate(assigned, seqTokens = 512)
    assert(fill >= 0.85, s"concat-and-chunk fill rate $fill below floor")
  }

  test("whole-doc packing: no doc splits, bins respect the budget, fill is dense") {
    val docs = graft.model.Tables.documents(spark, sfDir)
    val assigned = Packing.assignWholeDoc(docs, seqTokens = 512)
    // every doc appears exactly once (whole, never fragmented)
    assert(assigned.count() == docs.count())
    // no bin exceeds the budget unless it holds a single oversized doc
    val bins = assigned.groupBy("source", "seq_id")
      .agg(sum("n_tokens").as("tokens"), count(lit(1)).as("docs"))
      .filter(col("tokens") > 512 && col("docs") > 1)
    assert(bins.isEmpty, bins.collect().mkString("\n"))
    // next-fit keeps padding waste bounded: expected leftover per bin is
    // ~half a doc (~28 of 512 tokens here) plus the final bin per shard
    val fill = Packing.fillRate(assigned, seqTokens = 512)
    assert(fill >= 0.80, s"whole-doc fill rate $fill below floor")
  }

  test("whole-doc packing is deterministic and resets per shard") {
    val a = Packing.assignWholeDoc(docs, seqTokens = 6)
      .select("doc_id", "seq_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Packing.assignWholeDoc(docs, seqTokens = 6)
      .select("doc_id", "seq_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    // source a (3,4,2): doc1 (3) -> bin0; doc2 (4) overflows -> bin1;
    // doc3 (2) fits with doc2 (4+2=6) -> bin1. source b (5,1): doc4 (5)
    // -> bin0; doc5 (1) fits (5+1=6) -> bin0.
    assert(a(1L) == 0L && a(2L) == 1L && a(3L) == 1L)
    assert(a(4L) == 0L && a(5L) == 0L)
  }

  test("oversized doc gets a bin of its own; the stream continues after it") {
    import spark.implicits._
    val odd = Seq(
      (1L, "s", "a b"), (2L, "s", "t1 t2 t3 t4 t5 t6 t7 t8"), (3L, "s", "c d"))
      .toDF("doc_id", "source", "text")
    val out = Packing.assignWholeDoc(odd, seqTokens = 4)
      .select("doc_id", "seq_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 0L && out(2L) == 1L && out(3L) == 2L)
  }
}
