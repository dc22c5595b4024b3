package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Fold == rebuild for the fingerprint store, and maintained-state ==
  * raw-text recompute for the two cards it serves (the contracts
  * q_split_leakage_incremental / q_corpus_diff_incremental hash-gate
  * against DuckDB at the fixture scale). */
class FingerprintStoreSpec extends SparkSpec {

  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "source", "text")

  private val corpus = docs(
    (1L, "web", "the quick brown fox jumps over the lazy dog again"),
    (2L, "web", "the quick brown fox jumps over the lazy dog asleep"),
    (3L, "books", "a completely different opening line for this doc"),
    (4L, "books", ""),
    (5L, "web", "the quick brown fox jumps over the lazy dog thrice"))

  test("fold == rebuild: folded store equals one-shot writeState") {
    val r1 = java.nio.file.Files.createTempDirectory("fps1").toString
    val r2 = java.nio.file.Files.createTempDirectory("fps2").toString
    FingerprintStore.writeState(corpus, r1)
    FingerprintStore.writeState(corpus.filter(col("doc_id") <= 2), r2)
    FingerprintStore.applyDelta(spark, r2,
      corpus.filter(col("doc_id") > 2), foldId = Some("b1"))
    val a = FingerprintStore.readFps(spark, r1)
      .orderBy("doc_id").collect().toSeq
    val b = FingerprintStore.readFps(spark, r2)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
    // replayed fold id: no-op, store unchanged
    FingerprintStore.applyDelta(spark, r2,
      corpus.filter(col("doc_id") > 2), foldId = Some("b1"))
    assert(FingerprintStore.readFps(spark, r2).count() == 5)
    // overlapping ids without the ledger: loud failure
    val e = intercept[Exception] {
      FingerprintStore.applyDelta(spark, r2, corpus.filter(col("doc_id") === 1))
    }
    assert(e.getMessage.contains("already present"))
    Seq(r1, r2).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
  }

  test("split-leakage card from state == batch recompute from raw text") {
    val root = java.nio.file.Files.createTempDirectory("fps3").toString
    FingerprintStore.writeState(corpus.filter(col("doc_id") % 2 === 0), root)
    FingerprintStore.applyDelta(spark, root,
      corpus.filter(col("doc_id") % 2 =!= 0), foldId = Some("b1"))
    val fromState = FingerprintStore.splitLeakageCard(spark, root)
      .collect().toSeq
    // batch recompute: same prefix fp + split derivation over raw text
    val toks = TextOps.tokens(lower(col("text")))
    val d = corpus.filter(length(trim(col("text"))) > 0)
      .select(md5(concat_ws(" ", slice(toks, 1, 8))).as("fp"),
        Sampling.splitAssign(col("doc_id")).as("split"))
      .distinct()
    val a = d.select(col("fp"), col("split").as("split_a"))
    val b = d.select(col("fp"), col("split").as("split_b"))
    val batch = a.join(b, "fp").filter(col("split_a") < col("split_b"))
      .groupBy("split_a", "split_b")
      .agg(count(lit(1)).as("shared_fingerprints"))
      .orderBy("split_a", "split_b").collect().toSeq
    assert(fromState == batch)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  test("diff against state == CorpusDiff.diff over raw snapshots") {
    val root = java.nio.file.Files.createTempDirectory("fps4").toString
    val oldV = corpus.filter(col("doc_id") =!= 3)
    val newV = corpus.filter(col("doc_id") =!= 4)
      .withColumn("text", when(col("doc_id") === 5,
        concat(col("text"), lit(" edited"))).otherwise(col("text")))
    FingerprintStore.writeState(oldV, root)
    val fromState = FingerprintStore.diffAgainst(spark, root, newV)
      .orderBy("doc_id").collect().toSeq
    val batch = CorpusDiff.diff(oldV, newV)
      .orderBy("doc_id").collect().toSeq
    assert(fromState == batch)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }
}
