package graft.ops

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

class DsirStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft-dsir-store").toString + "/s"

  private val pred = col("lang") === "en"

  test("fold == rebuild: folded model scores == one-shot batch scores") {
    val docs = Tables.documents(spark, sfDir)
    val root = tmp()
    DsirStore.writeCounts(docs.filter(col("doc_id") % 3 === 0), pred, root)
    // out-of-order arrival: batch 2 before batch 1
    DsirStore.applyDelta(spark, root, docs.filter(col("doc_id") % 3 === 2),
      pred, foldId = Some("b2"))
    DsirStore.applyDelta(spark, root, docs.filter(col("doc_id") % 3 === 1),
      pred, foldId = Some("b1"))
    val folded = DsirStore.scoresFromState(spark, root, docs, pred)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).sortBy(_._1).toSeq
    val batch = Dsir.scores(docs, pred)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).sortBy(_._1).toSeq
    assert(folded == batch)
  }

  test("replayed fold id no-ops; snapshot version advances per real fold") {
    val docs = Tables.documents(spark, sfDir)
    val root = tmp()
    DsirStore.writeCounts(docs.filter(col("doc_id") % 2 === 0), pred, root)
    val d1 = docs.filter(col("doc_id") % 2 === 1)
    DsirStore.applyDelta(spark, root, d1, pred, foldId = Some("f1"))
    val v1 = SnapshotRoot.currentVersion(root)
    val before = DsirStore.counts(spark, root)
      .agg(sum("tc"), sum("rc")).head()
    DsirStore.applyDelta(spark, root, d1, pred, foldId = Some("f1")) // replay
    assert(SnapshotRoot.currentVersion(root) == v1, "replay must not commit")
    val after = DsirStore.counts(spark, root)
      .agg(sum("tc"), sum("rc")).head()
    assert(before == after, "replay must not double-count")
    DsirStore.applyDelta(spark, root, d1, pred, foldId = Some("f2"))
    assert(SnapshotRoot.currentVersion(root) != v1)
  }

  test("bucket-count mismatch is refused before any mutation") {
    val docs = Seq((1L, "en", "a b"), (2L, "de", "c d"))
      .toDF("doc_id", "lang", "text")
    val root = tmp()
    DsirStore.writeCounts(docs, pred, root, buckets = 512)
    intercept[IllegalArgumentException] {
      DsirStore.applyDelta(spark, root, docs, pred, buckets = 1024)
    }
    intercept[IllegalArgumentException] {
      DsirStore.scoresFromState(spark, root, docs, pred, buckets = 1024)
    }
  }

  test("delta-born buckets join the model (not just count updates)") {
    val root = tmp()
    DsirStore.writeCounts(
      Seq((1L, "en", "alpha beta"), (2L, "de", "alpha")).toDF("doc_id", "lang", "text"),
      pred, root, buckets = 65536)
    val n0 = DsirStore.counts(spark, root).count()
    DsirStore.applyDelta(spark, root,
      Seq((3L, "de", "zzz-novel-token")).toDF("doc_id", "lang", "text"),
      pred, buckets = 65536, foldId = Some("f1"))
    assert(DsirStore.counts(spark, root).count() > n0,
      "a gram hashing to an unseen bucket must add a model row")
  }
}
