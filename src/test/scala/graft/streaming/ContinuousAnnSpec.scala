package graft.streaming

import graft.SparkSpec
import graft.model.Tables
import graft.ops.{IndexStore, IvfIndex, SnapshotRoot}
import org.apache.spark.sql.functions._

/** Streaming ANN ingestion (r10): an embedding stream drained under
  * foreachBatch + AvailableNow maintains the persisted IVF cell layout
  * — and the maintained layout probes identically to a same-model full
  * rebuild over the union. The similarity-search mirror of
  * [[ContinuousDedupSpec]]. */
class ContinuousAnnSpec extends SparkSpec {

  test("3 microbatches maintain the IVF layout == same-model rebuild; compaction fires in-stream") {
    val emb = Tables.embeddings(spark, sfDir)
    val corpus = emb.filter(col("vec_id") % 4 === 0)
    val streamed = emb.filter(col("vec_id") % 4 =!= 0)
    val p = java.nio.file.Files.createTempDirectory("graft-cont-ann").toString
    // offline job: train on the corpus, persist model + layout
    val model = IvfIndex.train(corpus)
    IndexStore.saveIvf(model, p)
    IvfIndex.writeIndexed(corpus, s"$p/layout", model)
    (1 to 3).foreach(i => emb.filter(col("vec_id") % 4 === i)
      .coalesce(1).write.parquet(s"$p/feed/b$i"))

    val stream = spark.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$p/feed/b*")
    // compactAt=1 so the stream itself exercises the snapshot roll
    val nBatches = ContinuousAnn.run(stream, s"$p/layout",
      IndexStore.loadIvf(p), compactAt = 1)
    assert(nBatches == 3, s"expected 3 microbatches, got $nBatches")
    assert(SnapshotRoot.currentVersion(s"$p/layout") != "v1",
      "compaction at compactAt=1 never rolled a snapshot across 3 folds")

    val queries = emb.filter(col("vec_id") < 10)
    IvfIndex.writeIndexed(corpus.unionByName(streamed), s"$p/rebuild", model)
    val got = IvfIndex.topKIndexed(spark, s"$p/layout", queries, k = 5, model)
      .collect().map(_.toSeq).toSet
    val expected = IvfIndex.topKIndexed(spark, s"$p/rebuild", queries, k = 5, model)
      .collect().map(_.toSeq).toSet
    assert(got == expected,
      s"probe diff: ${(expected diff got).take(3)} / ${(got diff expected).take(3)}")
  }
}
