package graft.streaming

import graft.SparkSpec
import graft.model.Tables
import graft.ops.{Bm25, Bm25Index, SnapshotRoot}
import org.apache.spark.sql.functions._

/** Streaming BM25 maintenance (r11): a document stream drained under
  * foreachBatch + AvailableNow folds each microbatch into the inverted
  * index — and the maintained index serves scores equal to batch
  * scoring over baseline ∪ everything streamed. */
class ContinuousBm25Spec extends SparkSpec {

  test("3 microbatches maintain the index == batch scores over the union") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "source", "text")
    val baseline = docs.filter(col("doc_id") % 4 === 0)
    val p = java.nio.file.Files.createTempDirectory("graft-cont-bm25").toString
    Bm25Index.writeState(baseline, s"$p/state", nBuckets = 16)
    (1 to 3).foreach(i => docs.filter(col("doc_id") % 4 === i)
      .coalesce(1).write.parquet(s"$p/feed/b$i"))

    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$p/feed/b*")
    val nBatches = ContinuousBm25.run(stream, s"$p/state", nBuckets = 16)
    assert(nBatches == 3, s"expected 3 microbatches, got $nBatches")
    assert(SnapshotRoot.currentVersion(s"$p/state") == "v4") // 1 + 3 folds

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(Bm25Index.scoresFromState(spark, s"$p/state",
        "dup merge stream window", nBuckets = 16)) ==
      rows(Bm25.scores(docs, "dup merge stream window")))
  }
}
