package graft.streaming

import graft.SparkSpec
import graft.model.Tables
import graft.ops.{DupSpans, IncrementalSpans, SnapshotRoot}
import org.apache.spark.sql.functions._

/** Streaming span maintenance (r10): a document stream drained under
  * foreachBatch + AvailableNow folds each microbatch into the span
  * state — and the maintained span table equals a batch re-derivation
  * over baseline ∪ everything streamed. */
class ContinuousSpansSpec extends SparkSpec {

  test("3 microbatches maintain the span table == batch spans over the union") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val baseline = docs.filter(col("doc_id") % 4 === 0)
    val streamed = docs.filter(col("doc_id") % 4 =!= 0)
    val p = java.nio.file.Files.createTempDirectory("graft-cont-spans").toString
    IncrementalSpans.writeState(baseline, s"$p/state", n = 8, nBuckets = 16)
    (1 to 3).foreach(i => docs.filter(col("doc_id") % 4 === i)
      .coalesce(1).write.parquet(s"$p/feed/b$i"))

    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$p/feed/b*")
    val nBatches = ContinuousSpans.run(stream, s"$p/state", n = 8, nBuckets = 16)
    assert(nBatches == 3, s"expected 3 microbatches, got $nBatches")
    assert(SnapshotRoot.currentVersion(s"$p/state") == "v4") // 1 + 3 folds

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val maintained = rows(IncrementalSpans.readSpans(spark, s"$p/state"))
    val whole = rows(DupSpans.duplicateSpans(
      baseline.unionByName(streamed), n = 8))
    assert(maintained == whole)
  }
}
