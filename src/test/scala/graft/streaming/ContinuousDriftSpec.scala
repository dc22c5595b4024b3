package graft.streaming

import graft.SparkSpec
import graft.model.Tables
import graft.ops.{DriftStore, SnapshotRoot}
import org.apache.spark.sql.functions._

/** Streaming drift maintenance (r10): a document stream drained under
  * foreachBatch + AvailableNow folds each microbatch into the persisted
  * profile — and the maintained store equals a whole-corpus profile of
  * baseline ∪ everything streamed. The monitoring mirror of
  * [[ContinuousDedupSpec]]/[[ContinuousAnnSpec]]. */
class ContinuousDriftSpec extends SparkSpec {

  test("3 microbatches maintain the profile == whole-corpus profile") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "source", "lang", "n_chars")
    val baseline = docs.filter(col("doc_id") % 4 === 0)
    val streamed = docs.filter(col("doc_id") % 4 =!= 0)
    val p = java.nio.file.Files.createTempDirectory("graft-cont-drift").toString
    DriftStore.writeProfile(baseline, s"$p/store")
    (1 to 3).foreach(i => docs.filter(col("doc_id") % 4 === i)
      .coalesce(1).write.parquet(s"$p/feed/b$i"))

    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$p/feed/b*")
    val nBatches = ContinuousDrift.run(stream, s"$p/store")
    assert(nBatches == 3, s"expected 3 microbatches, got $nBatches")
    assert(SnapshotRoot.currentVersion(s"$p/store") == "v4") // 1 + 3 folds

    def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.select("source", "lang", "c", "h").collect()
        .map(r => s"${r.getString(0)}|${r.getString(1)}|${r.getLong(2)}|" +
          r.getSeq[Long](3).mkString(","))
        .toSet
    val maintained = rows(DriftStore.profile(spark, s"$p/store"))
    val whole = rows(DriftStore.profileOf(baseline.unionByName(streamed)))
    assert(maintained == whole)
  }
}
