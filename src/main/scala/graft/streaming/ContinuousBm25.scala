package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.Trigger

/** Continuous BM25 index maintenance (r11): a STREAM of document
  * batches keeps the [[graft.ops.Bm25Index]] inverted index — and with
  * it the corpus's lexical-search surface — current under
  * `foreachBatch` + `Trigger.AvailableNow`, alongside its siblings
  * ([[ContinuousDedup]], [[ContinuousAnn]], [[ContinuousDrift]],
  * [[ContinuousSpans]]): state in crash-consistent persisted
  * snapshots, never the streaming state store; each microbatch pays
  * O(batch) — the index's tables are purely additive, so there is no
  * "affected corpus" term at all, and fold == rebuild holds under any
  * batch order. */
object ContinuousBm25 {

  /** Drain `stream` (one Bm25Index fold per microbatch); returns the
    * number of non-empty batches processed. The index at `root` must
    * exist (writeState first). Content-derived fold ids make replayed
    * batches no-op ([[Folds.contentFoldId]]); pass `checkpoint` for
    * restart-exactly-once file-source progress. */
  def run(stream: DataFrame, root: String, nBuckets: Int = 64,
      checkpoint: Option[String] = None): Long = {
    val batches = new java.util.concurrent.atomic.AtomicLong(0L)
    val q = Folds.withCheckpoint(stream.writeStream
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val b = batch.persist()
        try Folds.contentFoldId(b).foreach { fid =>
          batches.incrementAndGet()
          graft.ops.Bm25Index.applyDelta(
            b.sparkSession, root, b, nBuckets, foldId = Some(fid))
        } finally b.unpersist()
      }, checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    batches.get()
  }
}
