package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.Trigger

/** Continuous exact-substring span maintenance (r10): a STREAM of
  * document batches keeps the [[graft.ops.IncrementalSpans]] state —
  * and with it the corpus's duplicate-span map — current under
  * `foreachBatch` + `Trigger.AvailableNow`, the fourth member of the
  * continuous-pipeline family ([[ContinuousDedup]], [[ContinuousAnn]],
  * [[ContinuousDrift]]): state in crash-consistent persisted
  * snapshots, never the streaming state store; each microbatch pays
  * O(batch + affected docs).
  *
  * Per-fold equivalence (spans after a fold == batch spans over the
  * union, the q_dup_spans_incremental oracle contract) composes batch
  * by batch, so after the stream drains the maintained span table
  * equals a batch re-derivation over everything ever written —
  * spec-gated across 3 microbatches. */
object ContinuousSpans {

  /** Drain `stream` (one IncrementalSpans fold per microbatch);
    * returns the number of non-empty batches processed. The state at
    * `root` must exist (writeState first). Content-derived fold ids
    * make replayed batches no-op ([[Folds.contentFoldId]]); pass
    * `checkpoint` for restart-exactly-once file-source progress. */
  def run(stream: DataFrame, root: String, n: Int = 8,
      nBuckets: Int = 64, checkpoint: Option[String] = None): Long = {
    val batches = new java.util.concurrent.atomic.AtomicLong(0L)
    val q = Folds.withCheckpoint(stream.writeStream
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val b = batch.persist()
        try Folds.contentFoldId(b).foreach { fid =>
          batches.incrementAndGet()
          graft.ops.IncrementalSpans.applyDelta(
            b.sparkSession, root, b, n, nBuckets, foldId = Some(fid))
        } finally b.unpersist()
      }, checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    batches.get()
  }
}
