package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.Trigger

/** Continuous drift monitoring (r10): a STREAM of document batches
  * maintains the persisted corpus profile ([[graft.ops.DriftStore]])
  * under `foreachBatch` + `Trigger.AvailableNow` — the monitoring
  * mirror of [[ContinuousDedup]]/[[ContinuousAnn]], so all three
  * pillars (dedup, similarity, monitoring) share one operational
  * shape: state in crash-consistent persisted artifacts, never the
  * streaming state store; each microbatch pays only its own scan.
  *
  * Per microbatch: collapse the batch to its (source, lang) profile
  * and fold it into the store (counts sum, histogram partials add —
  * exact, so folds compose across batches in any arrival order).
  * After the stream drains, the store equals a whole-corpus profile
  * of everything ever streamed (spec-gated), and the batch drift
  * monitor replays it unchanged. */
object ContinuousDrift {

  /** Drain `stream` (one DriftStore fold per microbatch); returns the
    * number of non-empty batches processed. The store at `root` must
    * exist (write the baseline first — an empty-corpus baseline is
    * fine). A CONTENT-derived batch identity ([[Folds.contentFoldId]])
    * rides into the store's fold ledger, so a restarted or re-run
    * drain that replays a batch no-ops instead of silently
    * double-counting the profile (the counts carry no doc identity to
    * guard on — the ledger IS the replay protection). Content beats
    * the per-run `batchId` here (ADVICE r10): without a durable
    * checkpoint every drain restarts batch ids at 0, and an id-keyed
    * ledger would silently DROP a second feed's genuinely new batches.
    * Pass `checkpoint` for restart-exactly-once file-source progress. */
  def run(stream: DataFrame, root: String,
      checkpoint: Option[String] = None): Long = {
    val batches = new java.util.concurrent.atomic.AtomicLong(0L)
    val q = Folds.withCheckpoint(stream.writeStream
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val b = batch.persist()
        try Folds.contentFoldId(b).foreach { fid =>
          batches.incrementAndGet()
          graft.ops.DriftStore.applyDelta(b.sparkSession, root, b,
            foldId = Some(fid))
        } finally b.unpersist()
      }, checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    batches.get()
  }
}
