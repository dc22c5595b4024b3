package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.Trigger

/** Continuous ANN-index ingestion (r10): a STREAM of embedding batches
  * maintains the persisted IVF cell layout under `foreachBatch` +
  * `Trigger.AvailableNow` — the similarity-search mirror of
  * [[ContinuousDedup]], completing the streaming story for the second
  * pillar the way r10's incremental fold ([[graft.ops.IvfIndex
  * .appendIndexed]]) completed its batch story.
  *
  * Per microbatch: assign each vector to its nearest (FIXED) centroid
  * — the same shuffle-free per-row argmin the offline write used — and
  * append into only the touched cell directories of the live snapshot;
  * then roll oversized cells into the next snapshot version when their
  * file count passes `compactAt` ([[graft.ops.IvfIndex.compactCells]]),
  * so an always-on stream keeps the layout's file count bounded while
  * probes keep reading complete pinned snapshots.
  *
  * Equivalence (spec-gated): after the stream drains, a probe over the
  * maintained layout equals a probe over a full rebuild of
  * corpus ∪ all batches with the SAME model — per-fold equivalence
  * (cell assignment is a pure function of vector and centroids;
  * probes read per-cell row SETS, which file layout and compaction
  * don't affect) composes batch by batch.
  *
  * Scale shape: each microbatch pays O(batch) assignment + touched-cell
  * file adds (inc_ann_fixed_delta measured flat across corpus decades
  * in BENCH_SCALE); compaction pays O(oversized cells) when it fires.
  * State lives in the persisted layout, not Spark streaming state. */
object ContinuousAnn {

  /** Drain `stream` (one appendIndexed fold per microbatch) with
    * `Trigger.AvailableNow`; returns the number of non-empty batches
    * processed. The model must be the one that wrote the layout (the
    * [[graft.ops.IndexStore]] contract). */
  def run(stream: DataFrame, layoutPath: String, model: graft.ops.IvfIndex.Model,
      idCol: String = "vec_id", vecCol: String = "embedding",
      compactAt: Int = 32): Long = {
    val batches = new java.util.concurrent.atomic.AtomicLong(0L)
    val q = stream.writeStream
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        if (!batch.isEmpty) {
          batches.incrementAndGet()
          graft.ops.IvfIndex.appendIndexed(batch, layoutPath, model,
            idCol, vecCol, compactAt)
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    batches.get()
  }
}
