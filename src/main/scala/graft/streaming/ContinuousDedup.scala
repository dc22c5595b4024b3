package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.Trigger

/** Continuous dedup end-to-end (r10, VERDICT r9 task 5): a STREAM of
  * document batches maintains the whole dedup state — near-dup pair
  * log, band index, duplicate-cluster label store — under
  * `foreachBatch` + `Trigger.AvailableNow`, composing the pieces the
  * engine already owns:
  *
  *  1. [[graft.ops.IncrementalDedup.deltaPairs]] matches the batch
  *     against the persisted band index in O(batch) and the verified
  *     pairs append to a pairs log (the audit artifact a curation
  *     pipeline keeps);
  *  2. [[graft.ops.IncrementalDedup.applyDelta]] absorbs the batch
  *     into the index (banded rows, census contributions, id-bucketed
  *     doc store) so LATER batches match against it — match first,
  *     then absorb, per that method's order contract;
  *  3. [[graft.ops.IncrementalClusters.applyDelta]] folds the batch's
  *     structural keys into the persisted label store in
  *     O(batch + touched clusters), behind its crash-consistent
  *     snapshot flip.
  *
  * Equivalence (spec-gated, and what makes q_stream_curation
  * hash-oracle-able by the BATCH curation SQL): after the stream
  * drains, the label store equals batch CC over corpus ∪ all batches
  * (per-fold equivalence composes — the IncrementalClustersSpec
  * sequential-fold case generalizes batch-by-batch), and the pairs
  * log holds exactly the batch pipeline's pairs restricted to pairs
  * involving ≥1 streamed doc (every pair lands in the batch of its
  * LATER member, whose probe sees the earlier member through the
  * index).
  *
  * Scale shape: each microbatch pays the O(batch) probe + fold costs
  * measured flat across corpus decades in BENCH_SCALE (inc_dedup_*,
  * inc_clusters_*); the stream adds only microbatch scheduling. State
  * lives in the persisted artifacts, NOT in Spark streaming state —
  * the state store would re-shuffle corpus-scale state per batch,
  * while the artifacts are exactly the bucketed/pruned layouts the
  * incremental operators were built around.
  */
object ContinuousDedup {

  /** Process one arrived batch: match → log pairs → absorb into the
    * index → fold labels. `keyedOf` derives the cluster fold's input
    * (idCol, structural key columns, carried columns) from the raw
    * batch — key derivation runs INSIDE the batch, the streaming
    * posture (nothing precomputed outside the stream). */
  def processBatch(batch: DataFrame, indexPath: String, clusterPath: String,
      pairsLog: String, keyedOf: DataFrame => DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      keyCols: Seq[String] = Seq("k1", "k2"), nBuckets: Int = 64): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    graft.ops.IncrementalDedup.deltaPairs(spark, indexPath, batch, textCol, idCol)
      .write.mode("append").parquet(pairsLog)
    graft.ops.IncrementalDedup.applyDelta(spark, indexPath, batch, textCol, idCol)
    graft.ops.IncrementalClusters.applyDelta(spark, clusterPath, keyedOf(batch),
      idCol, keyCols, nBuckets)
  }

  /** Drain `stream` (one [[processBatch]] per microbatch) with
    * `Trigger.AvailableNow`; returns the number of non-empty batches
    * processed. Batches arrive in source order — the fold contract
    * (delta ids disjoint from state) is checked per fold. */
  def run(stream: DataFrame, indexPath: String, clusterPath: String,
      pairsLog: String, keyedOf: DataFrame => DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      keyCols: Seq[String] = Seq("k1", "k2"), nBuckets: Int = 64): Long = {
    val batches = new java.util.concurrent.atomic.AtomicLong(0L)
    val q = stream.writeStream
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        if (!batch.isEmpty) {
          batches.incrementAndGet()
          processBatch(batch, indexPath, clusterPath, pairsLog, keyedOf,
            idCol, textCol, keyCols, nBuckets)
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    batches.get()
  }
}
