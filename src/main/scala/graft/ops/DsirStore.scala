package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted DSIR model store: the O(delta) path for keeping the
  * importance-weight model current as the corpus grows, and for
  * scoring candidate pools against a FIXED reference model — DSIR's
  * deployment shape (fit on the reference + a raw sample once, then
  * score every incoming crawl batch).
  *
  * The state is [[Dsir]]'s bucket-grain model — (b, tc, rc), ≤
  * `buckets` rows of plain summable longs — so a fold merges a delta
  * batch's counts by element-wise sum: EXACT, order-free, and
  * fold==rebuild holds by construction (q_dsir_incremental hash-gates
  * it against the batch SQL). Like [[DriftStore]], the store is
  * metadata-scale, so each fold rewrites it whole into the next
  * [[SnapshotRoot]] version (atomic pointer flip, one superseded
  * version retained, GC); a replayed batch no-ops via the fold-id
  * ledger committed inside the version directory.
  *
  * The target predicate is the caller's contract: folds must tag
  * deltas with the SAME predicate the store was initialized with
  * (it cannot be serialized — it is an arbitrary Column). The bucket
  * count IS stored and enforced (`_params`, the [[Bm25Index]] guard
  * pattern): a mismatched B would hash features into different
  * buckets and silently corrupt the model. */
object DsirStore {

  private def paramsLine(buckets: Int) = s"dsir v1 buckets=$buckets"

  private def requireSameParams(root: String, buckets: Int): Unit = {
    val p = java.nio.file.Paths.get(root, "_params")
    val stored = new String(java.nio.file.Files.readAllBytes(p), "UTF-8").trim
    require(stored == paramsLine(buckets),
      s"dsir-store params mismatch: store has '$stored', caller wants " +
        s"'${paramsLine(buckets)}' — mismatched buckets corrupt the model")
  }

  /** Initialize from a corpus scan (the one-time model fit). */
  def writeCounts(docs: DataFrame, targetPred: Column, root: String,
      buckets: Int = 4096, idCol: String = "doc_id",
      textCol: String = "text"): Unit = {
    val dbc = Dsir.docBucketCounts(docs, targetPred, buckets, idCol, textCol, Nil)
    SnapshotRoot.initRoot(root, Dsir.modelOf(dbc).repartition(1), Nil)
    // commit manifest at init (r14, the DriftStore rule): the fold's
    // merge-rewrite reads the whole live model — refuse short listings
    BucketStore.recordManifest(s"$root/v1", "model",
      BucketStore.countFlatData(s"$root/v1"))
    java.nio.file.Files.write(java.nio.file.Paths.get(root, "_params"),
      paramsLine(buckets).getBytes("UTF-8"))
  }

  /** Fold a delta batch's counts into the stored model — one delta
    * scan, element-wise sum merge, next-version commit. Replays of a
    * `foldId` already in the live ledger no-op. */
  def applyDelta(spark: SparkSession, root: String, delta: DataFrame,
      targetPred: Column, buckets: Int = 4096, idCol: String = "doc_id",
      textCol: String = "text", foldId: Option[String] = None): Unit = {
    requireSameParams(root, buckets)
    val cur = SnapshotRoot.currentDir(root)
    val ledger = java.nio.file.Paths.get(cur, "_applied_folds")
    val applied =
      if (java.nio.file.Files.exists(ledger))
        java.nio.file.Files.readAllLines(ledger).toArray(Array.empty[String]).toSeq
      else Seq.empty[String]
    if (foldId.exists(applied.contains)) return // replay: already folded

    // manifest guard (r14): a short listing of the live model would
    // silently drop bucket counts into the merged next version
    val liveFiles = SnapshotRoot.listDir(new java.io.File(cur))
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(_.toString).toIndexedSeq
    BucketStore.checkManifest(cur, "model", liveFiles.length)
    val deltaModel = Dsir.modelOf(
      Dsir.docBucketCounts(delta, targetPred, buckets, idCol, textCol, Nil))
    // read EXACTLY the manifest-checked files (BucketStore.readExact
    // rationale): the merge REPLACES the whole model — a silently
    // short spark.read listing would truncate it permanently
    val merged = spark.read.parquet(liveFiles: _*).unionByName(deltaModel)
      .groupBy("b").agg(sum("tc").as("tc"), sum("rc").as("rc"))
    val next = SnapshotRoot.nextVersion(root)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$root/$next"))
    merged.repartition(1).write.parquet(s"$root/$next")
    BucketStore.recordManifest(s"$root/$next", "model",
      BucketStore.countFlatData(s"$root/$next"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/$next", "_applied_folds"),
      (applied ++ foldId).mkString("\n").getBytes("UTF-8"))
    SnapshotRoot.flipAndGc(root, next)
  }

  /** The live model counts (readers pin the resolved snapshot; Spark's
    * planned listing is manifest-checked — VERDICT r15 task 2). */
  def counts(spark: SparkSession, root: String): DataFrame = {
    val cur = SnapshotRoot.currentDir(root)
    BucketStore.checkPlannedListing(spark.read.parquet(cur), cur, "model")
  }

  /** Score a candidate pool against the STORED model (pool rows
    * matching `targetPred` are the reference, not candidates — same
    * semantics as [[Dsir.scores]]). Cost: one pool scan + the
    * metadata-scale model read; the corpus the model was fitted on is
    * never touched. */
  def scoresFromState(spark: SparkSession, root: String, pool: DataFrame,
      targetPred: Column, buckets: Int = 4096, idCol: String = "doc_id",
      textCol: String = "text", carry: Seq[String] = Seq("source")): DataFrame = {
    requireSameParams(root, buckets)
    val model = Persists.cacheFor(counts(spark, root), 2)
    val dbc = Dsir.docBucketCounts(pool, targetPred, buckets, idCol, textCol, carry)
    Dsir.scoreAgainst(dbc, model, buckets, idCol, carry)
  }
}
