package graft.streaming

import graft.api.MetricView
import graft.mat.VersionedTable
import graft.plan.Expander
import graft.spec.MatViewSpec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Incremental maintenance of aggregated rollups — the engine-native
  * version of the reference's "incremental refresh whenever possible"
  * (README.md:118, Lakeflow pipeline; SURVEY.md §2.9 T2).
  *
  * Because rollups store *decomposed partials* (sum/count/min/max —
  * graft.mat.Materializer), a batch of new source rows folds in with a
  * partial-aggregate union + re-aggregate: old partials ⊎ batch
  * partials → groupBy dims → merged partials. sum/count are always
  * incrementable; min/max only under append-only sources (enforced
  * here by contract — streaming file sources are append-only). HLL
  * sketch partials (approx-distinct measures) fold by register-max
  * union — also append-only-exact, estimates identical to a full
  * rebuild (StreamingSpec).
  *
  * Runs as Structured Streaming `foreachBatch` + Trigger.AvailableNow:
  * each invocation drains newly-arrived files and folds them into the
  * rollup. Each fold writes a NEW [[VersionedTable]] snapshot and flips
  * the pointer atomically, so concurrent readers keep a complete stale
  * snapshot mid-fold — the reference's `mode: relaxed` semantics
  * (schema.yml:108).
  *
  * Scale: a fold costs O(|batch| + |rollup|), never a source rescan —
  * at 100 TB the rollup side is |dim-combination| rows, so maintenance
  * cost tracks the arrival rate, not the table size.
  */
final class IncrementalMaterializer(
    spark: SparkSession,
    workDir: String,
    checkpointDir: String,
    resolve: String => DataFrame = name =>
      sys.error(s"incremental materializer has no resolver for joined source '$name'")) {

  private def rollupPath(view: String, mv: String) = s"$workDir/$view/$mv"

  /** Partial-agg frame of one batch of source rows for a rollup. The
    * batch stands in for the view source inside the full row-level
    * expansion, so semantic joins and the view filter apply to it
    * exactly as in a batch build (dim tables resolve via `resolve`;
    * they're treated as slowly-changing — the standard incremental-MV
    * contract for star joins). */
  private def batchPartials(v: MetricView, mv: MatViewSpec, batch: DataFrame): DataFrame = {
    val dimCols = mv.dimensions.map(d => Expander.dimCol(spark, v.spec, d))
    val partials = graft.plan.AggDecompose.distinctPartials(
      mv.measures.flatMap(m => v.decomposed(v.spec.measure(m)).get.partials)).map(_.agg)
    val needed = mv.dimensions.map(v.spec.dimension(_).expr) ++
      mv.measures.map(v.spec.measure(_).expr)
    val rows = Expander.rowLevel(spark, v.spec,
      name => if (name == v.spec.source) batch else resolve(name), needed)
    rows.groupBy(dimCols: _*).agg(partials.head, partials.tail: _*)
  }

  /** Merge partial frames: union → groupBy dims → re-merge partials
    * (sum of sums, sum of counts, min of mins, max of maxs). */
  private def merge(v: MetricView, mv: MatViewSpec, frames: Seq[DataFrame]): DataFrame = {
    val merged = frames.reduce(_.unionByName(_))
    val mergeAggs = graft.plan.AggDecompose.distinctPartials(
      mv.measures.flatMap(m => v.decomposed(v.spec.measure(m)).get.partials))
      .map(p => p.reagg(p.name).as(p.name))
    merged.groupBy(mv.dimensions.map(col): _*).agg(mergeAggs.head, mergeAggs.tail: _*)
  }

  /** Applied-fold ids recorded with a rollup's live snapshot — the
    * replay guard for daemon use (the DriftStore ledger pattern: the
    * ledger commits atomically with the snapshot flip, so a fold that
    * died mid-write leaves the previous snapshot AND its ledger). */
  def appliedFolds(view: String, mv: String): Set[String] =
    ledgerOf(rollupPath(view, mv))

  private def ledgerOf(path: String): Set[String] =
    VersionedTable.currentPath(path)
      .map(p => java.nio.file.Paths.get(p, "_folds"))
      .filter(java.nio.file.Files.exists(_))
      .map(p => new String(java.nio.file.Files.readAllBytes(p))
        .split("\n").filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty)

  /** Fold one micro-batch of new source rows into every aggregated
    * rollup of the view. The merged snapshot lands in a fresh version
    * directory (reading the old snapshot while writing the new one is
    * safe — they are different directories), then the pointer flips.
    * With `foldId` (daemon use), an id already in the snapshot's
    * ledger no-ops — a retried batch must not double-merge partials,
    * the sum-family analogue of the disjoint-ids guards elsewhere. */
  def foldBatch(v: MetricView, batch: DataFrame, foldId: Option[String] = None): Unit = {
    v.spec.materialization.toSeq.flatMap(_.materializedViews).filter(_.isAggregated)
      .foreach { mv =>
        val path = rollupPath(v.name, mv.name)
        val applied = ledgerOf(path)
        if (!foldId.exists(applied.contains)) {
          val fresh = batchPartials(v, mv, batch)
          val updated =
            if (VersionedTable.exists(path))
              merge(v, mv, Seq(VersionedTable.read(spark, path), fresh))
            else fresh
          VersionedTable.write(updated, path, extras = foldId
            .map(f => Map("_folds" -> (applied + f).mkString("\n")))
            .getOrElse(Map.empty))
        }
      }
  }

  /** Partition-aware fold: maintains each aggregated rollup as a
    * Hive-partitioned parquet layout keyed on `partitionCol` (which
    * must be one of the rollup's dimensions, low-cardinality by the
    * layout contract — [[graft.ops.Bucketing.writePartitioned]]), and
    * rewrites ONLY the partitions whose values appear in the batch:
    *
    *  1. batch partials → the set of touched partition values (a
    *     handful of values by the low-cardinality contract);
    *  2. prior state for JUST those partitions (the filter prunes at
    *     the directory level — untouched partitions are never read);
    *  3. merge → dynamic partition overwrite, which replaces only the
    *     directories present in the merged frame.
    *
    * Untouched partition directories keep their files byte-for-byte
    * (mtime-gated in StreamingSpec), so a delta that lands in one
    * day/status/shard costs O(|batch| + |touched partitions|) in both
    * read AND write — at 100 TB the difference between rewriting a
    * partition and rewriting the table every refresh. Trade vs the
    * [[VersionedTable]] fold ([[foldBatch]]): per-partition commit
    * atomicity instead of whole-snapshot, the standard in-place
    * Hive/Spark contract (see writePartitioned's scaladoc).
    */
  def foldBatchPartitioned(v: MetricView, batch: DataFrame, partitionCol: String): Unit = {
    import org.apache.spark.sql.functions.col
    v.spec.materialization.toSeq.flatMap(_.materializedViews).filter(_.isAggregated)
      .foreach { mv =>
        require(mv.dimensions.contains(partitionCol),
          s"partition column '$partitionCol' is not a dimension of rollup '${mv.name}'")
        val path = s"${rollupPath(v.name, mv.name)}_bypart"
        val fresh = batchPartials(v, mv, batch)
        val updated = if (new java.io.File(path).isDirectory) {
          val touched = fresh.select(partitionCol).distinct().collect().map(_.get(0)).toSeq
          // partitioned reads surface the partition column with an
          // INFERRED type and at the end of the schema — cast it back
          // so unionByName inside merge() lines up
          val old = spark.read.parquet(path)
            .withColumn(partitionCol,
              col(partitionCol).cast(fresh.schema(partitionCol).dataType))
            .filter(col(partitionCol).isin(touched: _*))
          merge(v, mv, Seq(old, fresh))
        } else fresh
        // stage the merged frame before the overwrite: Spark (rightly)
        // refuses a write whose plan still reads the destination path,
        // and the stage keeps the merge re-runnable if the commit dies
        val stage = s"$path._stage"
        updated.write.mode("overwrite").parquet(stage)
        graft.ops.Bucketing.writePartitioned(spark.read.parquet(stage), path,
          Seq(partitionCol), dynamicOverwrite = true)
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(stage))
      }
  }

  /** Streaming driver for the partition-aware fold — same shape as
    * [[maintain]], rewriting only touched partitions per micro-batch. */
  def maintainPartitioned(v: MetricView, stream: DataFrame, partitionCol: String): Unit = {
    val q = stream.writeStream
      .foreachBatch((batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        foldBatchPartitioned(v, batch.toDF(), partitionCol))
      .option("checkpointLocation", s"$checkpointDir/${v.name}_bypart")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Maintain the rollups from a streaming source of new rows: drains
    * available input (Trigger.AvailableNow) and folds each micro-batch.
    * The checkpoint remembers which files were already folded, so the
    * first call builds the rollup from scratch and every later call
    * touches only the delta. */
  def maintain(v: MetricView, stream: DataFrame): Unit = {
    val q = stream.writeStream
      .foreachBatch((batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        foldBatch(v, batch.toDF()))
      .option("checkpointLocation", s"$checkpointDir/${v.name}")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Forget fold progress (spec changed → rollups were reset; the next
    * maintain() must re-fold from the beginning of the source). */
  def resetCheckpoint(v: MetricView): Unit =
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(s"$checkpointDir/${v.name}"))
}
