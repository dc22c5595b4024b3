package graft.streaming

import graft.api.MetricView
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
  * here by contract — streaming file sources are append-only).
  *
  * Runs as Structured Streaming `foreachBatch` + Trigger.AvailableNow:
  * each invocation drains newly-arrived files and folds them into the
  * rollup atomically (write-then-swap), serving stale reads meanwhile —
  * the reference's `mode: relaxed` semantics (schema.yml:108).
  */
final class IncrementalMaterializer(
    spark: SparkSession,
    workDir: String,
    checkpointDir: String) {

  private def rollupPath(view: String, mv: String) = s"$workDir/$view/$mv"

  /** Partial-agg frame of one batch of source rows for a rollup. */
  private def batchPartials(v: MetricView, mv: MatViewSpec, batch: DataFrame): DataFrame = {
    val dimCols = mv.dimensions.map(d => Expander.dimCol(spark, v.spec, d))
    val partials = mv.measures.flatMap(m => v.decomposed(v.spec.measure(m)).get.partials.map(_.agg))
    val filtered = v.spec.filter.fold(batch)(f => batch.filter(expr(f)))
    filtered.groupBy(dimCols: _*).agg(partials.head, partials.tail: _*)
  }

  /** Merge partial frames: union → groupBy dims → re-merge partials
    * (sum of sums, sum of counts, min of mins, max of maxs). */
  private def merge(v: MetricView, mv: MatViewSpec, frames: Seq[DataFrame]): DataFrame = {
    val merged = frames.reduce(_.unionByName(_))
    val partialCols = merged.columns.filterNot(mv.dimensions.contains)
    val mergeAggs = mv.measures.flatMap { m =>
      v.decomposed(v.spec.measure(m)).get.partials.map(p => p.reagg(p.name).as(p.name))
    }
    merged.groupBy(mv.dimensions.map(col): _*).agg(mergeAggs.head, mergeAggs.tail: _*)
  }

  /** Fold one micro-batch of new source rows into every aggregated
    * rollup of the view. Atomic swap via versioned directory + read
    * redirection is elided here (single overwrite after computing from
    * the previous snapshot into memory). */
  def foldBatch(v: MetricView, batch: DataFrame): Unit = {
    v.spec.materialization.toSeq.flatMap(_.materializedViews).filter(_.isAggregated)
      .foreach { mv =>
        val path = rollupPath(v.name, mv.name)
        val fresh = batchPartials(v, mv, batch)
        val updated =
          if (new java.io.File(path).exists()) {
            val old = spark.read.parquet(path)
            merge(v, mv, Seq(old, fresh)).localCheckpoint(true) // cut lineage before overwrite
          } else fresh.localCheckpoint(true)
        updated.write.mode("overwrite").parquet(path)
      }
  }

  /** Maintain the rollups from a streaming source of new rows: drains
    * available input (Trigger.AvailableNow) and folds each micro-batch. */
  def maintain(v: MetricView, stream: DataFrame): Unit = {
    val q = stream.writeStream
      .foreachBatch((batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        foldBatch(v, batch.toDF()))
      .option("checkpointLocation", s"$checkpointDir/${v.name}")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
