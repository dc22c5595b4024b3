package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table co-location: the storage-level answer to "this join
  * shuffles the fact table every night".
  *
  * A table written with `bucketBy(n, key)` is hash-partitioned into n
  * files per write-task group AND records that layout in the catalog;
  * a join or aggregation keyed on the bucket column then reuses the
  * on-disk distribution — Catalyst plans NO ShuffleExchange for that
  * side (gated in BucketingSpec with broadcast disabled). At 100 TB
  * this is the difference between re-shuffling the corpus per join and
  * shuffling it ONCE at write time, amortized over every downstream
  * fact⟕fact join, dedup-pair join-back and rollup rebuild keyed the
  * same way; `sortBy` additionally pre-orders within buckets so
  * sort-merge joins skip their sort when bucket files are aligned.
  *
  * Bucket count is a capacity knob, not a semantics knob: pick
  * `|table| / n` ≈ a healthy file size (128MB-1GB); both sides of a
  * co-located join must use the SAME count (Spark joins differing
  * counts by shuffling the smaller-bucketed side).
  */
object Bucketing {

  /** Write `df` as a bucketed (optionally bucket-sorted) managed
    * parquet table — the one shuffle this data will ever pay for joins
    * on `bucketCols`. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    require(bucketCols.nonEmpty && buckets > 0)
    // the stale-location cleanup below deletes a path DERIVED from the
    // table name — gate the name first so a hostile/typo'd name ("../x",
    // "a/b") can never resolve outside the warehouse dir (ADVICE r7)
    require(table.nonEmpty && !table.contains("/") && !table.contains("\\")
      && !table.contains("..") && !table.exists(_.isWhitespace)
      // backticks unescape in the DROP statement to a DIFFERENT table
      // than the path the cleanup deletes - reject them too
      && !table.contains("`") && !table.exists(_.isControl),
      s"unsafe table name: '$table'")
    val spark = df.sparkSession
    // with the in-memory catalog, table METADATA dies with the session
    // but the managed LOCATION survives — a fresh session's create then
    // fails LOCATION_ALREADY_EXISTS. Overwrite semantics here mean
    // "replace whatever a previous life left behind". Hadoop Path (not
    // java.net.URI) resolves the warehouse dir: it accepts plain paths,
    // file: URIs, spaces, and remote schemes alike.
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val warehouse = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"))
    val loc = new org.apache.hadoop.fs.Path(warehouse, table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** True iff the compiled physical plan contains a shuffle — the
    * property bucketing exists to remove (spec gate + a cheap
    * assertion harness for callers). Descends into AQE wrappers; for a
    * not-yet-executed adaptive plan this reflects the INITIAL plan, so
    * assert with `spark.sql.adaptive.enabled=false` (the repo's plan-
    * gate convention, PlanQualitySpec) or after an action. */
  def hasShuffle(df: DataFrame): Boolean = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scan(p: SparkPlan): Boolean = p match {
      case a: AdaptiveSparkPlanExec => scan(a.executedPlan)
      case q: QueryStageExec => scan(q.plan)
      case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => true
      case other => other.children.exists(scan)
    }
    scan(df.queryExecution.executedPlan)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** Hive-style partitioned parquet layout — the OTHER storage-layout
    * lever: bucketing co-locates by hash for joins, directory
    * partitioning prunes by VALUE for filters. A predicate on the
    * partition column never opens non-matching files (gated in
    * BucketingSpec via FileSourceScanExec.partitionFilters), which at
    * 100 TB is the difference between scanning a day and scanning a
    * decade. Partition by LOW-cardinality columns only (year/date/
    * source shard) — one directory per value.
    *
    * `dynamicOverwrite=true` switches overwrite from "truncate the
    * whole layout" to "replace ONLY the partitions present in `df`"
    * (Spark's dynamic partitionOverwriteMode): the refresh lever for
    * incremental maintenance — untouched partition directories keep
    * their files byte-for-byte, so a delta fold rewrites O(|touched
    * partitions|), never the table. The trade vs [[graft.mat.VersionedTable]]
    * is atomicity GRAIN: each partition commit is atomic (staged then
    * moved), but a reader scanning across partitions mid-refresh can
    * see old partition A with new partition B — the standard
    * Hive/Spark in-place contract; a transactional table format gives
    * both, which is what a production 100 TB deployment would layer
    * on top. */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String], dynamicOverwrite: Boolean = false): Unit = {
    require(partitionCols.nonEmpty)
    // Cluster rows by the partition values first: without this, every
    // upstream task holding rows for k partition values opens k output
    // files, fanning |shuffle partitions| × |values| small files per
    // table (a 64-bucket store written from 32 tasks emitted up to
    // 2048 files — the r11 BM25 index-build bottleneck). One hash
    // shuffle puts each value's rows in one task, so each partition
    // directory lands as one file per write. At 100 TB grain a single
    // file per partition value is the wrong trade (one task per value
    // caps write parallelism); spark.sql.files.maxRecordsPerFile is
    // the production knob for re-splitting — here bucket counts exceed
    // core counts, so parallelism is preserved.
    val w = df.repartition(partitionCols.map(org.apache.spark.sql.functions.col): _*)
      .write.mode("overwrite").partitionBy(partitionCols: _*)
    // writer-level option beats the session conf, so one call site
    // opting in never flips the mode for unrelated writes
    (if (dynamicOverwrite) w.option("partitionOverwriteMode", "dynamic") else w)
      .parquet(path)
  }
}
