package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic shuffle + shard export — the last stage of a training
  * pipeline: decorrelate document order from ingest/crawl order (a
  * corpus read in crawl order trains on topically-clumped batches) and
  * split the corpus into N reproducible shards whose contents and
  * intra-shard order depend only on (doc id, salt, N) — never on
  * cluster width, task scheduling, or input file layout. Reruns and
  * re-reads are byte-stable, which is what makes training jobs
  * resumable and data ablations comparable.
  *
  * The permutation key is two rounds of the MINSTD LCG
  * (x → 48271·x mod 2³¹−1, Park–Miller; public standard, used as a
  * hash here, not an RNG stream) over the salted id. Chosen over
  * xxhash64/md5 deliberately: the SAME arithmetic is expressible in
  * vanilla ANSI SQL without overflow — every intermediate stays under
  * (2³¹−1)·48271 ≈ 1.04e14 « 2⁶³, so the DuckDB oracle re-derives
  * shard assignment and order exactly and the driver hash-gates the
  * whole export manifest (a cross-engine-portable deterministic
  * shuffle is itself part of the operator's contract: any engine can
  * recompute which shard a document landed in).
  *
  * Scale shape: the key is a narrow per-row projection (codegen'd
  * integer arithmetic, no UDF); the export is ONE hash-shuffle on the
  * shard id (each shard's rows converge to one task, so each shard
  * directory gets exactly one sorted file) — at 100 TB you'd raise
  * `filesPerShard` to bound file size; rows then order-stable-split
  * WITHIN the shard by the same key, still scheduling-independent. */
object ShardExport {

  private val M = 2147483647L // 2^31 - 1 (prime)
  private val A = 48271L      // MINSTD multiplier

  /** The deterministic permutation key: two MINSTD rounds over the
    * salted id. Ids fold mod M first, so arbitrary 64-bit ids (e.g.
    * content hashes) never overflow on either engine. */
  def shuffleKey(id: Column, salt: Long): Column = {
    val x0 = pmod(id + lit(salt), lit(M))
    val x1 = pmod(x0 * lit(A), lit(M))
    pmod(x1 * lit(A), lit(M))
  }

  /** The same arithmetic in ANSI SQL (the oracle's recipe). `%` in
    * DuckDB is a true mod for the non-negative operands produced by
    * the inner fold. */
  def shuffleKeySql(idExpr: String, salt: Long): String =
    s"((($idExpr + $salt) % 2147483647) * 48271 % 2147483647) * 48271 % 2147483647"

  /** Add `shard` (pmod(key, nShards)) and `sort_key` columns. */
  def assign(df: DataFrame, idCol: String = "doc_id",
      nShards: Int = 16, salt: Long = 0L): DataFrame = {
    require(nShards > 0)
    val key = shuffleKey(col(idCol).cast("long"), salt)
    df.withColumn("sort_key", key)
      .withColumn("shard", pmod(col("sort_key"), lit(nShards.toLong)).cast("int"))
  }

  /** Write the export: one directory per shard, rows sorted by
    * (sort_key, id) inside each file. The single shuffle clusters each
    * shard into one task; `filesPerShard` > 1 order-stably splits a
    * shard by a second key level (`file_in_shard` becomes a nested
    * partition directory, so two groups sharing a shuffle task can
    * never merge into one file) for bounded file sizes at scale. */
  def write(df: DataFrame, path: String, idCol: String = "doc_id",
      nShards: Int = 16, salt: Long = 0L, filesPerShard: Int = 1): Unit = {
    require(filesPerShard > 0)
    val assigned = assign(df, idCol, nShards, salt)
      .withColumn("file_in_shard",
        pmod(col("sort_key"), lit(filesPerShard.toLong)).cast("int"))
    val clustered = assigned
      .repartition(col("shard"), col("file_in_shard"))
      .sortWithinPartitions(col("shard"), col("file_in_shard"),
        col("sort_key"), col(idCol))
    if (filesPerShard == 1)
      clustered.drop("file_in_shard")
        .write.mode("overwrite").partitionBy("shard").parquet(path)
    else
      clustered.write.mode("overwrite")
        .partitionBy("shard", "file_in_shard").parquet(path)
  }

  /** Per-shard export manifest: row count, token mass, and order
    * witnesses (first/last sort keys) — the oracle surface proving
    * assignment AND order are the deterministic recipe. */
  def summary(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", nShards: Int = 16, salt: Long = 0L): DataFrame =
    assign(df, idCol, nShards, salt)
      .withColumn("n_tokens", Packing.tokenCount(col(textCol)))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").cast("long").as("total_tokens"),
        min("sort_key").cast("long").as("first_key"),
        max("sort_key").cast("long").as("last_key"))
}
