package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental near-dup dedup: match NEWLY-ARRIVED documents against a
  * persisted corpus index in O(delta) — the shape a continuously-fed
  * 100 TB training corpus actually needs. Re-running the batch
  * pipeline ([[MinHashLSH.candidatePairs]]) on corpus ∪ delta re-reads,
  * re-tokenizes and re-hashes the WHOLE corpus to dedup a day's
  * arrivals; here the corpus contributes only its once-written slim
  * band-bucket index (three fixed-width columns) plus one columnar
  * (id, text) scan in the verify stage — never a re-tokenize, re-hash
  * or text shuffle.
  *
  * Per-delta-batch cost, by stage (the "O(delta)" claim covers hash
  * and SHUFFLE work; two corpus-proportional SCANS remain — the slim
  * index stream and the verify stage's (id, text) column read — both
  * scan-bound and cheap relative to the re-hash they replace, which is
  * what the fixed-delta sweep measures: 1.85× cost for 100× corpus,
  * BENCH_SCALE_r08):
  *  - delta signatures: per-row, shuffle-free, O(delta);
  *  - bucket census: the delta's bucket set aggregates O(delta)
  *    rows, then a BROADCAST of that (tiny) set prunes the corpus
  *    bucket-count table — the corpus side streams, never shuffles;
  *  - pair generation: delta-banded ⋈ (index ∪ delta) members of
  *    surviving buckets, again broadcast on the delta side — buckets
  *    containing no delta doc never produce work;
  *  - verify: exact Jaccard over shingles of candidate ids only —
  *    shingles are BUILT for candidates only; the semi-join that
  *    prunes to candidates still reads the (id, text) columns of the
  *    full doc table (no id predicate reaches the scan).
  *
  * EQUIVALENCE CONTRACT (spec-gated, and the reason the DuckDB oracle
  * can hash-gate this operator): the output equals the batch pipeline
  * run on corpus ∪ delta, restricted to pairs involving ≥1 delta doc.
  * Bucket occupancy counts add (index ids and delta ids are disjoint
  * by contract), so the 2-to-maxBucketSize census over combined counts
  * is exactly the union pipeline's census on every bucket a delta doc
  * touches — and buckets untouched by the delta cannot produce a
  * delta-involving pair.
  */
object IncrementalDedup {

  /** Write the corpus's slim band-bucket index (band, bucket, doc_id)
    * plus its per-bucket occupancy census (band, bucket, n) — the
    * one-time O(corpus) cost every later delta batch amortizes. The
    * census is written so delta batches never re-aggregate the index;
    * both tables are ids-only (text never leaves the corpus store). */
  def writeIndex(corpus: DataFrame, path: String,
      textCol: String = "text", idCol: String = "doc_id",
      k: Int = 64, bands: Int = 16, w: Int = 3, seed: Long = 42L,
      salt: String = ""): Unit = {
    require(k % bands == 0, "k must be divisible by bands")
    val banded = Persists.cache(
      MinHashLSH.bandBuckets(
        MinHashLSH.sigTable(corpus, textCol, idCol, k, w, seed, salt), k, bands, salt)
        .select(col("__id").as("doc_id"), col("__band").as("band"),
          col("__bucket").as("bucket")))
    banded.write.mode("overwrite").parquet(s"$path/banded")
    banded.groupBy("band", "bucket").agg(count(lit(1)).as("n"))
      .write.mode("overwrite").parquet(s"$path/census")
    banded.unpersist()
    // record the hash-family parameters the index was built with:
    // probing with a different family yields silently-empty matches,
    // not an error — the IndexStore shape-header principle. The salt
    // itself is a per-run SECRET, so only its md5 is stored (enough to
    // detect a mismatch, not enough to reconstruct the fold state).
    java.nio.file.Files.write(java.nio.file.Paths.get(path).resolve("params"),
      paramsLine(k, bands, w, seed, salt).getBytes("UTF-8"))
  }

  private def paramsLine(k: Int, bands: Int, w: Int, seed: Long, salt: String): String = {
    val saltCheck = java.security.MessageDigest.getInstance("MD5")
      .digest(salt.getBytes("UTF-8")).map("%02x".format(_)).mkString
    s"k=$k bands=$bands w=$w seed=$seed saltMd5=$saltCheck"
  }

  private def requireSameParams(indexPath: String,
      k: Int, bands: Int, w: Int, seed: Long, salt: String): Unit = {
    val p = java.nio.file.Paths.get(indexPath).resolve("params")
    require(java.nio.file.Files.exists(p),
      s"no params file at $indexPath — not a writeIndex artifact")
    val stored = new String(java.nio.file.Files.readAllBytes(p), "UTF-8").trim
    val probe = paramsLine(k, bands, w, seed, salt)
    require(stored == probe,
      s"index at $indexPath was built with [$stored] but probed with [$probe] — " +
        "mismatched hash families silently miss every match; rebuild or re-probe")
  }

  /** Near-dup candidate pairs INVOLVING the delta, verified with exact
    * Jaccard. Output (a_id, b_id, jaccard), a_id < b_id — the batch
    * pipeline's shape, restricted to delta-involving pairs.
    *
    * @param allDocs corpus ∪ delta documents (text lookup for the
    *                verify stage only: a candidate-ids semi-join, so
    *                shingles are built for candidates only — the scan
    *                itself still reads the (id, text) columns)
    * @param delta   the newly-arrived docs; ids must be disjoint from
    *                the index's
    */
  def deltaPairs(spark: SparkSession, indexPath: String,
      allDocs: DataFrame, delta: DataFrame,
      textCol: String = "text", idCol: String = "doc_id",
      k: Int = 64, bands: Int = 16, w: Int = 3, seed: Long = 42L,
      maxBucketSize: Int = 1000, salt: String = ""): DataFrame =
    deltaPairsGuarded(spark, indexPath, allDocs, delta, textCol, idCol,
      k, bands, w, seed, maxBucketSize, salt).pairs

  /** [[deltaPairs]] plus the quarantine list — the adversarial posture
    * for the shape it matters MOST in: hostile content arrives as
    * deltas. Delta docs whose (combined-occupancy) buckets exceed
    * `maxBucketSize` surface in `quarantined` for exact verification
    * instead of silently skipping dedup. Probe parameters (k/bands/w/
    * seed/salt) must MATCH the index's — enforced against the stored
    * params file, because a mismatched hash family does not error, it
    * silently matches nothing.
    *
    * `broadcastDelta`: the delta-derived tables (bucket set, slim
    * banded rows) are broadcast by default — right whenever a batch of
    * arrivals fits executor/driver broadcast limits, which is the
    * normal ingest cadence. A backfill-sized delta (≫ millions of
    * docs) must pass false: the joins fall back to shuffles on the
    * bucket key and the corpus index pays one shuffle — still never a
    * re-hash. */
  def deltaPairsGuarded(spark: SparkSession, indexPath: String,
      allDocs: DataFrame, delta: DataFrame,
      textCol: String = "text", idCol: String = "doc_id",
      k: Int = 64, bands: Int = 16, w: Int = 3, seed: Long = 42L,
      maxBucketSize: Int = 1000, salt: String = "",
      broadcastDelta: Boolean = true): MinHashLSH.GuardedPairs = {
    require(k % bands == 0, "k must be divisible by bands")
    requireSameParams(indexPath, k, bands, w, seed, salt)
    val bc: DataFrame => DataFrame =
      if (broadcastDelta) broadcast(_) else identity

    // delta's slim banded table — cached: census, membership and pair
    // join all read it; fixed-width rows (the batch path's cache rule)
    val dBanded = Persists.cache(
      MinHashLSH.bandBuckets(
        MinHashLSH.sigTable(delta, textCol, idCol, k, w, seed, salt), k, bands, salt)
        .select(col("__id").as("doc_id"), col("__band").as("band"),
          col("__bucket").as("bucket")))

    // combined occupancy for the buckets the delta touches: delta count
    // + stored corpus count (0 when the bucket is new). A right-outer
    // join can't broadcast its preserved (small) side, so the combine
    // is a UNION of count contributions instead: the corpus census
    // STREAMS through a broadcast left-semi (its only role is serving
    // the counts of delta-touched buckets), then a sum over a
    // delta-bucket-sized table.
    val dCounts = dBanded.groupBy("band", "bucket").agg(count(lit(1)).as("n"))
    val cCensus = spark.read.parquet(s"$indexPath/census")
    val combined = Persists.cache(
      cCensus.join(bc(dCounts.select("band", "bucket")),
          Seq("band", "bucket"), "left_semi")
        .select(col("band"), col("bucket"), col("n"))
        .unionByName(dCounts)
        .groupBy("band", "bucket").agg(sum("n").as("n")))
    val okBuckets = Persists.cache(
      combined.filter(col("n") >= 2 && col("n") <= maxBucketSize)
        .select("band", "bucket"))
    // delta docs in over-cap buckets: excluded from pairing, handed
    // back for exact verification (see MinHashLSH.GuardedPairs)
    val quarantined = dBanded
      .join(bc(combined.filter(col("n") > maxBucketSize)
        .select("band", "bucket")), Seq("band", "bucket"), "left_semi")
      .select(col("doc_id").as(idCol))
      .distinct()

    // members of surviving delta-touched buckets: corpus index rows
    // (broadcast-semi-pruned — no index shuffle) ∪ the delta's own rows
    val members = spark.read.parquet(s"$indexPath/banded")
      .join(bc(okBuckets), Seq("band", "bucket"), "left_semi")
      .unionByName(dBanded.join(bc(okBuckets), Seq("band", "bucket"), "left_semi"))

    // delta-involving pairs only: the DELTA side broadcasts and the
    // member table streams, so buckets without a delta doc never
    // produce work and the corpus index never shuffles. Normalize to
    // a_id < b_id (delta⟷corpus AND delta⟷delta pairs both arise).
    val dSlim = dBanded.join(bc(okBuckets), Seq("band", "bucket"), "left_semi")
      .select(col("band"), col("bucket"), col("doc_id").as("d_id"))
    val pairs = Persists.cache(
      members.select(col("band"), col("bucket"), col("doc_id").as("o_id"))
        .join(bc(dSlim), Seq("band", "bucket"))
        .filter(col("d_id") =!= col("o_id"))
        .select(least(col("d_id"), col("o_id")).as("a_id"),
          greatest(col("d_id"), col("o_id")).as("b_id"))
        .dropDuplicates("a_id", "b_id"))

    val candIds = pairs.select(col("a_id").as("__id"))
      .union(pairs.select(col("b_id").as("__id"))).distinct()
    val sh = MinHashLSH.shingleLookup(allDocs, textCol, idCol, candIds, w)
    val verified = pairs
      .join(sh.select(col("__id").as("a_id"), col("__sh").as("a_sh")), "a_id")
      .join(sh.select(col("__id").as("b_id"), col("__sh").as("b_sh")), "b_id")
      .withColumn("jaccard", MinHashLSH.jaccardCol(col("a_sh"), col("b_sh")))
      .select("a_id", "b_id", "jaccard")
    MinHashLSH.GuardedPairs(verified, quarantined)
  }
}
