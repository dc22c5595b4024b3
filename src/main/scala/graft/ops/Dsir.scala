package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al.,
  * NeurIPS 2023): score each raw-pool document by how much more likely
  * a hashed n-gram bag-of-words model of the TARGET distribution makes
  * it than the same model of the RAW distribution, then keep the top
  * of the pool. The flagship "make the crawl look like the reference
  * corpus" selection method; the importance weight of a document is
  * Π p_target(f)/p_raw(f) over its features, scored here in log space.
  *
  * Features are unigrams + bigrams hashed into `buckets` buckets
  * ([[Sampling.md5Bucket]] over the gram text — md5, not xxhash64, so
  * any engine reproduces bucket membership bit-for-bit), counts
  * add-one smoothed. Per-bucket log weights
  * `log((tc_b+1)/(T+B)) − log((rc_b+1)/(R+B))` are rounded to 6dp ONCE
  * and fixed as DECIMAL(18,6); each document's log weight is then
  * Σ c_b(doc)·lw_b in EXACT decimal arithmetic (order-free — the
  * [[UnigramLm]] determinism contract), so scores are identical at any
  * partitioning and hash-oracle-able cross-engine.
  *
  * Scale shape: features never shuffle at token grain — one
  * (doc, bucket) partial-agg shuffle (map-side combine collapses
  * repeats; bucket grain is bounded by `buckets`, not vocab), one
  * bucket-grain model aggregate (≤ B rows — broadcast-sized by
  * construction, whatever the corpus), one join of doc-bucket counts
  * against the B-row weight table, one doc-grain aggregate. The two
  * corpus totals are a 1-row collect (driver metadata). Selection
  * downstream is `ORDER BY score LIMIT k` (TakeOrdered — per-partition
  * heaps, no global sort) or a threshold filter.
  *
  * The model counts are plain summable longs, so they also persist and
  * FOLD incrementally ([[DsirStore]] — fit the reference model once,
  * keep it current at O(delta), score any candidate pool against the
  * stored state). */
object Dsir {

  /** Unigram + bigram features of a token array, built in-row (narrow,
    * codegen HOFs — no token-grain shuffle). */
  private def feats(tokens: Column): Column = {
    val bigrams = zip_with(slice(tokens, lit(1), size(tokens) - 1),
      slice(tokens, lit(2), size(tokens) - 1),
      (a, b) => concat(a, lit(" "), b))
    concat(tokens, when(size(tokens) >= 2, bigrams).otherwise(array()))
  }

  /** One row per (doc, feature bucket): (idCol, carry..., __t, b, c).
    * The single token-derived shuffle in the operator — map-side
    * combined at (doc, bucket) grain. */
  private[ops] def docBucketCounts(docs: DataFrame, targetPred: Column,
      buckets: Int, idCol: String, textCol: String,
      carry: Seq[String]): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val base = docs.filter(length(trim(col(textCol))) > 0)
      .withColumn("__t", coalesce(targetPred, lit(false)))
    base.select((col(idCol) +: carry.map(col)) ++ Seq(col("__t"),
      explode(feats(TextOps.tokensOf(docs, textCol, lowered = true))).as("g")): _*)
      .withColumn("b", Sampling.md5Bucket(col("g")) % buckets)
      .groupBy((col(idCol) +: carry.map(col)) ++ Seq(col("__t"), col("b")): _*)
      .agg(count(lit(1)).as("c"))
  }

  /** Bucket-grain model counts (b, tc, rc) — ≤ `buckets` rows. */
  private[ops] def modelOf(dbc: DataFrame): DataFrame =
    dbc.groupBy("b").agg(
      sum(when(col("__t"), col("c")).otherwise(0L)).as("tc"),
      sum(when(!col("__t"), col("c")).otherwise(0L)).as("rc"))

  /** Score the raw-pool rows of `dbc` against `model`. `model` must be
    * registered for 2 actions by the caller (the totals head() here +
    * the terminal action). */
  private[ops] def scoreAgainst(dbc: DataFrame, model: DataFrame,
      buckets: Int, idCol: String, carry: Seq[String]): DataFrame = {
    val tot = model.agg(sum("tc"), sum("rc")).head()
    require(!tot.isNullAt(0) && tot.getLong(0) > 0,
      "target predicate matched no features — no model to fit")
    val (t, r) = (tot.getLong(0), tot.getLong(1))
    val lw = model.select(col("b"),
      round(log((col("tc") + 1).cast("double") / lit((t + buckets).toDouble)) -
        log((col("rc") + 1).cast("double") / lit((r + buckets).toDouble)), 6)
        .cast("decimal(18,6)").as("lw"))
    dbc.filter(!col("__t")).join(lw, "b")
      .groupBy(col(idCol) +: carry.map(col): _*)
      .agg(sum(col("c").cast("decimal(18,0)") * col("lw")).as("__s"),
        sum("c").as("n_feats"))
      .withColumn("log_w", col("__s").cast("double"))
      .withColumn("log_w_per_feat",
        round(col("__s").cast("double") / col("n_feats"), 6))
      .drop("__s")
  }

  /** Per-document DSIR log importance weights for the RAW pool (docs
    * NOT matching `targetPred`): (idCol, carry..., n_feats, log_w,
    * log_w_per_feat). Higher = more target-like. Documents with no
    * tokens are excluded; the target docs themselves are the model,
    * not the pool. */
  def scores(docs: DataFrame, targetPred: Column, buckets: Int = 4096,
      idCol: String = "doc_id", textCol: String = "text",
      carry: Seq[String] = Seq("source")): DataFrame = {
    val dbc = Persists.cacheFor(
      docBucketCounts(docs, targetPred, buckets, idCol, textCol, carry), 2)
    val model = Persists.cacheFor(modelOf(dbc), 2)
    scoreAgainst(dbc, model, buckets, idCol, carry)
  }
}
