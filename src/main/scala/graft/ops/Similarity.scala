package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search over an `array<float>` column.
  *
  * Baseline: brute-force cosine top-k (query-set × corpus join — exact;
  * right shape when |queries| ≪ |corpus|, the corpus side is scanned
  * once and never shuffled wide because the query side broadcasts).
  * Scale path: random-hyperplane LSH with L tables — candidates share a
  * bucket in ≥1 table; one shuffle on the bucket key. Hyperplanes are
  * derived deterministically from the seed via integer hashes, so plans
  * are reproducible across runs and engines.
  *
  * Dot products fold left-to-right over doubles (`zip_with` +
  * `aggregate`) — deterministic, and bit-identical to the same fold in
  * the DuckDB oracle.
  */
object Similarity {

  /** Left-to-right double dot-product fold of two float-array columns.
    * Native codegen expression — the HOF chain below is its executable
    * semantic spec (asserted equal, codegen on and off, in
    * SimilaritySpec); ArrayAggregate/ZipWith run interpreted and were
    * the hottest kernel in the r5 100× sweep's jstack. */
  def dot(x: Column, y: Column): Column =
    graft.functions.ArrayDotProduct(x, y)

  /** Reference HOF implementation of [[dot]] — interpreted; spec only. */
  def dotHof(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, (p: Column, q: Column) =>
      p.cast("double") * q.cast("double")),
      lit(0.0), (acc: Column, v: Column) => acc + v)

  /** Cosine similarity of two float-array columns (double math). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** L2 norm — precompute ONCE per vector when cosines are evaluated
    * per pair: `dot/(norm_a*norm_b)` is bit-identical to [[cosine]]
    * (same doubles, same multiply order) at a third of the fold work. */
  def l2norm(v: Column): Column = sqrt(dot(v, v))

  /** Exact top-k neighbors for each query vector.
    * Output: (query_id, rank, neighbor_id, cosine). */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv")))
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** Gaussian hyperplanes generated DRIVER-SIDE from the seed (java.util
    * .Random's algorithm is spec-fixed → reproducible) and shipped as
    * array literals. The earlier version derived each component from
    * xxhash64 inside the lambda — thousands of per-row string-hash
    * evaluations of values that are constants (measured 34s → ~3s on
    * 2000×64-dim vectors). */
  private def plane(table: Int, bit: Int, dim: Int, seed: Long): Array[Double] = {
    val rnd = new java.util.Random(seed * 1000003L + table * 1009L + bit)
    Array.fill(dim)(rnd.nextGaussian())
  }

  /** Full plane tensor [table][bit][dim] for the native expression. */
  def planesFor(tables: Int, bits: Int, dim: Int, seed: Long): Array[Array[Array[Double]]] =
    Array.tabulate(tables, bits)((t, b) => plane(t, b, dim, seed))

  /** All per-table bucket keys at once — native codegen expression
    * (graft.functions.HyperplaneBuckets); the HOF bucketExpr below is
    * its executable semantic spec (asserted equal in SimilaritySpec). */
  def bucketsExpr(vec: Column, tables: Int, bits: Int, dim: Int, seed: Long): Column =
    graft.functions.HyperplaneBuckets(vec, planesFor(tables, bits, dim, seed))

  /** Bucket key of a vector for one LSH table:
    * bucket = Σ_b (sign(Σ_d v[d]·plane(t,b,d)) << b). Reference HOF
    * implementation — interpreted; hot paths use bucketsExpr. */
  def bucketExpr(vec: Column, table: Int, bits: Int, dim: Int, seed: Long): Column = {
    val bitCols = (0 until bits).map { b =>
      val proj = aggregate(
        zip_with(vec, lit(plane(table, b, dim, seed)),
          (v: Column, p: Column) => v.cast("double") * p),
        lit(0.0), (acc: Column, v: Column) => acc + v)
      when(proj > 0, lit(1L << b)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** ANN top-k via multi-table hyperplane LSH: search only candidates
    * sharing a bucket with the query in any of `tables` tables, then
    * rank exactly. Same output shape as bruteForceTopK (approximate
    * contents; recall is spec-tested against the exact baseline). */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      tables: Int = 16, bits: Int = 5, seed: Long = 42L, dim: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {

    def withBuckets(df: DataFrame, id: String, v: String): DataFrame =
      df.select(col(idCol).as(id), col(vecCol).as(v),
        posexplode(bucketsExpr(col(vecCol), tables, bits, dim, seed))
          .as(Seq("__table", "__bucket")))

    val c = withBuckets(corpus, "neighbor_id", "__cv")
    val q = broadcast(withBuckets(queries, "query_id", "__qv"))
    val scored = c.join(q, Seq("__table", "__bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** All-pairs near-duplicates by cosine ≥ threshold, LSH-bucketed then
    * exactly verified. Output (a_id, b_id, cosine).
    *
    * Pair-join shape (same as MinHashLSH.candidatePairs): the bucket
    * self-join carries ONLY (table, bucket, id) — at 10⁹ docs ×
    * 1024-dim vectors, shipping the vectors through the pair join +
    * dropDuplicates would shuffle the whole embedding corpus through
    * the one wide stage twice. Ids shuffle; vectors stay put and are
    * joined back by id only for the (candidates ≪ corpus) exact-cosine
    * verify. Buckets with pathological collision counts are dropped by
    * `maxBucketSize` (same skew census as minhash — df<2 buckets can't
    * pair and are pruned by the same aggregate). */
  def embeddingNearDup(
      corpus: DataFrame, threshold: Double,
      tables: Int = 8, bits: Int = 10, seed: Long = 42L, dim: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxBucketSize: Int = 10000): DataFrame = {
    // persisted: the slim (table,bucket,id) table feeds the census and
    // both sides of the self-join; vectors are NOT in it
    val bucketed = Persists.cache(corpus.select(col(idCol).as("__nid"),
      posexplode(bucketsExpr(col(vecCol), tables, bits, dim, seed))
        .as(Seq("__table", "__bucket"))))
    val okBuckets = bucketed.groupBy("__table", "__bucket")
      .count()
      .filter(col("count") >= 2 && col("count") <= maxBucketSize)
      .select("__table", "__bucket")
    val slim = bucketed.join(okBuckets, Seq("__table", "__bucket"))
    val pairs = slim.select(col("__table"), col("__bucket"), col("__nid").as("a_id"))
      .join(slim.select(col("__table"), col("__bucket"), col("__nid").as("b_id")),
        Seq("__table", "__bucket"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id")
      .dropDuplicates("a_id", "b_id")
    // norms are computed once per VECTOR here, not once per pair — a
    // candidate set c·|corpus| pairs would otherwise re-fold each
    // vector's self-dot ~c times
    val vecs = corpus.select(col(idCol).as("__nid"), col(vecCol).as("__nv"),
      l2norm(col(vecCol)).as("__nn"))
    pairs
      .join(vecs.select(col("__nid").as("a_id"), col("__nv").as("__av"),
        col("__nn").as("__an")), "a_id")
      .join(vecs.select(col("__nid").as("b_id"), col("__nv").as("__bv"),
        col("__nn").as("__bn")), "b_id")
      .withColumn("cosine",
        round(dot(col("__av"), col("__bv")) / (col("__an") * col("__bn")), 6))
      .filter(col("cosine") >= threshold)
      .select("a_id", "b_id", "cosine")
  }
}
