package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-assembly operators a large-scale training pipeline needs
  * around the dedup/quality stages: deterministic split assignment and
  * per-group top-k selection.
  *
  * Both are pure per-row / single-shuffle shapes:
  *  - split assignment is a per-row hash → codegen, no shuffle, and
  *    STABLE: a document's split never changes when the corpus grows
  *    (the classic md5-mod contract used for holdout sets);
  *  - top-k per group is one shuffle on the group key; the per-group
  *    sort is bounded by the group's row count (for heavy groups at
  *    web scale, pre-filter with an approximate quality threshold or
  *    use a two-phase partial top-k — the plan shape stays one
  *    exchange either way).
  *
  * md5 (not xxhash64) is deliberate: it is the one hash both engines
  * of the correctness gate share, so split assignment is DuckDB-
  * oracle-checkable bit-for-bit. At 100 TB md5-per-row is still
  * scan-bound (codegen'd, no shuffle); swap in xxhash64 for pure
  * speed if cross-engine checkability is not needed.
  */
object Sampling {

  /** Uniform bucket in [0, 16^chars) from the md5 of the id's decimal
    * string — deterministic, engine-independent, stable under corpus
    * growth.
    *
    * r18 (guide §4 expression choice, probed 0.85x): one hex-prefix
    * parse via `conv` instead of `chars` separate substring+instr+
    * multiply terms — same value for chars <= 15 (conv parses the
    * chars-digit hex prefix into the same base-16 place-value sum the
    * old ladder computed; 15 hex digits < 2^60 can never overflow the
    * signed-long cast). The ORACLES keep the strpos ladder spelling —
    * values are identical, which the hash gate re-proves per query. */
  def md5Bucket(id: Column, chars: Int = 4): Column = {
    require(chars >= 1 && chars <= 15, s"chars must be in [1,15], got $chars")
    conv(substring(md5(id.cast("string")), 1, chars), 16, 10).cast("long")
  }

  /** Named split by percent thresholds over bucket % 100:
    * [0,train) → "train", [train,train+val) → "val", rest → "test". */
  def splitAssign(id: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    val pct = md5Bucket(id) % 100
    when(pct < trainPct, "train")
      .when(pct < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Top-k rows per group by (orderCol desc, tiebreak asc): the
    * quality-selection shape ("keep the k best docs per language /
    * domain"). One shuffle on the group key; rank column `rk`. */
  def topKPerGroup(
      df: DataFrame, groupCol: Column, orderCol: Column, tiebreak: Column,
      k: Int): DataFrame =
    df.withColumn("rk", row_number().over(
        Window.partitionBy(groupCol).orderBy(orderCol.desc, tiebreak.asc)))
      .filter(col("rk") <= k)

  /** Deterministic stratified sample: k rows per stratum, chosen by
    * md5-hash rank of the id (ascending) — an unbiased, reproducible,
    * engine-independent draw with no RNG state to coordinate across
    * executors or retried tasks. One shuffle on the stratum key;
    * per-stratum sort bounded by stratum size (same plan family as
    * [[topKPerGroup]]). */
  def stratifiedSample(df: DataFrame, strataCol: Column, idCol: Column,
      k: Int): DataFrame =
    df.withColumn("rk", row_number().over(
        Window.partitionBy(strataCol)
          .orderBy(md5(idCol.cast("string")).asc, idCol.asc)))
      .filter(col("rk") <= k)

  /** Mixture-allocation sample (r8): draw `n` rows with per-stratum
    * quotas PROPORTIONAL to each stratum's total weight — the data-
    * MIXING op a training pipeline runs ("assemble 1M docs with domain
    * share ∝ quality-weighted mass"), where [[stratifiedSample]]'s
    * equal-k is the wrong shape.
    *
    * Quotas are Hamilton largest-remainder over INTEGER micro-units:
    * weights are 6dp-rounded upstream, so `round(w·10⁶)` is the same
    * long on every engine; `base = ⌊n·W_s/W⌋` and the remainder
    * ranking `(n·W_s mod W) desc, stratum asc` are pure integer
    * arithmetic — no floating quotient whose last ulp could flip a
    * ⌊⌋ between engines (the reason this op hash-oracles exactly
    * while an Efraimidis-Spirakis weighted draw — pow/ln keys — could
    * not). Within a stratum the draw is the md5-rank order. A stratum
    * smaller than its quota contributes all its rows (both engines
    * agree by construction).
    *
    * Plan shape: one tiny aggregate over #strata (broadcast back), one
    * shuffle on the stratum key for the per-stratum rank — the
    * [[topKPerGroup]] family; nothing global. Output adds `quota`
    * and `rk`. */
  def mixtureSample(df: DataFrame, strataCol: Column, weightCol: Column,
      idCol: Column, n: Long): DataFrame = {
    require(n > 0, "sample size must be positive")
    // decimal(38,0) keeps n·W_s exact far past long range; DIV is
    // integral division (→ long), `%` on decimals is exact — Spark's
    // `/` on integers returns DOUBLE, whose last-ulp quotient could
    // flip the floor between engines
    val micro = round(weightCol * lit(1000000L)).cast("decimal(38,0)")
    val strata = df.groupBy(strataCol.as("__stratum"))
      .agg(sum(micro).as("__ws"))
    val total = Window.partitionBy() // #strata rows — tiny by contract
    val nWs = lit(n).cast("decimal(38,0)") * col("__ws")
    val leftovers = Window.orderBy((nWs % col("__w")).desc, col("__stratum").asc)
    val quotas = strata
      .withColumn("__w", sum(col("__ws")).over(total))
      .withColumn("__base", call_function("div", nWs, col("__w")))
      .withColumn("__spare", lit(n) - sum(col("__base")).over(total))
      .withColumn("__lr", row_number().over(leftovers))
      .withColumn("quota",
        // zero total mass has no proportional allocation — fail loudly
        // (DuckDB's `//` errors on division by zero; Spark's decimal
        // div yields null and would silently return an EMPTY sample,
        // so the engines would diverge without this guard). In the
        // raise_error branch the quota expression is never evaluated.
        when(col("__w") <= lit(0),
            raise_error(lit("mixtureSample: total weight mass is zero")).cast("long"))
          .otherwise(
            col("__base") + when(col("__lr") <= col("__spare"), 1L).otherwise(0L)))
      .select(col("__stratum"), col("quota"))
    df.join(broadcast(quotas), strataCol === col("__stratum"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(strataCol)
          .orderBy(md5(idCol.cast("string")).asc, idCol.asc)))
      .filter(col("rk") <= col("quota"))
      .drop("__stratum")
  }

  /** Token-budget sample (r11): per stratum, keep documents in the
    * deterministic md5-rank order while the running TOKEN total stays
    * within that stratum's budget — the op that assembles "B tokens of
    * web, B' of code, B'' of books" mixes (Pile/Dolma-style token
    * budgets), where [[mixtureSample]]'s row quotas are the wrong unit.
    * Contract: doc kept ⟺ (sum of tokens of all strictly-earlier docs
    * in the stratum's order) + own tokens ≤ budget — a pure prefix
    * cut, so membership is decidable per-row from a prefix sum, not a
    * sequential scan.
    *
    * Scale shape — the naive plan is `sum() OVER (PARTITION BY stratum
    * ORDER BY key)`, which sorts EVERY stratum's full row set in one
    * task each; a 10 TB stratum is one task. This implementation is a
    * two-phase bucketed prefix sum instead: the md5 key's 3-hex-char
    * prefix is the bucket (4096 buckets, and bucket order IS key-prefix
    * order), so
    *   1. one partial-aggregated shuffle computes per-(stratum, bucket)
    *      token sums — metadata scale (|strata|·4096 rows);
    *   2. a window over THAT tiny frame yields each bucket's offset
    *      (tokens in all earlier buckets);
    *   3. rows cumsum only WITHIN their (stratum, bucket) — each
    *      window partition holds ~1/4096 of a stratum — and add the
    *      bucket offset.
    * The result is bit-identical to the naive global cumsum (the
    * DuckDB oracle runs exactly that), but no task ever sorts more
    * than a bucket. `budgets` is a (stratum, token_budget) frame —
    * strata-scale, broadcast into the final filter. Output keeps the
    * input columns plus `cum_tokens`. */
  def tokenBudgetSample(df: DataFrame, strataCol: Column, tokensCol: Column,
      idCol: Column, budgets: DataFrame): DataFrame = {
    val rows = df
      .withColumn("__key", md5(idCol.cast("string")))
      .withColumn("__bkt", substring(col("__key"), 1, 3))
    val bucketSums = rows
      .groupBy(strataCol.as("__s"), col("__bkt").as("__b"))
      .agg(sum(tokensCol).as("__bt"))
    val offsets = bucketSums.withColumn("__off",
      coalesce(sum(col("__bt")).over(
        Window.partitionBy(col("__s")).orderBy(col("__b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    rows
      .join(offsets,
        strataCol === col("__s") && col("__bkt") === col("__b"))
      .withColumn("cum_tokens",
        col("__off") + sum(tokensCol).over(
          Window.partitionBy(strataCol, col("__bkt"))
            .orderBy(col("__key").asc, idCol.asc)))
      .join(broadcast(budgets), strataCol === budgets.col(budgets.columns.head))
      .filter(col("cum_tokens") <= budgets.col(budgets.columns.last))
      .drop("__key", "__bkt", "__s", "__b", "__bt", "__off")
      .drop(budgets.col(budgets.columns.head))
      .drop(budgets.col(budgets.columns.last))
  }
}
