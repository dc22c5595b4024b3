package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents sharing any word
  * n-gram with an evaluation set — the standard guard against test-set
  * leakage when assembling LLM training corpora (eval answers hiding
  * inside crawled training text inflate benchmark scores).
  *
  * Scale shape: the benchmark side is always tiny relative to the
  * corpus (MBs of eval sets vs TBs of training text), so its distinct
  * gram set is broadcast; the corpus side is exploded to (doc, gram),
  * deduped per doc (map-side-combinable), and semi-joined against the
  * broadcast set — the full corpus is never shuffled, only its
  * matching grams reach the final per-doc count. N-grams are built
  * with codegen'd HOFs (`transform`/`slice`/`array_join`), no UDF.
  */
object Decontamination {

  /** Word n-grams of `text` (space-tokenized); empty array when the
    * doc has fewer than n words (`sequence(0, negative)` would count
    * DOWN, so the guard is load-bearing). */
  def wordNgrams(text: Column, n: Int): Column = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    val ws = split(text, " ")
    when(size(ws) >= n,
      transform(sequence(lit(0), size(ws) - n),
        i => array_join(slice(ws, i + lit(1), lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** Per-doc distinct-gram overlap with the benchmark:
    * (idCol, n_hit_ngrams, contaminated) for every row of `train`. */
  def scan(train: DataFrame, benchmark: DataFrame, n: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // per-doc dedup is NARROW (array_distinct on the row's gram array
    // before exploding) — a (doc, gram) `.distinct()` here would
    // shuffle the entire corpus gram set, the exact thing this
    // operator's scale shape forbids (the r5 10× sweep measured that
    // variant at 41× cost for 10× data: fixed-width shuffle partitions
    // spill superlinearly)
    val trainGrams = train
      .select(col(idCol), explode(array_distinct(wordNgrams(col(textCol), n))).as("gram"))
    val benchGrams = benchmark
      .select(explode(wordNgrams(col(textCol), n)).as("gram"))
      .distinct()
    val hits = trainGrams.join(broadcast(benchGrams), "gram")
      .groupBy(idCol).agg(count(lit(1)).as("n_hit_ngrams"))
    train.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_hit_ngrams"), lit(0L)).as("n_hit_ngrams"),
        (coalesce(col("n_hit_ngrams"), lit(0L)) > 0).as("contaminated"))
  }

  /** Bloom-prefiltered [[scan]] — the 100 TB posture when the eval
    * suite outgrows a comfortable exact-broadcast set (a full
    * benchmark battery's distinct 8-gram set can run to GBs of
    * strings; its Bloom filter is an order of magnitude smaller and
    * fixed-size). Two stages, IDENTICAL output to [[scan]]:
    *
    *  1. prefilter: corpus grams stream through Catalyst's codegen'd
    *     `BloomFilterMightContain` against a filter built by ONE
    *     `BloomFilterAggregate` pass over the benchmark grams — the
    *     same expressions Spark's own runtime-filter injection uses,
    *     reused as a first-class operator (no UDF, stays inside
    *     whole-stage codegen; the filter bytes ride the task binary).
    *     No false negatives, so nothing real is lost;
    *  2. exact verify: only the surviving candidate grams — true hits
    *     plus the fpp-bounded false positives — meet the exact
    *     broadcast gram set, which removes every false positive.
    *
    * Equality with [[scan]] is therefore structural (spec-gated, and
    * q_decontam_bloom shares q_decontam's oracle SQL verbatim): the
    * bloom stage only prunes rows the exact join would drop anyway.
    * At scale, stage 2's join input is |hits| + fpp·|corpus grams|
    * instead of |corpus grams| — the broadcast exact set is consulted
    * ~1/fpp times less often, and a shuffle-join verify variant (eval
    * set too big even to broadcast) would shuffle only candidates,
    * never the corpus. */
  def scanBloom(train: DataFrame, benchmark: DataFrame, n: Int = 8,
      idCol: String = "doc_id", textCol: String = "text",
      expectedGrams: Long = 1L << 20, fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.types.BinaryType
    val spark = train.sparkSession
    // NOT cached (r18, measured): the bloom-build head() and the exact-
    // verify broadcast both consume this gram set, but the eval side is
    // tiny by contract — a MEMORY_AND_DISK materialization cost more
    // than recomputing the explode+distinct (min-of-3 probe: +0.7 s)
    val benchGrams = benchmark
      .select(explode(wordNgrams(col(textCol), n)).as("gram"))
      .distinct()
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(expectedGrams, fpp)
    def hashed(c: Column) = XxHash64(Seq(GraftBridge.expression(spark, c)), 42L)
    // one aggregate pass builds the filter; the collect is
    // metadata-scale (numBits/8 bytes, NOT the gram strings)
    val bfRow = benchGrams.select(GraftBridge.column(
        BloomFilterAggregate(hashed(col("gram")),
          Literal(expectedGrams), Literal(numBits), 0, 0).toAggregateExpression())
      .as("bf")).head()
    val zero = train.select(col(idCol), lit(0L).as("n_hit_ngrams"),
      lit(false).as("contaminated"))
    if (bfRow.isNullAt(0)) return zero // empty benchmark: nothing to hit
    val bf = bfRow.getAs[Array[Byte]](0)
    val trainGrams = train
      .select(col(idCol), explode(array_distinct(wordNgrams(col(textCol), n))).as("gram"))
    val candidates = trainGrams.filter(GraftBridge.column(
      BloomFilterMightContain(Literal(bf, BinaryType), hashed(col("gram")))))
    val hits = candidates.join(broadcast(benchGrams), "gram")
      .groupBy(idCol).agg(count(lit(1)).as("n_hit_ngrams"))
    train.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_hit_ngrams"), lit(0L)).as("n_hit_ngrams"),
        (coalesce(col("n_hit_ngrams"), lit(0L)) > 0).as("contaminated"))
  }

  /** Semantic decontamination: flag training rows whose EMBEDDING sits
    * within cosine `theta` of any evaluation-set embedding — the guard
    * for the leakage the n-gram scan can't see (paraphrased,
    * translated, or re-templated eval content shares no 8-gram with
    * its source but lands next to it in embedding space; verbatim
    * copies are cosine 1.0, so this subsumes exact-match too).
    *
    * Scale shape mirrors [[scan]]: the eval side is always tiny (a
    * benchmark battery is thousands of items vs a billions-row
    * corpus), so it is broadcast and every corpus partition streams
    * once through a BroadcastNestedLoopJoin — the corpus is never
    * shuffled, and the pair stage is O(|corpus| × |eval|) exact
    * scoring, the same regime as [[Similarity.bruteForceTopK]]. The
    * post-filter aggregate is keyed on the corpus id, whose hit rows
    * are at most |corpus| (map-side combinable). Cosines use the
    * engine's exact left-to-right double fold ([[Similarity.cosine]]),
    * so the theta comparison and the (cosine desc, eval_id asc)
    * argmax tie-break are bit-reproducible cross-engine.
    *
    * Output, one row per corpus row: (idCol, n_eval_hits,
    * top_eval_id, top_cosine, contaminated) — top_* null when clean. */
  def semanticScan(corpus: DataFrame, evalSet: DataFrame, theta: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(theta > -1.0 && theta <= 1.0, s"theta must be in (-1, 1], got $theta")
    val c = corpus.select(col(idCol), col(vecCol).as("__cv"))
    val e = broadcast(evalSet.select(col(idCol).as("__eval_id"), col(vecCol).as("__ev")))
    val hits = c.crossJoin(e)
      .withColumn("__cos", Similarity.cosine(col("__cv"), col("__ev")))
      .filter(col("__cos") >= theta)
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_eval_hits"),
        // argmax by (cosine desc, eval id asc) via min_by over
        // struct(-cosine, id): negating the DOUBLE is always legal,
        // and the id rides un-negated — so any orderable id type
        // works (ADVICE r11: the old max(struct(c, -id)) silently
        // null'd a string id through the implicit numeric cast)
        min_by(struct(col("__eval_id").as("i"), col("__cos").as("c")),
          struct((-col("__cos")).as("nc"), col("__eval_id").as("i"))).as("__top"))
    corpus.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_eval_hits"), lit(0L)).as("n_eval_hits"),
        col("__top.i").as("top_eval_id"),
        round(col("__top.c"), 6).as("top_cosine"),
        col("n_eval_hits").isNotNull.as("contaminated"))
  }
}
