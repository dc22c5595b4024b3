package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
}
