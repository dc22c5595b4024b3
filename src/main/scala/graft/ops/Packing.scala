package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: assign documents to
  * fixed-token-budget training sequences (the concat-and-chunk model —
  * the corpus is conceptually concatenated in a deterministic order
  * and cut every `seqTokens` tokens; a document belongs to the
  * sequence containing its first token). Deterministic given the
  * (partCol, orderCol) order, so packing is reproducible across runs
  * and cluster sizes — a shuffled-RNG packer would re-deal every doc
  * on every retry.
  *
  * Scale shape: ONE window pass partitioned by `partCol` (shard key:
  * source/domain/split), ordered within the partition — no global
  * sort, no single-partition window. At 100 TB the shard key keeps
  * every partition's running sum independent; sequence ids are only
  * unique per shard, which is what a sharded training-data writer
  * wants anyway (files are per-shard).
  *
  * (Reference scope note: the dbt reference has no packing operator —
  * LLM-pipeline extension surface, like ConnectedComponents.)
  */
object Packing {

  /** Whitespace token count — delegates to [[TextOps.tokens]] so the
    * tokenizer cannot drift from the one the oracle mirrors; swap in a
    * BPE count column upstream if exact budget matters. */
  def tokenCount(text: Column): Column =
    size(TextOps.tokens(text))

  /** Per-document assignment: (all input columns) + `n_tokens`,
    * `seq_id` (0-based within the `partCol` shard). */
  def assign(docs: DataFrame, seqTokens: Int, partCol: String = "source",
      orderCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(seqTokens >= 1)
    val w = Window.partitionBy(col(partCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("n_tokens", tokenCount(col(textCol)))
      .withColumn("__cum_before", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("seq_id",
        floor(col("__cum_before") / seqTokens).cast("long"))
      .drop("__cum_before")
  }

  /** Sequence-level summary: one row per (shard, seq_id) with its doc
    * count and token total — the manifest a training-data writer emits. */
  def summary(docs: DataFrame, seqTokens: Int, partCol: String = "source",
      orderCol: String = "doc_id", textCol: String = "text"): DataFrame =
    assign(docs, seqTokens, partCol, orderCol, textCol)
      .groupBy(col(partCol), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"))
}
