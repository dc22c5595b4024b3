package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained unigram language-model quality scorer — the order-0
  * form of the LM-perplexity filter web-corpus curation runs (CCNet,
  * Wenzek et al. 2020 §4.3 score with a Wikipedia LM; here the corpus
  * is its own reference model, which ranks documents by how typical
  * their vocabulary is — gibberish and boilerplate-ratio outliers land
  * in the tails): score(doc) = mean over tokens of log p(w), with
  * p(w) = corpus frequency.
  *
  * Determinism contract (what makes this hash-oracle-able where a
  * naive float sum is not): per-word log-probabilities are rounded to
  * 6dp ONCE and fixed as DECIMAL(18,6); each document's score is then
  * Σ c_w(doc)·lp_w over its distinct words in EXACT decimal arithmetic
  * (order-free), and floating point re-enters only in the final
  * per-doc division. Cross-row double addition never happens.
  *
  * Scale shape: one (doc, word) partial-agg shuffle (map-side combine
  * collapses token repeats early), one word-count aggregate at vocab
  * grain, one word-keyed join of doc-word counts against the vocab
  * (hot words join ONE row — no skew amplification; AQE may broadcast
  * the vocab side outright), one doc-grain aggregate. The token
  * explosion itself is never shuffled at token grain. The corpus total
  * is a 1-row collect (driver metadata). */
object UnigramLm {

  /** Per-document scores: (idCol, carry..., n_tokens, logp).
    * Whitespace-only documents are excluded (no tokens to score). */
  def scores(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", carry: Seq[String] = Seq("source")): DataFrame = {
    val base = docs.filter(length(trim(col(textCol))) > 0)
    val tk = base.select((col(idCol) +: carry.map(col)) :+
      explode(TextOps.tokens(lower(col(textCol)))).as("w"): _*)
    val dwc = Persists.cacheFor(
      tk.groupBy((col(idCol) +: carry.map(col)) :+ col("w"): _*)
        .agg(count(lit(1)).as("c")), 2)
    val vocab = Persists.cacheFor(
      dwc.groupBy("w").agg(sum("c").as("cw")), 2)
    val total = vocab.agg(sum("cw")).head().getLong(0)
    val lp = vocab.select(col("w"),
      round(log(col("cw").cast("double") / lit(total)), 6)
        .cast("decimal(18,6)").as("lp"))
    dwc.join(lp, "w")
      .groupBy(col(idCol) +: carry.map(col): _*)
      .agg(sum(col("c").cast("decimal(18,0)") * col("lp")).as("__slp"),
        sum("c").as("n_tokens"))
      .withColumn("logp",
        round(col("__slp").cast("double") / col("n_tokens"), 6))
      .drop("__slp")
  }
}
