package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained BIGRAM language-model quality scorer — the order-1
  * companion of [[UnigramLm]] (CCNet-style perplexity filtering one
  * order deeper: a doc whose words are individually common but
  * strung together atypically — shuffled boilerplate, keyword stuffing,
  * template mash-ups — scores low here while passing the unigram
  * filter): score(doc) = mean over the doc's bigrams of
  * log p(w2 | w1), with p(w2 | w1) = c(w1,w2) / Σ_v c(w1,v) from the
  * corpus itself. Self-scoring means every bigram being scored exists
  * in the counts, so the unsmoothed estimate is never log 0.
  *
  * Determinism contract (same as [[UnigramLm]]): per-bigram
  * log-probabilities are rounded to 6dp ONCE and fixed as
  * DECIMAL(18,6); each document's score is Σ c_b(doc)·lp_b over its
  * distinct bigrams in EXACT decimal arithmetic, with floating point
  * re-entering only in the final per-doc division — hash-oracle-able
  * cross-engine.
  *
  * Scale shape: the bigram stream is produced NARROW (an in-row
  * transform over the token array — token grain is never shuffled);
  * one (doc, bigram) partial-agg shuffle, bigram-vocab and history
  * aggregates at vocab grain, one bigram-keyed join back (hot bigrams
  * join ONE row), one doc-grain aggregate. Documents with fewer than
  * two tokens have no bigrams and are excluded. */
object BigramLm {

  /** Per-document scores: (idCol, carry..., n_bigrams, logp). */
  def scores(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", carry: Seq[String] = Seq("source")): DataFrame = {
    val toks = TextOps.tokens(lower(col(textCol)))
    val withT = docs.withColumn("__t", toks).filter(size(col("__t")) >= 2)
    // adjacent pairs, in-row: struct them so one explode carries both
    val bi = withT.select((col(idCol) +: carry.map(col)) :+
        explode(transform(sequence(lit(0), size(col("__t")) - 2),
          i => struct(element_at(col("__t"), i + 1).as("w1"),
            element_at(col("__t"), i + 2).as("w2")))).as("b"): _*)
      .select((col(idCol) +: carry.map(col)) ++
        Seq(col("b.w1").as("w1"), col("b.w2").as("w2")): _*)
    val dbc = Persists.cacheFor(
      bi.groupBy((col(idCol) +: carry.map(col)) ++ Seq(col("w1"), col("w2")): _*)
        .agg(count(lit(1)).as("c")), 2)
    val vocab = Persists.cacheFor(
      dbc.groupBy("w1", "w2").agg(sum("c").as("cb")), 2)
    val hist = vocab.groupBy("w1").agg(sum("cb").as("ch"))
    val lp = vocab.join(hist, "w1").select(col("w1"), col("w2"),
      round(log(col("cb").cast("double") / col("ch")), 6)
        .cast("decimal(18,6)").as("lp"))
    dbc.join(lp, Seq("w1", "w2"))
      .groupBy(col(idCol) +: carry.map(col): _*)
      .agg(sum(col("c").cast("decimal(18,0)") * col("lp")).as("__slp"),
        sum("c").as("n_bigrams"))
      .withColumn("logp",
        round(col("__slp").cast("double") / col("n_bigrams"), 6))
      .drop("__slp")
  }
}
