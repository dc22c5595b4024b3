package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Overlapping token-window chunking — the retrieval-export shape
  * (RAG corpora, long-document splitting for embedding models): each
  * document becomes chunks of `window` tokens starting every `stride`
  * tokens, so consecutive chunks overlap by `window − stride` tokens
  * and no boundary sentence is ever lost to a hard cut.
  *
  * Chunk starts are 0, s, 2s, …, ks with k = ⌈max(0, n−w)/s⌉ — the
  * last start is the first that lets its window reach the tail, so
  * every token is covered and a short document (n ≤ w) yields exactly
  * one chunk. All construction is in-row codegen HOFs
  * (`sequence`/`transform`/`slice` over the token array — no UDF, no
  * token-grain shuffle); the operator is a narrow map over the corpus
  * scan, embarrassingly parallel at any scale. Chunk ids are
  * (doc_id, chunk_id) with chunk_id dense from 0 — deterministic,
  * partition-independent.
  *
  * Complements [[Packing]] (which concatenates docs INTO fixed
  * training sequences) and [[SegmentDedup]] (which drops repeated
  * windows): chunking fans one doc OUT to retrieval units. */
object Chunking {

  /** (idCol, carry..., chunk_id, n_chunks, chunk_start, n_tokens,
    * chunk_text). Token-free documents are excluded. */
  def chunks(docs: DataFrame, window: Int, stride: Int,
      idCol: String = "doc_id", textCol: String = "text",
      carry: Seq[String] = Seq("source")): DataFrame = {
    require(window > 0, "window must be positive")
    require(stride > 0 && stride <= window,
      "stride must be in [1, window] — a larger stride would drop tokens")
    val toks: Column = TextOps.tokens(lower(col(textCol)))
    val n = size(toks)
    // k = ceil(max(0, n - w) / s) — FP-exact for any real doc length
    val k = floor((greatest(n - window, lit(0)).cast("double") +
      (stride - 1)) / stride).cast("int")
    docs.filter(length(trim(col(textCol))) > 0)
      .select((col(idCol) +: carry.map(col)) ++ Seq(
        n.as("__n"),
        posexplode(transform(sequence(lit(0), k),
          i => concat_ws(" ", slice(toks, i * stride + 1, lit(window)))))
          .as(Seq("chunk_id", "chunk_text")),
        (k + 1).as("n_chunks")): _*)
      .withColumn("chunk_start", col("chunk_id") * stride)
      .withColumn("n_tokens",
        least(lit(window), col("__n") - col("chunk_start")))
      .select((col(idCol) +: carry.map(col)) ++ Seq(col("chunk_id"),
        col("n_chunks"), col("chunk_start"), col("n_tokens"),
        col("chunk_text")): _*)
  }
}
