package graft.ops

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, nTokens: Int) =
    (id, "s", (1 to nTokens).map(i => s"t$i").mkString(" "))

  test("boundary arithmetic: counts, starts, overlap, tail coverage") {
    val docs = Seq(doc(1, 3), doc(2, 8), doc(3, 9), doc(4, 20), (5L, "s", "  "))
      .toDF("doc_id", "source", "text")
    val out = Chunking.chunks(docs, window = 8, stride = 5)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getInt(4),
        r.getInt(5), r.getString(6)))
      .groupBy(_._1)
    assert(!out.contains(5L), "token-free docs are excluded")
    // n=3 <= w: one chunk, whole doc
    assert(out(1L).map(c => (c._2, c._3, c._4)).toSeq == Seq((0, 0, 3)))
    // n=8 == w: still one chunk
    assert(out(2L).map(c => (c._2, c._3, c._4)).toSeq == Seq((0, 0, 8)))
    // n=9: k=ceil(1/5)=1 -> chunks at 0 and 5; tail chunk has 4 tokens
    assert(out(3L).sortBy(_._2).map(c => (c._2, c._3, c._4)).toSeq ==
      Seq((0, 0, 8), (1, 5, 4)))
    // n=20: starts 0,5,10,15 — last window reaches token 20
    assert(out(4L).sortBy(_._2).map(c => (c._2, c._3, c._4)).toSeq ==
      Seq((0, 0, 8), (1, 5, 8), (2, 10, 8), (3, 15, 5)))
    // overlap: chunk 1 of doc 4 starts mid-chunk-0
    assert(out(4L).sortBy(_._2).map(_._5).take(2).toSeq == Seq(
      (1 to 8).map(i => s"t$i").mkString(" "),
      (6 to 13).map(i => s"t$i").mkString(" ")))
  }

  test("every token is covered; chunks per doc match the closed form") {
    val docs = Tables.documents(spark, sfDir)
    val out = Chunking.chunks(docs, window = 64, stride = 48)
    val perDoc = out.groupBy("doc_id")
      .agg(max("n_chunks").as("nc"), count(lit(1)).as("rows"),
        max(col("chunk_start") + col("n_tokens")).as("covered"),
        max("chunk_id").as("maxid"))
    // row count == n_chunks == max chunk_id + 1 (dense ids)
    assert(perDoc.filter(col("nc") =!= col("rows") ||
      col("maxid") =!= col("nc") - 1).isEmpty)
    // the last chunk's end reaches the doc's token count
    val n = docs.filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), size(TextOps.tokens(lower(col("text")))).as("n"))
    assert(perDoc.join(n, "doc_id").filter(col("covered") =!= col("n")).isEmpty)
  }

  test("guards: stride > window refused") {
    val docs = Seq(doc(1, 10)).toDF("doc_id", "source", "text")
    intercept[IllegalArgumentException] {
      Chunking.chunks(docs, window = 8, stride = 9)
    }
  }
}
