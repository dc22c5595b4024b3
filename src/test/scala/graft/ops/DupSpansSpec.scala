package graft.ops

import graft.SparkSpec

/** Exact-substring span semantics on hand-built corpora (the sf-scale
  * gate is q_dup_spans, DuckDB-oracled). Token positions are 0-based,
  * spans are [start, end) with end − start ≥ n. */
class DupSpansSpec extends SparkSpec {

  import spark.implicits._

  private def spansOf(rows: Seq[(Long, String)], n: Int = 4) =
    DupSpans.duplicateSpans(rows.toDF("doc_id", "text"), n = n)
      .orderBy("doc_id", "span_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq

  test("a shared block yields one maximal span per doc; unique text none") {
    // docs 1 and 2 share tokens "a b c d e" (5 tokens, n=4 → gram
    // positions 0..1 in doc 1, 1..2 in doc 2); doc 3 is unique
    val out = spansOf(Seq(
      (1L, "a b c d e x1 y1 z1"),
      (2L, "q2 a b c d e w2 v2"),
      (3L, "p3 r3 s3 t3 u3 m3 n3 o3")))
    assert(out == Seq((1L, 0L, 5L, 2L), (2L, 1L, 6L, 2L)))
  }

  test("two separated shared blocks stay two islands") {
    val out = spansOf(Seq(
      (1L, "a b c d x1 x2 x3 x4 e f g h"),
      (2L, "a b c d y1 y2 y3 y4 e f g h")))
    assert(out == Seq(
      (1L, 0L, 4L, 2L), (1L, 8L, 12L, 2L),
      (2L, 0L, 4L, 2L), (2L, 8L, 12L, 2L)))
  }

  test("a gram repeated WITHIN one doc does not mark a span") {
    val out = spansOf(Seq(
      (1L, "a b c d x a b c d"), // internal repeat only
      (2L, "p q r s t u v w")))
    assert(out.isEmpty)
  }

  test("n_docs_max reports the widest-spread gram of the span") {
    // "a b c d" in 3 docs; doc 1's span extends to "a b c d e" (df 2)
    val out = spansOf(Seq(
      (1L, "a b c d e k1 k2 k3"),
      (2L, "m2 a b c d e m3 m4"),
      (3L, "a b c d z3 z4 z5 z6")))
    val doc1 = out.filter(_._1 == 1L)
    assert(doc1 == Seq((1L, 0L, 5L, 3L)))
  }

  test("docs shorter than one gram emit nothing and do not fail") {
    val out = spansOf(Seq((1L, "a b"), (2L, "a b")))
    assert(out.isEmpty)
  }
}
