package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusDiffSpec extends SparkSpec {
  import spark.implicits._

  test("statuses: added/removed/changed/unchanged, carry fallback") {
    val oldV = Seq(
      (1L, "a", "same text"),
      (2L, "a", "will change"),
      (3L, "b", "will be removed")
    ).toDF("doc_id", "source", "text")
    val newV = Seq(
      (1L, "a", "same text"),
      (2L, "a", "has changed"),
      (4L, "c", "brand new")
    ).toDF("doc_id", "source", "text")
    val got = CorpusDiff.diff(oldV, newV)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(got == Map(
      1L -> ("a", "unchanged"),
      2L -> ("a", "changed"),
      3L -> ("b", "removed"), // carry falls back to the OLD snapshot
      4L -> ("c", "added")))
  }

  test("null text is distinct from empty text; multi-column content") {
    val oldV = Seq((1L, "a", null.asInstanceOf[String], "m1"))
      .toDF("doc_id", "source", "text", "meta")
    val newV = Seq((1L, "a", "", "m1"))
      .toDF("doc_id", "source", "text", "meta")
    val d = CorpusDiff.diff(oldV, newV, contentCols = Seq("text", "meta"))
      .collect().head
    assert(d.getString(2) == "changed", "NULL -> '' must read as changed")
    // fixed-width fp segments: boundary content cannot alias
    val a = Seq((1L, "s", "ab", "c")).toDF("doc_id", "source", "text", "meta")
    val b = Seq((1L, "s", "a", "bc")).toDF("doc_id", "source", "text", "meta")
    assert(CorpusDiff.diff(a, b, contentCols = Seq("text", "meta"))
      .collect().head.getString(2) == "changed")
  }

  test("diff is fingerprint-shaped: no text column survives to the join output") {
    val v = Seq((1L, "a", "t")).toDF("doc_id", "source", "text")
    val out = CorpusDiff.diff(v, v)
    assert(out.columns.toSeq == Seq("doc_id", "source", "status"))
    assert(out.collect().head.getString(2) == "unchanged")
  }
}
