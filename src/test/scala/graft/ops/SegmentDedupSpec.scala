package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SegmentDedupSpec extends SparkSpec {

  private def run(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    SegmentDedup.dedup(rows.toDF("doc_id", "text"),
      SegmentDedup.tokenWindows(col("text"), 4), sep = " ")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_segments"), r.getAs[Long]("kept_segments"),
          r.getAs[String]("new_text"))).toMap
  }

  test("unique docs survive intact; duplicates lose all segments; partial copies lose the copied window") {
    val w1 = "a b c d"; val w2 = "e f g h"
    val r = run(Seq(
      1L -> s"$w1 $w2 tail one",       // first occurrence of w1, w2
      2L -> s"$w1 $w2 tail one",       // exact duplicate → nothing kept
      3L -> s"$w1 fresh words here x", // shares only window 0 (w1)
      4L -> "entirely new content z")) // untouched
    assert(r(1L) == ((3L, 3L, s"$w1 $w2 tail one")))
    assert(r(2L) == ((3L, 0L, "")))
    // doc 3: windows are [a b c d], [fresh words here x]; the first is
    // doc 1's window 0 → dropped
    assert(r(3L) == ((2L, 1L, "fresh words here x")))
    assert(r(4L)._1 == r(4L)._2 && r(4L)._3 == "entirely new content z")
  }

  test("keeper is the corpus-first (min doc_id, pos) occurrence, case/whitespace-insensitive") {
    val r = run(Seq(
      5L -> "X Y Z W",
      2L -> "x y z w",       // lower doc_id wins despite input order
      9L -> "  x   Y z   W ")) // whitespace-collapsed, same fingerprint
    assert(r(2L)._2 == 1L && r(5L)._2 == 0L && r(9L)._2 == 0L)
  }

  test("whitespace-only and empty docs: zero segments, empty rebuild, still present") {
    val r = run(Seq(1L -> "   ", 2L -> "", 3L -> "real text here now"))
    assert(r(1L) == ((0L, 0L, "")))
    assert(r(2L) == ((0L, 0L, "")))
    assert(r(3L)._2 == 1L)
  }

  test("paragraph segmenter splits on blank lines") {
    import spark.implicits._
    val rows = Seq(
      (1L, "first para\n\nsecond para"),
      (2L, "second para\n\nthird para")).toDF("doc_id", "text")
    val r = SegmentDedup.dedup(rows, SegmentDedup.paragraphs(col("text")))
      .collect().map(x => x.getAs[Long]("doc_id") -> x.getAs[String]("new_text")).toMap
    assert(r(1L) == "first para\n\nsecond para")
    assert(r(2L) == "third para")
  }
}
