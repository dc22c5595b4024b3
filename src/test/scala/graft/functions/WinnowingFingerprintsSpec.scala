package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WinnowingFingerprintsSpec extends SparkSpec {
  import spark.implicits._

  private def prints(texts: Seq[String], k: Int = 8, w: Int = 16): Map[String, Set[Long]] =
    texts.toDF("text")
      .select(col("text"), WinnowingFingerprints(col("text"), k, w).as("fp"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSet).toMap

  test("winnowing guarantee: shared substring of length >= w+k-1 shares a print") {
    val shared = "the quick brown fox jumps over the lazy dog near the river bank"
    val a = s"PREFIX AAA $shared SUFFIX BBB"
    val b = s"totally different intro text here $shared and another ending"
    val p = prints(Seq(a, b))
    assert(p(a).intersect(p(b)).nonEmpty)
  }

  test("disjoint texts share no prints") {
    val p = prints(Seq(
      "aaaa bbbb cccc dddd eeee ffff gggg hhhh iiii jjjj kkkk llll",
      "0123 4567 8901 2345 6789 0123 9876 5432 1098 7654 3210 8888"))
    assert(p.values.toSeq(0).intersect(p.values.toSeq(1)).isEmpty)
  }

  test("identical under both code paths; short docs get one print; empty none") {
    Seq("true", "false").foreach { codegen =>
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      try {
        val p = Seq("short", "x", "")
          .toDF("text").select(WinnowingFingerprints(col("text"), 3, 4))
          .collect().map(_.getSeq[Long](0))
        assert(p(0).length == 1) // 5 chars, k=3 -> 3 grams < window -> global min
        assert(p(1).isEmpty)     // shorter than k
        assert(p(2).isEmpty)
      } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }

  test("rolling hash matches direct polynomial evaluation") {
    // compute() must give the same k-gram hash for equal substrings at
    // different offsets — implied by the shared-substring test, but
    // assert directly on a crafted overlap
    val g1 = WinnowingFingerprints.compute("XXabcdefgh".getBytes, 8, 1)
    val g2 = WinnowingFingerprints.compute("abcdefghYY".getBytes, 8, 1)
    assert(g1.toSet.intersect(g2.toSet).nonEmpty)
  }
}
