package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Randomized (fixed-seed) equivalence: the binned plans must equal
  * the naive quadratic joins for ANY bin width — including widths far
  * narrower and far wider than the interval lengths, the regimes where
  * an off-by-one in bin arithmetic (floor at negative values, spans
  * exactly on a bin boundary, zero-length intervals) would show. */
class IntervalJoinFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)

  // negative domain included: floor-division bins must stay monotone
  // below zero (integer division would truncate toward zero instead)
  private val points = (1 to 400).map { i =>
    (i.toLong, rnd.nextLong(2000) - 1000L) }.toDF("pid", "t")
  private val intervals = (1 to 150).map { i =>
    val lo = rnd.nextLong(2000) - 1000L
    val len = rnd.nextInt(120).toLong
    // every 10th inverted (matches nothing), every 7th zero-length
    if (i % 10 == 0) (i.toLong, lo, lo - 1 - rnd.nextInt(50).toLong)
    else if (i % 7 == 0) (i.toLong, lo, lo)
    else (i.toLong, lo, lo + len)
  }.toDF("iid", "lo", "hi")

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("point-in-interval == naive for widths 1..4096, negative domain") {
    val naive = rows(points.join(intervals,
        col("t") >= col("lo") && col("t") <= col("hi"))
      .select("pid", "t", "iid", "lo", "hi"))
    assert(naive.nonEmpty)
    for (w <- Seq(1L, 3L, 7L, 64L, 1000L, 4096L)) {
      val got = rows(IntervalJoin.pointInInterval(points, intervals,
        "t", "lo", "hi", binWidth = w).select("pid", "t", "iid", "lo", "hi"))
      assert(got == naive, s"width $w diverged from the naive join")
    }
  }

  test("interval-overlap == naive for widths 1..4096, exactly once each") {
    val a = intervals.select(col("iid").as("aid"), col("lo").as("alo"),
      col("hi").as("ahi"))
    val b = (1 to 150).map { i =>
      val lo = rnd.nextLong(2000) - 1000L
      (i.toLong, lo, lo + rnd.nextInt(90).toLong)
    }.toDF("bid", "blo", "bhi")
    val naive = a.join(b, col("alo") <= col("bhi") && col("blo") <= col("ahi"))
    val naiveRows = rows(naive.select("aid", "alo", "ahi", "bid", "blo", "bhi"))
    assert(naiveRows.nonEmpty)
    for (w <- Seq(1L, 5L, 37L, 512L, 4096L)) {
      val got = IntervalJoin.intervalOverlap(a, b, "alo", "ahi", "blo", "bhi",
        binWidth = w)
      assert(rows(got.select("aid", "alo", "ahi", "bid", "blo", "bhi")) ==
        naiveRows, s"width $w diverged")
      assert(got.count() == naive.count(),
        s"width $w emitted a pair more than once")
    }
  }
}
