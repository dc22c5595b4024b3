package graft.ops

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("point-in-interval == naive BETWEEN join (longs, boundaries)") {
    val pts = Seq((1L, 0L), (2L, 5L), (3L, 10L), (4L, 11L), (5L, 99L),
      (6L, 100L), (7L, 101L)).toDF("pid", "t")
    // [5,10] closed; [10,10] degenerate; [100,90] inverted → matches nothing
    val ivs = Seq((10L, 5L, 10L), (11L, 10L, 10L), (12L, 0L, 99L),
      (13L, 100L, 90L)).toDF("iid", "lo", "hi")
    val got = IntervalJoin.pointInInterval(pts, ivs, "t", "lo", "hi", binWidth = 7L)
    val naive = pts.join(ivs, col("t") >= col("lo") && col("t") <= col("hi"))
      .select(pts.columns.map(col) ++ ivs.columns.map(col): _*)
    assert(rows(got.select("pid", "t", "iid", "lo", "hi")) == rows(naive))
    assert(naive.count() > 0)
    // inverted interval really contributed nothing
    assert(got.filter(col("iid") === 13L).isEmpty)
  }

  test("overlap join == naive overlap join, each pair exactly once") {
    val a = Seq((1L, 0L, 10L), (2L, 20L, 30L), (3L, 5L, 50L), (4L, 60L, 60L))
      .toDF("aid", "alo", "ahi")
    val b = Seq((1L, 10L, 12L), (2L, 31L, 40L), (3L, 0L, 100L), (4L, 55L, 60L))
      .toDF("bid", "blo", "bhi")
    // width chosen so intervals straddle several bins (dup risk is real)
    val got = IntervalJoin.intervalOverlap(a, b, "alo", "ahi", "blo", "bhi",
      binWidth = 8L)
    val naive = a.join(b, col("alo") <= col("bhi") && col("blo") <= col("ahi"))
    assert(rows(got) == rows(naive.select(got.columns.map(col): _*)))
    assert(got.count() == got.distinct().count() &&
      got.count() == naive.count(), "canonical-bin dedup must be exact")
    // touching endpoints overlap under closed semantics
    assert(!got.filter(col("aid") === 1L && col("bid") === 1L).isEmpty)
    assert(!got.filter(col("aid") === 4L && col("bid") === 4L).isEmpty)
  }

  test("keyed variant joins only within the key") {
    val pts = Seq(("u1", 5L), ("u2", 5L)).toDF("k", "t")
      .withColumn("pid", monotonically_increasing_id())
    val ivs = Seq(("u1", 0L, 9L)).toDF("k", "lo", "hi")
    val got = IntervalJoin.pointInInterval(pts, ivs, "t", "lo", "hi",
      binWidth = 4L, keys = Seq("k"))
    assert(got.select("k").as[String].collect().toSeq == Seq("u1"))
  }

  test("fixture: error events in purchase bursts == naive join") {
    val ev = Tables.events(spark, sfDir)
    val bursts = Sessionize(ev.filter(col("event_type") === "purchase"),
        gapSeconds = 172800L)
      .select(col("user_id"), col("session_idx"),
        col("session_start"), col("session_end"))
    val errs = ev.filter(col("event_type") === "error")
      .select("user_id", "event_id", "ts")
    val got = IntervalJoin.pointInInterval(errs, bursts, "ts",
      "session_start", "session_end", binWidth = 86400000000L,
      keys = Seq("user_id"))
    val naive = errs.join(bursts, Seq("user_id"))
      .filter(col("ts") >= col("session_start") &&
        col("ts") <= col("session_end"))
    assert(got.count() == naive.count() && got.count() > 0)
    assert(rows(got.select("user_id", "event_id", "session_idx")) ==
      rows(naive.select("user_id", "event_id", "session_idx")))
  }

  test("left-outer variant == naive LEFT range join") {
    val pts = Seq((1L, 5L), (2L, 500L), (3L, 8L)).toDF("pid", "t")
    val ivs = Seq((10L, 0L, 10L), (11L, 7L, 9L)).toDF("iid", "lo", "hi")
    val got = IntervalJoin.pointInIntervalLeft(pts, ivs, Seq("pid"),
      "t", "lo", "hi", binWidth = 4L)
    val naive = pts.join(ivs,
      col("t") >= col("lo") && col("t") <= col("hi"), "left")
    assert(rows(got) == rows(naive.select(got.columns.map(col): _*)))
    // the unmatched point survives with null interval columns
    assert(got.filter(col("pid") === 2L && col("iid").isNull).count() == 1)
    // the doubly-matched point appears twice
    assert(got.filter(col("pid") === 3L).count() == 2)
  }

  test("plan: bin equi-join shuffles — never nested-loop/cartesian") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val pts = spark.range(1000).select(col("id").as("pid"),
        (col("id") * 3).as("t"))
      val ivs = spark.range(200).select(col("id").as("iid"),
        (col("id") * 15).as("lo"), (col("id") * 15 + 10).as("hi"))
      val plan = IntervalJoin.pointInInterval(pts, ivs, "t", "lo", "hi", 16L)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), plan)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("suggestBinWidth: ~median interval length; degenerate cases clamp") {
    val ivs = (1 to 101).map(i => (i.toLong, 0L, i.toLong * 10))
      .toDF("iid", "lo", "hi")
    val w = IntervalJoin.suggestBinWidth(ivs, "lo", "hi")
    assert(w == 510L, s"median of 10..1010 step 10 is 510, got $w")
    // suggested width must keep the join exact (it only tunes cost)
    val pts = Seq((1L, 5L), (2L, 500L), (3L, 1009L)).toDF("pid", "t")
    val got = IntervalJoin.pointInInterval(pts, ivs, "t", "lo", "hi", w)
    val naive = pts.join(ivs, col("t") >= col("lo") && col("t") <= col("hi"))
    assert(got.count() == naive.count())
    val zero = Seq((1L, 7L, 7L)).toDF("iid", "lo", "hi")
    assert(IntervalJoin.suggestBinWidth(zero, "lo", "hi") == 1L,
      "zero-length median clamps to 1")
    val empty = zero.filter(col("iid") < 0)
    assert(IntervalJoin.suggestBinWidth(empty, "lo", "hi") == 1L)
  }

  test("guards: over-wide interval fails loudly; doubles refused") {
    val pts = Seq((1L, 5L)).toDF("pid", "t")
    val wide = Seq((1L, 0L, 10000000L)).toDF("iid", "lo", "hi")
    val e = intercept[Exception] {
      IntervalJoin.pointInInterval(pts, wide, "t", "lo", "hi",
        binWidth = 2L, maxBinsPerInterval = 64L).count()
    }
    assert(e.getMessage != null)
    val dbl = Seq((1L, 1.5, 2.5)).toDF("iid", "lo", "hi")
    intercept[IllegalArgumentException] {
      IntervalJoin.pointInInterval(pts, dbl, "t", "lo", "hi", 2L)
    }
  }
}
