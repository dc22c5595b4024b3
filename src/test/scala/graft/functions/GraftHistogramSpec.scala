package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._

/** GraftHistogram: the routable approx-percentile sketch. Gates the
  * cross-engine contract (binning/interpolation arithmetic), the
  * mergeability that routing relies on, accuracy vs the exact
  * percentile, and both codegen paths of the quantile scalar. */
class GraftHistogramSpec extends SparkSpec {
  import spark.implicits._

  test("bin edges: lo -> 0, hi clamps to last, out-of-range clamps") {
    assert(GraftHistogram.binOf(0.0, 0.0, 100.0, 10) == 0)
    assert(GraftHistogram.binOf(9.999, 0.0, 100.0, 10) == 0)
    assert(GraftHistogram.binOf(10.0, 0.0, 100.0, 10) == 1)
    assert(GraftHistogram.binOf(100.0, 0.0, 100.0, 10) == 9) // x == hi
    assert(GraftHistogram.binOf(-5.0, 0.0, 100.0, 10) == 0)
    assert(GraftHistogram.binOf(1e9, 0.0, 100.0, 10) == 9)
  }

  test("quantile interpolation on a known histogram") {
    // 3 bins + the trailing clamped slot; lo=0 hi=3 -> width 1
    val h = new GenericArrayData(Array(2L, 0L, 3L, 0L))
    def q(p: Double) = GraftHistogram.quantile(h, p, 0.0, 3.0)
    assert(q(0.0) == 0.0) // lower edge of first occupied bin
    assert(q(0.4) == 1.0) // target 2.0 lands exactly at bin 0's top edge
    // target 2.5 -> bin 2 (bin 1 empty, skipped), frac = 0.5/3
    assert(math.abs(q(0.5) - (2.0 + 0.5 / 3.0)) < 1e-15)
    assert(q(1.0) == 3.0) // upper edge of last occupied bin
    assert(GraftHistogram.quantile(new GenericArrayData(Array(0L, 0L, 0L)), 0.5, 0.0, 1.0) == null)
    // a nonzero clamped slot is metadata, not mass: same estimates
    val hc = new GenericArrayData(Array(2L, 0L, 3L, 7L))
    assert(GraftHistogram.quantile(hc, 1.0, 0.0, 3.0) == q(1.0))
  }

  test("estimate within one bin width of the exact percentile") {
    val bins = 1024
    val width = 600000.0 / bins
    val df = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_totalprice").cast("double").as("x"))
    val r = df.select(
      expr(s"graft_percentile_bounded(x, 0.5, 0.0, 600000.0, $bins)").as("p50"),
      expr(s"graft_percentile_bounded(x, 0.95, 0.0, 600000.0, $bins)").as("p95"),
      expr("percentile(x, 0.5)").as("e50"),
      expr("percentile(x, 0.95)").as("e95")).head()
    assert(math.abs(r.getDouble(0) - r.getDouble(2)) <= width,
      s"p50 ${r.getDouble(0)} vs exact ${r.getDouble(2)}")
    assert(math.abs(r.getDouble(1) - r.getDouble(3)) <= width,
      s"p95 ${r.getDouble(1)} vs exact ${r.getDouble(3)}")
  }

  test("merge of split partials == whole-input histogram (exact, not approximate)") {
    val df = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey").as("id"), col("o_totalprice").cast("double").as("x"))
    val whole = df
      .select(expr("graft_hist_agg(x, 0.0, 600000.0, 64)").as("h"))
      .head().getSeq[Long](0)
    val merged = df
      .groupBy((col("id") % 7).as("part"))
      .agg(expr("graft_hist_agg(x, 0.0, 600000.0, 64)").as("h"))
      .select(expr("graft_hist_merge(h)").as("h"))
      .head().getSeq[Long](0)
    assert(whole == merged)
    assert(whole.init.sum == df.count()) // bins hold every row; last slot is the clamped count
  }

  test("quantile scalar: generated code == interpreted, both paths") {
    val df = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderpriority").as("pr"), col("o_totalprice").cast("double").as("x"))
      .groupBy("pr")
      .agg(expr("graft_hist_agg(x, 0.0, 600000.0, 256)").as("h"))
    val results = Seq("true", "false").map { codegen =>
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      try df.select(col("pr"), expr("graft_hist_quantile(h, 0.5, 0.0, 600000.0)").as("q"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
    assert(results(0) == results(1))
    assert(results(0).nonEmpty)
  }

  test("tvd: identical -> 0, disjoint -> 1, known mixture, empty -> null, mismatch throws") {
    // last element is the clamped slot — excluded from the distribution
    def g(xs: Long*) = new GenericArrayData(xs.toArray :+ 0L)
    assert(GraftHistogram.tvd(g(3, 1, 0), g(6, 2, 0)) == 0.0) // same distribution
    assert(GraftHistogram.tvd(g(5, 0), g(0, 7)) == 1.0)       // disjoint support
    // p = (.5,.5), q = (.75,.25) -> tvd = .5*(|.25|+|.25|) = .25
    assert(GraftHistogram.tvd(g(2, 2), g(3, 1)) == 0.25)
    assert(GraftHistogram.tvd(g(0, 0), g(1, 2)) == null)
    intercept[IllegalArgumentException] {
      GraftHistogram.tvd(g(1, 2), g(1, 2, 3))
    }
    // clamped metadata does not perturb the distance
    assert(GraftHistogram.tvd(
      new GenericArrayData(Array(2L, 2L, 9L)),
      new GenericArrayData(Array(3L, 1L, 0L))) == 0.25)
  }

  test("tvd scalar: generated code == interpreted, both paths") {
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
      .groupBy("source")
      .agg(expr("graft_hist_agg(n_chars, 0.0, 1024.0, 64)").as("h"))
      .crossJoin(spark.read.parquet(s"$sfDir/documents.parquet")
        .select(expr("graft_hist_agg(n_chars, 0.0, 1024.0, 64)").as("g")))
    val results = Seq("true", "false").map { codegen =>
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      try df.select(col("source"), expr("graft_hist_tvd(h, g)").as("d"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
    assert(results(0) == results(1))
    assert(results(0).values.forall(d => d >= 0.0 && d <= 1.0))
  }

  test("windowed percentile at coarser grain resolves semiadditively (last)") {
    // query grain {} is coarser than the order grain {order_date}: the
    // semiadditive 'last' rule must return the frame value at the max
    // date — i.e. the trailing-30d p50 as of the latest order date
    val cat = graft.SparkEntry.catalog(spark, sfDir)
    val v = cat.get("mv_orders_dist")
    val global = v.query(Seq(), Seq("trailing_30d_p50_value")).collect()
    assert(global.length == 1)
    val perDate = v.query(Seq("order_date"), Seq("trailing_30d_p50_value"))
      .orderBy(col("order_date").desc).limit(1).collect()
    assert(global(0).getDouble(0) == perDate(0).getDouble(1))
  }

  test("property: estimate within one bin width of the exact order statistic") {
    // the bound is structural, not statistical: the picked bin contains
    // the target-rank element, and the interpolated estimate stays
    // inside that bin — so |est − exact| ≤ (hi−lo)/bins for any data
    // within the declared domain. Fixed-seed sweep over sizes, domains,
    // bin counts and percentiles.
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 25) {
      val lo = rnd.nextInt(1000).toDouble
      val hi = lo + 1 + rnd.nextInt(100000).toDouble
      val bins = Seq(8, 64, 256, 1024)(rnd.nextInt(4))
      val n = 1 + rnd.nextInt(5000)
      val p = Seq(0.0, 0.01, 0.25, 0.5, 0.9, 0.99, 1.0)(rnd.nextInt(7))
      val w = (hi - lo) / bins
      val xs = Array.fill(n)(lo + rnd.nextDouble() * (hi - lo))
      val h = new Array[Long](bins + 1)
      xs.foreach(x => h(GraftHistogram.binOf(x, lo, hi, bins)) += 1L)
      val est = GraftHistogram.quantile(new GenericArrayData(h), p, lo, hi)
      val sorted = xs.sorted
      val rank = math.max(1, math.ceil(p * n).toInt)
      val exact = sorted(rank - 1)
      assert(math.abs(est - exact) <= w + 1e-9,
        s"n=$n bins=$bins p=$p: est $est vs exact $exact (width $w)")
    }
  }

  test("clamped count: out-of-domain mass is counted, estimates unchanged") {
    // domain [0, 100): -3 (below lo), 110 and 100 (at/above hi) clamp to
    // edge bins AND tick the trailing slot; in-domain values do not
    val df = Seq(5.0, 15.0, 25.0, 35.0, -3.0, 110.0, 100.0).toDF("x")
    val h = df.select(expr("graft_hist_agg(x, 0.0, 100.0, 10)").as("h"))
    val r = h.select(
      expr("graft_hist_clamped(h)").as("c"),
      expr("graft_hist_quantile(h, 0.5, 0.0, 100.0)").as("q")).head()
    assert(r.getLong(0) == 3L)
    // estimate identical to the same mass pre-clamped into the domain by
    // hand — the slot is pure metadata, the edge-fold behavior unchanged
    val preClamped = Seq(5.0, 15.0, 25.0, 35.0, 0.0, 99.99, 99.99).toDF("x")
      .select(expr("graft_hist_quantile(graft_hist_agg(x, 0.0, 100.0, 10), 0.5, 0.0, 100.0)"))
      .head().getDouble(0)
    assert(r.getDouble(1) == preClamped)
    // fully in-domain data reads 0 — the healthy-measure signal
    val clean = Seq(5.0, 15.0).toDF("x")
      .select(expr("graft_hist_clamped(graft_hist_agg(x, 0.0, 100.0, 10))"))
      .head().getLong(0)
    assert(clean == 0L)
    // clamped slot merges by add across partials, like the bins
    val merged = Seq((0, -5.0), (1, 200.0), (0, 50.0), (1, 60.0)).toDF("p", "x")
      .groupBy("p").agg(expr("graft_hist_agg(x, 0.0, 100.0, 10)").as("h"))
      .select(expr("graft_hist_clamped(graft_hist_merge(h))"))
      .head().getLong(0)
    assert(merged == 2L)
    // codegen == interpreted for the clamped scalar (parity contract all
    // seven custom expressions carry)
    val both = Seq("true", "false").map { codegen =>
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      try h.select(expr("graft_hist_clamped(h)")).head().getLong(0)
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
    assert(both(0) == both(1))
  }

  test("analysis-time failures: bad value type, non-literal bins, p out of range") {
    val df = Seq(("a", 1.0)).toDF("s", "x")
    intercept[Exception] {
      df.select(expr("graft_hist_agg(s, 0.0, 1.0, 8)")).collect()
    }
    intercept[Exception] {
      df.select(expr("graft_hist_agg(x, 0.0, 1.0, cast(x as int))")).collect()
    }
    intercept[Exception] {
      df.select(expr("graft_percentile_bounded(x, 1.5, 0.0, 1.0, 8)")).collect()
    }
    intercept[Exception] { // hi <= lo
      df.select(expr("graft_hist_agg(x, 1.0, 1.0, 8)")).collect()
    }
  }
}
