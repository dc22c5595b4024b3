package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** SpaceSaving sketch contracts (GraftTopK scaladoc): exactness below
  * capacity regardless of partitioning, the published error bounds
  * beyond it, heavy-hitter presence, and the SQL registry. */
class GraftTopKSpec extends SparkSpec {

  import spark.implicits._

  private def topkRows(df: org.apache.spark.sql.DataFrame, sql: String): Seq[Row] =
    df.agg(expr(sql).as("t")).select(explode(col("t")).as("e"))
      .select("e.item", "e.cnt", "e.err").collect().toSeq

  test("exact regime: counts match groupBy exactly, any partitioning") {
    // 40 distinct keys with distinct frequencies, capacity 64 > 40
    val raw = (1 to 40).flatMap(i => Seq.fill(i)(s"k$i"))
    val truth = raw.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 3, 17)) {
      val df = raw.toDF("k").repartition(parts)
      val got = topkRows(df, "graft_topk(k, 10, 64)")
      assert(got.size == 10)
      // top-10 by (cnt desc, item asc): frequencies 40..31, all exact
      assert(got.map(_.getLong(1)).toSeq == (40 to 31 by -1).map(_.toLong))
      got.foreach { r =>
        assert(r.getLong(2) == 0L, s"exact regime must report err=0: $r")
        assert(r.getLong(1) == truth(r.getString(0)))
      }
    }
  }

  test("beyond capacity: cnt >= true >= cnt - err, heavy hitters present") {
    // zipf-ish stream: 5 heavy keys (300 each) + 200 singletons, cap 32
    val raw = scala.util.Random.javaRandomToRandom(new java.util.Random(7))
      .shuffle((1 to 5).flatMap(i => Seq.fill(300)(s"heavy$i")) ++
        (1 to 200).map(i => s"rare$i"))
    val truth = raw.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = raw.size
    val df = raw.toDF("k").repartition(4)
    val got = topkRows(df, "graft_topk(k, 8, 32)")
    assert(got.size == 8)
    got.foreach { r =>
      val t = truth(r.getString(0))
      assert(r.getLong(1) >= t, s"cnt must overcount: $r true=$t")
      assert(r.getLong(1) - r.getLong(2) <= t, s"cnt-err must undercount: $r true=$t")
    }
    // every key with true freq > n/capacity must be reported
    val mustHave = truth.filter(_._2 > n / 32).keySet
    val reported = got.map(_.getString(0)).toSet
    assert(mustHave.subsetOf(reported),
      s"missing heavy hitters: ${mustHave -- reported}")
  }

  test("partial/merge split == whole (exact regime, byte-level identity)") {
    val raw = (1 to 30).flatMap(i => Seq.fill(i % 7 + 1)(s"v$i"))
    val df = raw.toDF("k")
    val whole = df.agg(expr("graft_topk_agg(k, 128)").as("st"))
      .select(expr("graft_topk_extract(st, 30)").cast("string")).head.getString(0)
    val split = df.withColumn("half", length(col("k")) % 2)
      .groupBy("half").agg(expr("graft_topk_agg(k, 128)").as("st"))
      .agg(expr("graft_topk_merge(st)").as("m"))
      .select(expr("graft_topk_extract(m, 30)").cast("string")).head.getString(0)
    assert(whole == split)
  }

  test("capacity mismatch between merged states fails loudly") {
    val a = new GraftTopK.State(4); val b = new GraftTopK.State(8)
    intercept[IllegalArgumentException] { GraftTopK.mergeInto(a, b) }
  }

  test("non-key types and bad literals are rejected at analysis") {
    val df = Seq((1.5, "x")).toDF("d", "s")
    intercept[Exception] { df.agg(expr("graft_topk(d, 3, 16)")).schema }
    intercept[Exception] { df.agg(expr("graft_topk(s, 3, 0)")).schema }
  }

  test("null literals fail type-check, not with an NPE (ADVICE r10)") {
    val df = Seq(("x", 1)).toDF("s", "n")
    def analysisFailure(sql: String): Unit = {
      val e = intercept[Exception] { df.agg(expr(sql)).schema }
      assert(!e.isInstanceOf[NullPointerException], s"NPE leaked for: $sql")
    }
    analysisFailure("graft_topk(s, 3, CAST(NULL AS INT))")
    analysisFailure("graft_topk(s, CAST(NULL AS INT), 16)")
    analysisFailure("graft_hist_agg(n, CAST(NULL AS DOUBLE), 10.0, 8)")
    analysisFailure("graft_hist_quantile(graft_hist_agg(n, 0.0, 10.0, 8), CAST(NULL AS DOUBLE), 0.0, 10.0)")
  }
}
