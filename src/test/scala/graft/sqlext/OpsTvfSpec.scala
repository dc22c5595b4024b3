package graft.sqlext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SQL TVF surface == DataFrame path (the SqlMeasureSpec posture):
  * `graft_interval_join` and `graft_bm25` must produce byte-identical
  * results to the operators they splice, and keep their plan-quality
  * contracts (no nested-loop join; no corpus scan on a probe). */
class OpsTvfSpec extends SparkSpec {

  import spark.implicits._

  private lazy val points = Seq(
    (1L, 101L, 5L), (1L, 102L, 15L), (2L, 201L, 7L), (2L, 202L, 42L))
    .toDF("user_id", "event_id", "t")
  private lazy val intervals = Seq(
    (1L, 10L, 0L, 9L), (1L, 11L, 10L, 20L), (2L, 20L, 5L, 8L))
    .toDF("user_id", "ival_id", "lo", "hi")

  test("graft_interval_join == IntervalJoin.pointInInterval") {
    points.createOrReplaceTempView("tvf_points")
    intervals.createOrReplaceTempView("tvf_intervals")
    val sql = spark.sql(
      """SELECT * FROM graft_interval_join('tvf_points', 'tvf_intervals',
        |  't', 'lo', 'hi', 4, 'user_id')
        |ORDER BY user_id, event_id, ival_id""".stripMargin)
    val df = graft.ops.IntervalJoin.pointInInterval(points, intervals,
        "t", "lo", "hi", binWidth = 4, keys = Seq("user_id"))
      .orderBy("user_id", "event_id", "ival_id")
    assert(sql.columns.toSeq == df.columns.toSeq)
    assert(sql.collect().toSeq == df.collect().toSeq)
    assert(sql.count() == 3) // 101∈[0,9], 102∈[10,20], 201∈[5,8]
  }

  test("graft_interval_join composes under SQL aggregates") {
    points.createOrReplaceTempView("tvf_points")
    intervals.createOrReplaceTempView("tvf_intervals")
    val agg = spark.sql(
      """SELECT user_id, count(*) AS n
        |FROM graft_interval_join('tvf_points', 'tvf_intervals',
        |  't', 'lo', 'hi', 4, 'user_id')
        |GROUP BY user_id ORDER BY user_id""".stripMargin).collect()
    assert(agg.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 2L), (2L, 1L)))
  }

  test("graft_interval_join keeps the bin equi-join plan (no NLJ/cartesian)") {
    points.createOrReplaceTempView("tvf_points")
    intervals.createOrReplaceTempView("tvf_intervals")
    val df = spark.sql(
      """SELECT * FROM graft_interval_join('tvf_points', 'tvf_intervals',
        |  't', 'lo', 'hi', 4, 'user_id')""".stripMargin)
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"SQL surface must inherit the bin equi-join plan:\n$plan")
  }

  test("graft_interval_join rejects bad arity loudly") {
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft_interval_join('a', 'b')").collect()
    }
    assert(e.getMessage.contains("6 or 7 arguments"))
  }

  private lazy val docs = Seq(
    (1L, "web", "the quick brown fox jumps"),
    (2L, "web", "quick fox quick fox quick"),
    (3L, "books", "slow green turtle walks home"),
    (4L, "books", "the fox and the turtle")).toDF("doc_id", "source", "text")

  test("graft_bm25 == Bm25Index.scoresFromState, and with k == topKFromState") {
    val root = java.nio.file.Files.createTempDirectory("tvf_bm25").toString
    graft.ops.Bm25Index.writeState(docs, s"$root/state", nBuckets = 8)
    val sql = spark.sql(
      s"""SELECT * FROM graft_bm25('$root/state', 'quick fox')
         |ORDER BY doc_id""".stripMargin)
    val df = graft.ops.Bm25Index.scoresFromState(spark, s"$root/state",
        "quick fox", nBuckets = 8).orderBy("doc_id")
    assert(sql.columns.toSeq == df.columns.toSeq)
    assert(sql.collect().toSeq == df.collect().toSeq)

    val sqlTop = spark.sql(
      s"SELECT * FROM graft_bm25('$root/state', 'quick fox', 2)")
    val dfTop = graft.ops.Bm25Index.topKFromState(spark, s"$root/state",
      "quick fox", k = 2, nBuckets = 8)
    assert(sqlTop.collect().toSeq == dfTop.collect().toSeq)
    assert(sqlTop.count() == 2)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  test("graft_interval_overlap == IntervalJoin.intervalOverlap") {
    val left = Seq((1L, 10L, 0L, 9L), (1L, 11L, 20L, 30L))
      .toDF("user_id", "l_id", "l_lo", "l_hi")
    val right = Seq((1L, 20L, 5L, 25L), (1L, 21L, 40L, 50L))
      .toDF("user_id", "r_id", "r_lo", "r_hi")
    left.createOrReplaceTempView("tvf_left")
    right.createOrReplaceTempView("tvf_right")
    val sql = spark.sql(
      """SELECT * FROM graft_interval_overlap('tvf_left', 'tvf_right',
        |  'l_lo', 'l_hi', 'r_lo', 'r_hi', 4, 'user_id')
        |ORDER BY l_id, r_id""".stripMargin)
    val df = graft.ops.IntervalJoin.intervalOverlap(left, right,
        "l_lo", "l_hi", "r_lo", "r_hi", binWidth = 4, keys = Seq("user_id"))
      .orderBy("l_id", "r_id")
    assert(sql.collect().toSeq == df.collect().toSeq)
    assert(sql.count() == 2) // [0,9]∩[5,25], [20,30]∩[5,25]
  }

  test("graft_phrase == Bm25Index.phraseFromState") {
    val root = java.nio.file.Files.createTempDirectory("tvf_phrase").toString
    graft.ops.Bm25Index.writeState(docs, s"$root/state", nBuckets = 8)
    val sql = spark.sql(
      s"""SELECT * FROM graft_phrase('$root/state', 'quick fox')
         |ORDER BY doc_id""".stripMargin)
    val df = graft.ops.Bm25Index.phraseFromState(spark, s"$root/state",
        "quick fox", nBuckets = 8).orderBy("doc_id")
    assert(sql.collect().toSeq == df.collect().toSeq)
    // only doc 2 has CONSECUTIVE "quick fox" (twice); doc 1's is
    // "quick brown fox"
    assert(sql.count() == 1 && sql.head().getLong(2) == 2L)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  test("graft_bm25 default nBuckets probes a default-built index") {
    val root = java.nio.file.Files.createTempDirectory("tvf_bm25d").toString
    graft.ops.Bm25Index.writeState(docs, s"$root/state")
    val r = spark.sql(
      s"SELECT count(*) FROM graft_bm25('$root/state', 'turtle')").head()
    assert(r.getLong(0) == 2L) // docs 3 and 4
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  test("graft_chunks == Chunking.chunks, and composes under aggregates") {
    docs.createOrReplaceTempView("tvf_chunk_docs")
    val sql = spark.sql(
      """SELECT * FROM graft_chunks('tvf_chunk_docs', 4, 3)
        |ORDER BY doc_id, chunk_id""".stripMargin)
    val df = graft.ops.Chunking.chunks(docs, window = 4, stride = 3)
      .orderBy("doc_id", "chunk_id")
    assert(sql.columns.toSeq == df.columns.toSeq)
    assert(sql.collect().toSeq == df.collect().toSeq)
    // carry csv variant + aggregate composition above the TVF
    val agg = spark.sql(
      """SELECT doc_id, count(*) AS n, max(n_chunks) AS nc
        |FROM graft_chunks('tvf_chunk_docs', 4, 3, 'source')
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin).collect()
    assert(agg.forall(r => r.getLong(1) == r.getInt(2).toLong),
      "every chunk materializes exactly once per doc")
  }

  test("graft_chunks stays a narrow fan-out (no shuffle in the plan)") {
    docs.createOrReplaceTempView("tvf_chunk_docs")
    val df = spark.sql("SELECT * FROM graft_chunks('tvf_chunk_docs', 4, 3)")
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"chunking is a per-row fan-out and must not shuffle:\n$plan")
  }

  test("graft_tfidf == Bm25Index.tfidfFromState") {
    val root = java.nio.file.Files.createTempDirectory("tvf_tfidf").toString
    graft.ops.Bm25Index.writeState(docs, s"$root/state", nBuckets = 8)
    val sql = spark.sql(
      s"""SELECT * FROM graft_tfidf('$root/state', 2)
         |ORDER BY doc_id, rk""".stripMargin)
    val df = graft.ops.Bm25Index.tfidfFromState(spark, s"$root/state",
        k = 2, nBuckets = 8).orderBy("doc_id", "rk")
    assert(sql.columns.toSeq == df.columns.toSeq)
    assert(sql.collect().toSeq == df.collect().toSeq)
    assert(sql.count() == docs.count() * 2) // k terms per doc
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  test("graft_daemon_status == ContinuousIngest.status across ledger layouts") {
    val p = java.nio.file.Files.createTempDirectory("tvf_status").toString
    // one snapshot-versioned family (bm25 — ledger in the live version
    // dir) and one plain-file family (dedup band index)
    graft.ops.Bm25Index.writeState(docs, s"$p/bm25", nBuckets = 8)
    graft.ops.Bm25Index.applyDelta(spark, s"$p/bm25",
      Seq((90L, "w", "fresh turtle rows")).toDF("doc_id", "source", "text"),
      nBuckets = 8, foldId = Some("f1"))
    graft.ops.IncrementalDedup.writeIndex(docs, s"$p/index")
    val roots = Map("bm25" -> s"$p/bm25", "dedup" -> s"$p/index")
    val sql = spark.sql(
      s"""SELECT family, applied_folds, last_fold_id
         |FROM graft_daemon_status('bm25=$p/bm25,dedup=$p/index')
         |ORDER BY family""".stripMargin).collect().toSeq
    val df = graft.streaming.ContinuousIngest.status(spark, roots)
      .orderBy("family").collect().toSeq
    assert(sql == df)
    assert(sql.map(r => (r.getString(0), r.getLong(1))) ==
      Seq(("bm25", 1L), ("dedup", 0L)))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
    // the applyDelta above registered fold-posture caches (64-action
    // lifetime); release them so the shared test JVM stays clean
    graft.ops.Persists.releaseAll()
  }
}
