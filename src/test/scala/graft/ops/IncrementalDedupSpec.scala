package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental dedup (r8): O(delta) near-dup matching against a
  * persisted corpus index. The load-bearing property is the
  * equivalence contract — batch pipeline on corpus ∪ delta, restricted
  * to delta-involving pairs — because that is what lets the DuckDB
  * oracle hash-gate q_dedup_incremental with the batch CTEs. */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  /** 40 base docs (corpus) + 10 mutated near-dups and 2 fresh docs
    * (delta) — mutations of corpus docs land delta⟷corpus pairs, the
    * identical fresh pair lands a delta⟷delta pair. */
  private lazy val (corpus, delta): (DataFrame, DataFrame) = {
    val rnd = new scala.util.Random(13)
    val vocab = Vector("spark", "table", "query", "join", "filter", "agg",
      "window", "batch", "stream", "column", "row", "hash", "sort", "scan",
      "merge", "key", "value", "data", "fast", "slow")
    val base = (0 until 40).map(_ =>
      (0 until 60).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val mutated = base.take(10).map { t =>
      val ws = t.split(" ").toVector
      val drop = rnd.nextInt(ws.size)
      ws.zipWithIndex.collect { case (w, j) if j != drop => w }.mkString(" ")
    }
    val fresh = (0 until 60).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val c = base.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val d = mutated.zipWithIndex.map { case (t, i) => (100L + i, t) } ++
      Seq((200L, fresh), (201L, fresh))
    (c.toDF("doc_id", "text"), d.toDF("doc_id", "text"))
  }

  private def rows(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("deltaPairs == batch pipeline on corpus ∪ delta restricted to delta-involving pairs") {
    val union = corpus.unionByName(delta)
    val expected = rows(MinHashLSH.candidatePairs(union)
      .filter(col("a_id") >= 100L || col("b_id") >= 100L))
    assert(expected.nonEmpty, "fixture must produce delta-involving pairs")
    assert(expected.exists(p => p._1 >= 100L && p._2 >= 100L),
      "fixture must include a delta-delta pair")

    val idx = java.nio.file.Files.createTempDirectory("graft-inc-dedup").toString
    IncrementalDedup.writeIndex(corpus, idx)
    val got = rows(IncrementalDedup.deltaPairs(spark, idx, delta))
    assert(got == expected, s"missing: ${expected -- got}; extra: ${got -- expected}")
  }

  test("combined occupancy drives the bucket cap: corpus + delta copies overflow together") {
    // 3 identical docs in the corpus, 3 more arriving in the delta: a
    // combined bucket of 6. With cap 5 the batch pipeline drops those
    // buckets — the incremental path must count corpus+delta TOGETHER
    // (a delta-only census of 3 would pass the cap and diverge).
    val floodText = "flood flood attack attack evade evade dedup dedup now now"
    val c2 = corpus.unionByName(Seq((50L, floodText), (51L, floodText),
      (52L, floodText)).toDF("doc_id", "text"))
    val d2 = delta.unionByName(Seq((300L, floodText), (301L, floodText),
      (302L, floodText)).toDF("doc_id", "text"))
    val union = c2.unionByName(d2)
    val expected = rows(MinHashLSH.candidatePairs(union, maxBucketSize = 5)
      .filter(col("a_id") >= 100L || col("b_id") >= 100L))
    assert(!expected.exists(p => p._1 >= 300L || p._2 >= 300L),
      "batch pipeline must have capped the flooded bucket")

    val idx = java.nio.file.Files.createTempDirectory("graft-inc-dedup-cap").toString
    IncrementalDedup.writeIndex(c2, idx)
    val got = rows(IncrementalDedup.deltaPairs(spark, idx, d2, maxBucketSize = 5))
    assert(got == expected, s"missing: ${expected -- got}; extra: ${got -- expected}")
  }

  test("probing with mismatched hash-family params fails loudly; shuffle fallback matches broadcast plan") {
    val idx = java.nio.file.Files.createTempDirectory("graft-inc-dedup-params").toString
    IncrementalDedup.writeIndex(corpus, idx)
    val union = corpus.unionByName(delta)
    // a mismatched family would SILENTLY match nothing — must throw
    val ex = intercept[IllegalArgumentException] {
      IncrementalDedup.deltaPairs(spark, idx, delta, bands = 32, k = 64)
    }
    assert(ex.getMessage.contains("built with"))
    intercept[IllegalArgumentException] { // salted probe of unsalted index
      IncrementalDedup.deltaPairs(spark, idx, delta, salt = "s3cr3t")
    }
    // backfill-sized deltas disable the broadcast hints: same rows
    val bcast = rows(IncrementalDedup.deltaPairs(spark, idx, delta))
    val shuffled = rows(IncrementalDedup.deltaPairsGuarded(spark, idx, delta,
      broadcastDelta = false).pairs)
    assert(bcast == shuffled)
  }

  test("a hostile delta flooding an indexed bucket quarantines instead of evading dedup") {
    // 3 flood copies already in the corpus, 4 more arriving in the
    // delta: combined occupancy 7 > cap 5. The delta copies must
    // surface in the quarantine — a delta-only count (4 < 5) would
    // have let them pair *and* an unguarded path would have silently
    // skipped them.
    val floodText = "flood flood attack attack evade evade dedup dedup now now"
    val c2 = corpus.unionByName(Seq((60L, floodText), (61L, floodText),
      (62L, floodText)).toDF("doc_id", "text"))
    val d2 = delta.unionByName((0 until 4).map(i => (400L + i, floodText))
      .toDF("doc_id", "text"))
    val idx = java.nio.file.Files.createTempDirectory("graft-inc-dedup-q").toString
    IncrementalDedup.writeIndex(c2, idx)
    val guarded = IncrementalDedup.deltaPairsGuarded(spark, idx,
      d2, maxBucketSize = 5)
    val quarantined = guarded.quarantined.collect().map(_.getLong(0)).toSet
    assert((400L until 404L).toSet.subsetOf(quarantined),
      s"flooded delta docs missing from quarantine: ${(400L until 404L).toSet -- quarantined}")
    val pairIds = guarded.pairs.collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(pairIds.intersect((400L until 404L).toSet).isEmpty)
    // benign delta control: nothing quarantines at the default cap
    val idx2 = java.nio.file.Files.createTempDirectory("graft-inc-dedup-q2").toString
    IncrementalDedup.writeIndex(corpus, idx2)
    assert(IncrementalDedup.deltaPairsGuarded(spark, idx2,
      delta).quarantined.count() == 0)
  }

  test("verify-stage text read is partition-pruned to candidate buckets (r9)") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val idx = java.nio.file.Files.createTempDirectory("graft-inc-dedup-prune").toString
    // 16 doc buckets over corpus ids 0..39 → every bucket directory
    // exists, but only buckets holding a candidate id may be read
    IncrementalDedup.writeIndex(corpus, idx, dBuckets = 16)
    spark.conf.set("spark.sql.adaptive.enabled", "false") // static-plan convention
    try {
      val df = IncrementalDedup.deltaPairs(spark, idx, delta)
      val candBuckets = df.collect()
        .flatMap(r => Seq(r.getLong(0), r.getLong(1)))
        .map(id => (id % 16).toInt).toSet
      // the verify stage's shingle table is Persists-cached, so the
      // docs scan may sit under an InMemoryRelation depending on
      // (async) release timing — expand cached plans when walking
      def expand(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
        p +: (p.children.flatMap(expand) ++ (p match {
          case t: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
            expand(t.relation.cachedPlan)
          case _ => Nil
        }))
      val scan = expand(df.queryExecution.executedPlan).collect {
        case s: FileSourceScanExec if s.relation.location.rootPaths.exists(
          _.toString.endsWith("/docs")) => s
      }.head
      // the candidate-bucket isin is a STATIC partition filter — the
      // whole point is that un-candidate bucket directories are never
      // opened, provable before execution (the IvfIndex probe gate)
      val staticFilters = scan.partitionFilters.filterNot(_.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruningExpression]))
      assert(staticFilters.nonEmpty,
        "candidate-bucket predicate must reach the docs scan as a static PartitionFilter:\n" + scan)
      val selected = scan.relation.location.listFiles(staticFilters, Nil).size
      val total = scan.relation.location.listFiles(Nil, Nil).size
      assert(selected <= candBuckets.size && selected < total,
        s"expected ≤${candBuckets.size} of $total doc-bucket dirs read, got $selected")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("the corpus index streams through broadcast joins — never shuffled, never re-hashed") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val idx = java.nio.file.Files.createTempDirectory("graft-inc-dedup-plan").toString
    IncrementalDedup.writeIndex(corpus, idx)
    spark.conf.set("spark.sql.adaptive.enabled", "false") // static-plan convention
    try {
      val df = IncrementalDedup.deltaPairs(spark, idx, delta)
      // the pair stage is Persists-cached, so the index scan lives
      // inside an InMemoryRelation — expand cached plans when walking
      def expand(p: SparkPlan): Seq[SparkPlan] =
        p +: (p.children.flatMap(expand) ++ (p match {
          case t: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
            expand(t.relation.cachedPlan)
          case _ => Nil
        }))
      val plan = df.queryExecution.executedPlan
      def isBandedScan(p: SparkPlan): Boolean = p match {
        case s: FileSourceScanExec => s.relation.location.rootPaths.exists(
          _.toString.endsWith("/banded"))
        case _ => false
      }
      // "unshuffled to its join": the banded index's raw rows must hit
      // a BroadcastHashJoin (which reduces them to pairs / semi-prunes
      // them) BEFORE any shuffle. For every shuffle node, search its
      // subtree for the banded scan but STOP at broadcast joins — a hit
      // means raw index rows crossed an exchange. (Shuffles above the
      // pair join — the dropDuplicates over pair ids — are fine.)
      def rawScanBelow(p: SparkPlan): Boolean =
        if (isBandedScan(p)) true
        else p match {
          case _: BroadcastHashJoinExec => false // already reduced
          case t: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
            rawScanBelow(t.relation.cachedPlan)
          case other => other.children.exists(rawScanBelow)
        }
      assert(expand(plan).exists(isBandedScan),
        "plan must read the persisted banded index:\n" + plan)
      val offending = expand(plan).collect {
        case e: ShuffleExchangeLike if rawScanBelow(e) => e
      }
      assert(offending.isEmpty,
        "raw index rows were shuffled before their broadcast join:\n" +
          offending.mkString("\n"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
