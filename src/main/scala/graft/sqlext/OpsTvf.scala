package graft.sqlext

import org.apache.spark.sql.{GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedTableValuedFunction
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types._

/** SQL surface for the two operator families a SQL-only user of the
  * engine could not reach (VERDICT r11 missing-1 / task 7) — the same
  * post-parse TVF-splice recipe as [[SpineTvf]]:
  *
  * {{{
  * -- binned point-in-interval range join (IntervalJoin.pointInInterval):
  * SELECT * FROM graft_interval_join(
  *   'points_view', 'intervals_view',   -- catalog/temp-view names
  *   'ts', 'lo', 'hi',                  -- point column, interval bounds
  *   86400000000,                       -- bin width (µs for timestamps)
  *   'user_id')                         -- optional equi-key csv
  *
  * -- interval-overlap pairs (IntervalJoin.intervalOverlap):
  * SELECT * FROM graft_interval_overlap(
  *   'left_view', 'right_view', 'lo_l', 'hi_l', 'lo_r', 'hi_r',
  *   86400000000, 'user_id')
  *
  * -- BM25 over a persisted inverted index (Bm25Index):
  * SELECT * FROM graft_bm25('/path/to/index', 'probe query terms')
  * SELECT * FROM graft_bm25('/path/to/index', 'probe query terms', 15)
  *
  * -- exact-phrase containment from the positional postings:
  * SELECT * FROM graft_phrase('/path/to/index', 'verbatim eval sentence')
  *
  * -- overlapping retrieval chunks (Chunking.chunks; r13):
  * SELECT * FROM graft_chunks('docs_view', 64, 48)          -- window, stride
  * SELECT * FROM graft_chunks('docs_view', 64, 48, 'source') -- carry csv
  *
  * -- ingest-daemon ledger introspection (ContinuousIngest.status; r13):
  * SELECT * FROM graft_daemon_status('dedup=/p/index,drift=/p/drift,...')
  *
  * -- TF-IDF top-k keywords per doc from the maintained index (r13):
  * SELECT * FROM graft_tfidf('/path/to/index', 3)
  * }}}
  *
  * All splice an already-analyzed plan where the stock parser left an
  * `UnresolvedTableValuedFunction`, so projections / filters /
  * aggregates / ORDER BY above compose naturally and the plan quality
  * is the DataFrame path's (the interval join stays a bin equi-join,
  * never a nested-loop; the BM25 probe stays bucket-pruned; chunking
  * stays a narrow per-row fan-out).
  * `graft_bm25` without `k` is fully lazy (two metadata-scale driver
  * lookups for bucket ids + corpus stats); with `k` it runs the
  * MaxScore loop ([[graft.ops.Bm25Index.topKFromState]]) eagerly at
  * parse time — the loop is adaptive (θ-bounded), so its result IS the
  * spliced relation.
  *
  * Parse-time caveats (ADVICE r12): the index-backed TVFs resolve the
  * live snapshot directory — and `graft_bm25(..., k)` runs its probe,
  * `graft_daemon_status` reads the ledgers — when the SQL string is
  * PARSED. So (a) `EXPLAIN` on a k-probe executes real Spark jobs, and
  * (b) a parsed plan pins the snapshot version it resolved: hold one
  * across a fold + GC and it reads a deleted version dir — re-parse
  * after folding (the engine's own query registry re-parses per
  * invocation, so the bench/oracle surfaces are always fresh). */
object OpsTvf {

  private def str(e: Expression, fn: String): String = e match {
    case Literal(s, StringType) if s != null => s.toString
    case other => sys.error(s"$fn arguments must be literals; got ${other.sql}")
  }
  private def num(e: Expression, fn: String): Long = e match {
    case Literal(v, _: IntegerType) => v.asInstanceOf[Int].toLong
    case Literal(v, _: LongType) => v.asInstanceOf[Long]
    case Literal(s, StringType) if s != null => s.toString.trim.toLong
    case other => sys.error(s"$fn numeric argument expected; got ${other.sql}")
  }
  private def csv(s: String): Seq[String] =
    s.split(",").map(_.trim).filter(_.nonEmpty).toSeq

  private def session: SparkSession = {
    val s = SparkSession.getActiveSession.getOrElse(
      sys.error("graft TVFs need an active SparkSession"))
    s
  }

  /** Replace every `graft_interval_join(...)` / `graft_bm25(...)` TVF
    * in a freshly-parsed plan; plans without one pass untouched. */
  def rewrite(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case tvf: UnresolvedTableValuedFunction
        if tvf.name.map(_.toLowerCase) == Seq("graft_interval_join") =>
      val fn = "graft_interval_join"
      val a = tvf.functionArgs
      require(a.length == 6 || a.length == 7,
        s"$fn(points, intervals, pointCol, loCol, hiCol, binWidth[, keysCsv]) " +
          s"takes 6 or 7 arguments, got ${a.length}")
      val s = session
      GraftBridge.logicalPlan(graft.ops.IntervalJoin.pointInInterval(
        s.table(str(a(0), fn)), s.table(str(a(1), fn)),
        str(a(2), fn), str(a(3), fn), str(a(4), fn), num(a(5), fn),
        keys = a.drop(6).headOption.map(e => csv(str(e, fn))).getOrElse(Nil)))

    case tvf: UnresolvedTableValuedFunction
        if tvf.name.map(_.toLowerCase) == Seq("graft_interval_overlap") =>
      val fn = "graft_interval_overlap"
      val a = tvf.functionArgs
      require(a.length == 7 || a.length == 8,
        s"$fn(left, right, loL, hiL, loR, hiR, binWidth[, keysCsv]) " +
          s"takes 7 or 8 arguments, got ${a.length}")
      val s = session
      GraftBridge.logicalPlan(graft.ops.IntervalJoin.intervalOverlap(
        s.table(str(a(0), fn)), s.table(str(a(1), fn)),
        str(a(2), fn), str(a(3), fn), str(a(4), fn), str(a(5), fn),
        num(a(6), fn),
        keys = a.drop(7).headOption.map(e => csv(str(e, fn))).getOrElse(Nil)))

    case tvf: UnresolvedTableValuedFunction
        if tvf.name.map(_.toLowerCase) == Seq("graft_phrase") =>
      val fn = "graft_phrase"
      val a = tvf.functionArgs
      require(a.length == 2,
        s"$fn(index_root, phrase) takes 2 arguments, got ${a.length}")
      val s = session
      val root = str(a(0), fn)
      GraftBridge.logicalPlan(graft.ops.Bm25Index.phraseFromState(
        s, root, str(a(1), fn),
        nBuckets = graft.ops.Bm25Index.storedBuckets(root)))

    case tvf: UnresolvedTableValuedFunction
        if tvf.name.map(_.toLowerCase) == Seq("graft_chunks") =>
      val fn = "graft_chunks"
      val a = tvf.functionArgs
      require(a.length == 3 || a.length == 4,
        s"$fn(docs_view, window, stride[, carryCsv]) takes 3 or 4 " +
          s"arguments, got ${a.length}")
      val s = session
      GraftBridge.logicalPlan(graft.ops.Chunking.chunks(
        s.table(str(a(0), fn)), num(a(1), fn).toInt, num(a(2), fn).toInt,
        carry = a.drop(3).headOption.map(e => csv(str(e, fn)))
          .getOrElse(Seq("source"))))

    case tvf: UnresolvedTableValuedFunction
        if tvf.name.map(_.toLowerCase) == Seq("graft_tfidf") =>
      val fn = "graft_tfidf"
      val a = tvf.functionArgs
      require(a.length == 2,
        s"$fn(index_root, k) takes 2 arguments, got ${a.length}")
      val s = session
      val root = str(a(0), fn)
      GraftBridge.logicalPlan(graft.ops.Bm25Index.tfidfFromState(
        s, root, k = num(a(1), fn).toInt,
        nBuckets = graft.ops.Bm25Index.storedBuckets(root)))

    case tvf: UnresolvedTableValuedFunction
        if tvf.name.map(_.toLowerCase) == Seq("graft_daemon_status") =>
      val fn = "graft_daemon_status"
      val a = tvf.functionArgs
      require(a.length == 1,
        s"$fn(rootsCsv) takes 1 argument ('family=path,...'), got ${a.length}")
      val s = session
      val roots = csv(str(a(0), fn)).map { kv =>
        val i = kv.indexOf('=')
        require(i > 0, s"$fn: each csv entry must be family=path, got '$kv'")
        kv.take(i).trim -> kv.drop(i + 1).trim
      }.toMap
      GraftBridge.logicalPlan(graft.streaming.ContinuousIngest.status(s, roots))

    case tvf: UnresolvedTableValuedFunction
        if tvf.name.map(_.toLowerCase) == Seq("graft_bm25") =>
      val fn = "graft_bm25"
      val a = tvf.functionArgs
      require(a.length == 2 || a.length == 3,
        s"$fn(index_root, query[, k]) takes 2 or 3 arguments, got ${a.length}")
      val s = session
      val root = str(a(0), fn)
      // the index names its own bucket count (_params) — a SQL caller
      // identifies an index by path alone
      val nb = graft.ops.Bm25Index.storedBuckets(root)
      val df =
        if (a.length == 3)
          graft.ops.Bm25Index.topKFromState(s, root, str(a(1), fn),
            k = num(a(2), fn).toInt, nBuckets = nb)
        else
          graft.ops.Bm25Index.scoresFromState(s, root, str(a(1), fn),
            nBuckets = nb)
      GraftBridge.logicalPlan(df)
  }
}
