package graft.mat

import graft.SparkSpec

/** Dueness + drive semantics of the schedule-driven refresher. */
class RefreshSchedulerSpec extends SparkSpec {

  private def freshCatalog() = {
    val work = java.nio.file.Files.createTempDirectory("graft_sched").toString
    val cat = new graft.api.MetricViewCatalog(spark,
      graft.model.Models.resolve(spark, sfDir, _), Some(work))
    graft.spec.Specs.all.foreach { case (n, y) => cat.createOrReplace(n, y) }
    cat
  }

  test("first tick refreshes every scheduled view; next is period-gated") {
    val cat = freshCatalog()
    val sched = new RefreshScheduler(cat)
    val t0 = 1000000000000L

    val first = sched.tick(t0)
    // every spec with a materialization schedule is due on first tick
    val scheduled = cat.list.filter(n =>
      cat.get(n).spec.materialization.flatMap(_.schedule).isDefined).sorted
    assert(first == scheduled && first.nonEmpty)

    // one hour later nothing is due (shortest fixture schedule is weeks)
    assert(sched.tick(t0 + 3600L * 1000) == Seq.empty)

    // after the longest period, everything is due again
    val maxPeriod = scheduled
      .map(n => cat.get(n).spec.materialization.flatMap(_.schedule).get.periodMillis).max
    assert(sched.due(t0 + maxPeriod) == scheduled)
  }

  test("one failing refresh does not starve later due views; it retries next tick (ADVICE r4)") {
    // one-shot failure injected through the catalog's resolver (refresh
    // re-resolves its source; the bomb disarms after the first call so
    // only the first due view's refresh fails)
    val bomb = new java.util.concurrent.atomic.AtomicBoolean(false)
    val work = java.nio.file.Files.createTempDirectory("graft_sched_fail").toString
    val cat = new graft.api.MetricViewCatalog(spark,
      n => {
        if (bomb.getAndSet(false)) sys.error("injected refresh failure")
        graft.model.Models.resolve(spark, sfDir, n)
      }, Some(work))
    graft.spec.Specs.all.foreach { case (n, y) => cat.createOrReplace(n, y) }
    val sched = new RefreshScheduler(cat)
    val t0 = 3000000000000L
    val scheduled = sched.tick(t0)
    assert(scheduled.size >= 2 && sched.lastFailures.isEmpty)

    val maxPeriod = scheduled
      .map(n => cat.get(n).spec.materialization.flatMap(_.schedule).get.periodMillis).max
    val t1 = t0 + maxPeriod
    bomb.set(true)
    val ok = sched.tick(t1)
    assert(ok == scheduled.tail, "failure aborted the views sorted after it")
    assert(sched.lastFailures.keySet == Set(scheduled.head))

    // the failed view kept its stale clock: it alone is due, and a
    // clean retry succeeds
    assert(sched.due(t1 + 1) == Seq(scheduled.head))
    assert(sched.tick(t1 + 1) == Seq(scheduled.head) && sched.lastFailures.isEmpty)
  }

  test("refresh recomputes under an unchanged spec — new source rows are picked up (r5 fix)") {
    // the spec hash never changes here; only the source grows. Before
    // the fix, refresh delegated to build's spec-hash idempotence and
    // served the first snapshot forever.
    @volatile var cap = 100
    val work = java.nio.file.Files.createTempDirectory("graft_refresh_force").toString
    val cat = new graft.api.MetricViewCatalog(spark,
      n => graft.model.Models.resolve(spark, sfDir, n).limit(cap), Some(work))
    val v = cat.createOrReplace("mv_orders_simple", graft.spec.Specs.all("mv_orders_simple"))
    cat.refresh("mv_orders_simple")
    def totalRows: Long = {
      import org.apache.spark.sql.functions.sum
      v.query(Seq("order_status"), Seq("order_count"))
        .agg(sum("order_count")).collect()(0).getLong(0)
    }
    assert(totalRows == 100L)
    cap = 250 // "new rows arrived"
    cat.refresh("mv_orders_simple")
    assert(totalRows == 250L, "refresh served the stale pre-growth snapshot")
  }

  test("unscheduled views are never due; out-of-band refresh resets the clock") {
    val cat = freshCatalog()
    val sched = new RefreshScheduler(cat)
    val t0 = 2000000000000L
    val scheduled = sched.due(t0)
    assert(!scheduled.contains("mv_sales_geo")) // no materialization block

    val v = scheduled.head
    sched.markRefreshed(v, t0)
    assert(!sched.due(t0 + 1).contains(v))
    val period = cat.get(v).spec.materialization.flatMap(_.schedule).get.periodMillis
    assert(sched.due(t0 + period).contains(v))
  }
}
