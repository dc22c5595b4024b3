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
