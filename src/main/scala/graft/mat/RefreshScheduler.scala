package graft.mat

import graft.api.MetricViewCatalog

/** Schedule-driven refresh: decides which metric views are DUE under
  * their typed `Schedule` and drives `catalog.refresh` for them — the
  * engine-native analogue of the reference's refresh driver
  * (scripts/refresh_metric_views.py:109-119 polls each view's pipeline
  * and triggers an update; here the "pipeline" is the in-engine
  * materializer).
  *
  * Dueness is a pure function of (lastRefresh, now) so it is testable
  * without clock threads, and the caller owns the cadence: wire
  * `tick(System.currentTimeMillis)` to any timer/cron/stream trigger.
  * A view with no materialization schedule is never due. First tick
  * refreshes everything scheduled (no recorded refresh yet) — matching
  * the reference's behavior of building on first deploy.
  */
final class RefreshScheduler(cat: MetricViewCatalog) {

  private val last = scala.collection.concurrent.TrieMap[String, Long]()

  /** Record an out-of-band refresh (e.g. an explicit
    * `catalog.refresh`) so the next tick doesn't redo it. */
  def markRefreshed(name: String, at: Long): Unit = last(name) = at

  /** Views whose schedule period has elapsed at `now`. */
  def due(now: Long): Seq[String] =
    cat.list.filter { n =>
      cat.get(n).spec.materialization.flatMap(_.schedule).exists { s =>
        last.get(n).forall(at => now - at >= s.periodMillis)
      }
    }.sorted

  @volatile private var failures: Map[String, Throwable] = Map.empty

  /** Failures from the most recent [[tick]] (empty when it fully
    * succeeded) — the caller's hook for alerting/retry policy. */
  def lastFailures: Map[String, Throwable] = failures

  /** Refresh every due view; returns the names refreshed successfully.
    * One view's failing refresh must not starve the views sorted after
    * it (ADVICE r4): each refresh is isolated, failures are collected
    * into [[lastFailures]], and a failed view keeps its stale
    * `lastRefresh` so the next tick retries it. */
  def tick(now: Long): Seq[String] = {
    val d = due(now)
    val failed = scala.collection.mutable.LinkedHashMap[String, Throwable]()
    val ok = d.filter { n =>
      try { cat.refresh(n); markRefreshed(n, now); true }
      catch { case scala.util.control.NonFatal(e) => failed(n) = e; false }
    }
    failures = failed.toMap
    ok
  }
}
