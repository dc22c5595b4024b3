package graft.ops

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Registry of datasets the near-dup operators persist for their
  * self-join stages (aliased subplans are not deduped by ReuseExchange,
  * so the shared table must be cached — see MinHashLSH.candidatePairs).
  *
  * The operators return lazy DataFrames, so they cannot unpersist
  * before the caller's terminal action; instead every persist is
  * registered here and released by a [[QueryExecutionListener]] after
  * an action completes — a long-lived session (or a 43-query bench JVM)
  * must not accumulate dead cache blocks that squeeze execution memory.
  *
  * Release is scoped to the action that owns the persist (ADVICE r3):
  * a completed action releases only registrations whose plan it
  * actually consumed (`sameResult` subtree match against the action's
  * analyzed plan), at most one registration per distinct plan. Because
  * Spark's CacheManager keys cached data by plan — a second `persist`
  * of an equal plan shares the first's cache entry — the entry is
  * unpersisted only when no *other* registration still references the
  * same plan. So an unrelated action releases nothing, and back-to-back
  * runs of the same query (min-of-3 bench) can overlap with the
  * previous run's async listener without losing their live cache.
  * Releasing is always safe regardless: persist is a performance hint,
  * and an unpersisted dataset that is read again simply recomputes.
  * PersistLifecycleSpec gates this: no persistent RDDs may survive an
  * ext query's action.
  */
object Persists {
  private final case class Entry(ds: Dataset[_], plan: LogicalPlan, epoch: Long)
  private val registered = scala.collection.mutable.ArrayBuffer[Entry]()
  // monotonically counts completed actions; a registration whose plan
  // is NEVER consumed by any action (DataFrame built, never executed)
  // would otherwise stay persisted for the session lifetime (ADVICE
  // r4) — entries older than `maxEpochAge` actions are swept on the
  // next release pass. 64 actions is far beyond any legitimate
  // build-to-action distance in this engine (operators persist at most
  // a couple of actions before their terminal one).
  private var actionEpoch = 0L
  @volatile private[graft] var maxEpochAge: Long = 64L
  private val installed = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  /** Persist MEMORY_AND_DISK, register for release after the next
    * completed action that consumes this dataset's plan. */
  def cache[T](ds: Dataset[T]): Dataset[T] = {
    install(ds.sparkSession)
    val p = ds.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    synchronized { registered += Entry(p, p.queryExecution.analyzed, actionEpoch) }
    p
  }

  /** Persist and register for release after `actions` consuming
    * actions (r9): an operator that must run an intermediate
    * metadata-scale action (e.g. collecting candidate bucket values
    * for a partition predicate) before its caller's terminal action
    * registers 2 — the intermediate action's release claims one entry,
    * and the shared-plan rule keeps the cache alive for the survivor,
    * so the terminal action reads the cache instead of recomputing the
    * pipeline (the q_dedup_incremental 2.4→4.2 s regression this
    * fixed). */
  def cacheFor[T](ds: Dataset[T], actions: Int): Dataset[T] = {
    require(actions >= 1)
    install(ds.sparkSession)
    val p = ds.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    synchronized {
      (1 to actions).foreach(_ => registered += Entry(p, p.queryExecution.analyzed, actionEpoch))
    }
    p
  }

  /** Persist `ds`, but key its release on `visible`'s plan — for
    * operators that hand callers a lineage-truncated wrapper (a
    * `LogicalRDD` from [[org.apache.spark.sql.GraftBridge.flatten]])
    * whose plan no longer contains `ds`'s subtree. The caller's action
    * consumes `visible`; completing it releases `ds`. */
  def cacheBehind[T](ds: Dataset[T], visible: Dataset[_]): Dataset[T] = {
    install(ds.sparkSession)
    val p = ds.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    synchronized { registered += Entry(p, visible.queryExecution.analyzed, actionEpoch) }
    p
  }

  /** Idempotently hook the session so every finished action (success or
    * failure) releases the persists it consumed. The listener bus
    * delivers asynchronously — callers who assert on storage state must
    * wait (see PersistLifecycleSpec.awaitRelease). */
  private def install(spark: SparkSession): Unit =
    if (installed.add(spark)) {
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
          releaseFor(qe)
        override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
          releaseFor(qe)
      })
    }

  private def consumed(qe: QueryExecution, plan: LogicalPlan): Boolean =
    try qe.analyzed.exists(_.sameResult(plan))
    catch { case scala.util.control.NonFatal(_) => false }

  /** Release the registrations owned by this completed action: oldest
    * registration per distinct consumed plan, plus any registration
    * stale by `maxEpochAge` actions (its plan was never executed — no
    * future action will claim it); unpersist only plans with no
    * surviving registration (shared CacheManager entry semantics). */
  def releaseFor(qe: QueryExecution): Unit =
    // the WHOLE body is guarded (r13, VERDICT r12 task 2): this runs on
    // the listener bus after EVERY action, and cache release is a
    // performance hint — an exception here (a sameResult walk over an
    // exotic plan, an unpersist race with session teardown) must never
    // stack-trace into the driver's stdout tail, where it evicted
    // BENCH_r12's JSON line. One WARN line, no trace.
    try {
      val toUnpersist = synchronized {
        actionEpoch += 1
        val claimed = scala.collection.mutable.ArrayBuffer[Entry]()
        val keep = scala.collection.mutable.ArrayBuffer[Entry]()
        registered.foreach { e =>
          if (actionEpoch - e.epoch > maxEpochAge) claimed += e
          else if (!claimed.exists(_.plan.sameResult(e.plan)) && consumed(qe, e.plan)) claimed += e
          else keep += e
        }
        registered.clear(); registered ++= keep
        claimed.filterNot(c => keep.exists(_.plan.sameResult(c.plan)))
      }
      toUnpersist.foreach(_.ds.unpersist(false))
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[graft] WARN cache release skipped: ${e.getMessage}")
    }

  /** Unconditionally unpersist every surviving registration (session
    * teardown / test cleanup). */
  def releaseAll(): Unit = {
    val all = synchronized { val a = registered.toVector; registered.clear(); a }
    all.foreach(_.ds.unpersist(false))
  }
}
