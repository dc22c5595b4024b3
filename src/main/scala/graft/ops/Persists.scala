package graft.ops

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Registry of datasets the near-dup operators persist for their
  * self-join stages (aliased subplans are not deduped by ReuseExchange,
  * so the shared table must be cached — see MinHashLSH.candidatePairs).
  *
  * The operators return lazy DataFrames, so they cannot unpersist
  * before the caller's terminal action; instead every persist is
  * registered here and released by a [[QueryExecutionListener]] that
  * fires after each action completes — a long-lived session (or a
  * 38-query bench JVM) must not accumulate dead cache blocks that
  * squeeze execution memory. Releasing is always safe: persist is a
  * performance hint, and an unpersisted dataset that is read again
  * simply recomputes. PersistLifecycleSpec gates this: no persistent
  * RDDs may survive an ext query's action.
  */
object Persists {
  private val registered =
    new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()
  private val installed = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  /** Persist MEMORY_AND_DISK, register for release after the next
    * completed action on this session. */
  def cache[T](ds: Dataset[T]): Dataset[T] = {
    install(ds.sparkSession)
    val p = ds.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    registered.add(p)
    p
  }

  /** Idempotently hook the session so every finished action (success or
    * failure) releases the persists registered up to that point. The
    * listener bus delivers asynchronously — callers who assert on
    * storage state must wait (see PersistLifecycleSpec.awaitRelease). */
  private def install(spark: SparkSession): Unit =
    if (installed.add(spark)) {
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
          releaseAll()
        override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
          releaseAll()
      })
    }

  /** Unpersist everything registered since the last release. */
  def releaseAll(): Unit = {
    var ds = registered.poll()
    while (ds != null) { ds.unpersist(false); ds = registered.poll() }
  }
}
