package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** A store fold split at its guard collect (r14, VERDICT r13 task 4).
  *
  * Every id-guarded incremental store (bm25, fingerprints, segments,
  * spans) folds in two phases: ONE driver collect over a small
  * tagged-union guard frame (delta-contract stats, id-overlap counts,
  * bucket lists), then the commit (appends + ledger + pointer flip)
  * driven by the collected rows. Standalone `applyDelta` calls run
  * both phases themselves ([[GuardedFold.runStandalone]], behavior
  * unchanged); the ingest daemon instead gathers every family's
  * [[legs]] into ONE combined collect per microbatch
  * ([[GuardedFold.collectAll]]) — at nine families the per-family
  * guard round-trips were the largest measured slice of the daemon's
  * per-batch fixed cost (BENCH_DAEMONFLOOR_r13: f = 8.56 s/batch,
  * ~0.95 s/family, against a 3.5 s volume term).
  *
  * Leg row shape, shared by every participating store:
  * `(t string, a long, b long, arr array<int>)` — `t` is the
  * store-local tag ("stats", "overlap", …); [[GuardedFold.collectAll]]
  * prefixes it with the family name for the union and strips the
  * prefix again when dispatching rows back to each [[commit]].
  *
  * Failure contract: a failed combined collect calls every family's
  * [[abort]] (await in-flight pre-guard appends, drop the partial next
  * version) and rethrows — no family commits, every store stays on its
  * complete live snapshot, and the stream's retry re-runs the batch
  * under the per-family ledgers exactly as before. A failed commit
  * cleans up inside its own closure (each store's existing contract).
  */
private[graft] final case class GuardedFold(
    legs: DataFrame,
    commit: Map[String, Row] => Unit,
    abort: () => Unit = () => ())

private[graft] object GuardedFold {

  /** The guard-leg column set every store normalizes to. */
  val LegCols: Seq[String] = Seq("t", "a", "b", "arr")

  /** Null bucket-list column for legs that only carry scalars. */
  def noArr: org.apache.spark.sql.Column = lit(null).cast("array<int>").as("arr")

  /** One store folding alone: collect its own legs, then commit —
    * exactly the pre-r14 single-family applyDelta behavior. */
  def runStandalone(prepared: Option[GuardedFold]): Unit =
    prepared.foreach { g =>
      val meta =
        try g.legs.collect().map(r => r.getString(0) -> r).toMap
        catch { case e: Throwable => g.abort(); throw e }
      g.commit(meta)
    }

  /** The daemon path: union every family's legs under a
    * `family/`-prefixed tag, collect ONCE, hand each family its rows
    * back (tag prefix stripped). Returns per-family row maps in input
    * order; commits stay with the caller so it can fan them out. */
  def collectAll(folds: Seq[(String, GuardedFold)]): Seq[(GuardedFold, Map[String, Row])] = {
    if (folds.isEmpty) return Seq.empty
    val combined = folds.map { case (fam, g) =>
      g.legs.select(concat(lit(fam + "/"), col("t")).as("t"),
        col("a"), col("b"), col("arr"))
    }.reduce(_.unionByName(_))
    val rows =
      try combined.collect()
      catch { case e: Throwable =>
        folds.foreach { case (_, g) =>
          try g.abort() catch { case _: Throwable => () }
        }
        throw e
      }
    val byFam = rows.groupBy(_.getString(0).split("/", 2)(0))
    folds.map { case (fam, g) =>
      g -> byFam.getOrElse(fam, Array.empty[Row])
        .map(r => r.getString(0).split("/", 2)(1) -> r).toMap
    }
  }
}
