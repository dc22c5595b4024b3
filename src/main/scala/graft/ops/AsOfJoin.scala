package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable as-of (nearest-prior) join: for every left row, attach the
  * payload of the latest right row with the same key and
  * `right.ts <= left.ts` — the "join each event to the most recent
  * snapshot/state at that moment" primitive training pipelines use to
  * align events with slowly-changing context.
  *
  * Plan shape: both sides are tagged and unioned, then ONE window pass
  * partitioned by key and ordered by (ts, side) carries the latest
  * right payload forward into each left row (`last(_, ignoreNulls)`
  * over an unbounded-preceding rows frame). One shuffle on the key +
  * one sort per partition — the naive alternative (inequality range
  * join then max-per-left dedup) materializes O(|left|·|right|) rows
  * per key before pruning, the same quadratic blowup the near-dup
  * operators refuse. Spark has no native as-of operator, so this is
  * the compose-existing-ops path (brief preference (a)); the union is
  * by name, so neither side is scanned twice.
  *
  * Determinism: right rows sort before left rows at equal ts (side 0 <
  * side 1), giving inclusive `>=` semantics; equal-(key, ts) right
  * duplicates are additionally ordered by payload so the carried value
  * is the max payload, not a partition-order accident.
  *
  * NULL timestamps follow SQL ASOF semantics: a NULL never satisfies
  * the inequality, so right rows with NULL ts are dropped before the
  * union (ADVICE r4 — unfiltered they would sort nulls-first and be
  * carried into every left row with no real match) and left rows with
  * NULL ts get a NULL payload (they also sort first, ahead of every
  * surviving right row, so the carry-forward finds nothing).
  */
object AsOfJoin {

  /** @param payload a `struct(...)` of right-side columns to attach;
    *   its fields are appended to the left schema (null when no right
    *   row is at or before the left row's ts). */
  def apply(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, payload: Column): DataFrame = {
    val l = left.withColumn("__side", lit(1))
    val r = right.filter(col(tsCol).isNotNull)
      .select(keyCols.map(col) :+ col(tsCol) :+ payload.as("__p"): _*)
      .withColumn("__side", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc, col("__p").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("__match", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .selectExpr(left.columns :+ "__match.*": _*)
  }
}
