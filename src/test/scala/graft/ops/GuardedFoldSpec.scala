package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Direct coverage for the guard-collect fusion seam (r14, VERDICT r13
  * task 4): the store specs prove each family's fold end-to-end and the
  * soak proves the daemon composition, but the union/dispatch/abort
  * mechanics of [[GuardedFold]] deserve their own contract tests —
  * a dispatch bug here would hand one family another family's guard
  * rows, which the require() guards would only catch by accident.
  */
class GuardedFoldSpec extends SparkSpec {
  import spark.implicits._

  private def legsOf(rows: Seq[(String, Long, Long)]) =
    rows.toDF("t", "a", "b").select(col("t"), col("a"), col("b"),
      GuardedFold.noArr)

  test("collectAll dispatches each family's rows back under bare tags") {
    val got = scala.collection.mutable.Map[String, Map[String, (Long, Long)]]()
    val folds = Seq(
      "fam1" -> GuardedFold(legsOf(Seq(("stats", 1L, 2L), ("overlap", 0L, 0L))),
        meta => got("fam1") = meta.map { case (k, r) =>
          k -> (r.getLong(1), r.getLong(2)) }),
      "fam2" -> GuardedFold(legsOf(Seq(("stats", 7L, 7L))),
        meta => got("fam2") = meta.map { case (k, r) =>
          k -> (r.getLong(1), r.getLong(2)) }))
    val collected = GuardedFold.collectAll(folds)
    assert(collected.size == 2)
    // commits stay with the caller — run them as the daemon would
    folds.zip(collected).foreach { case ((_, _), (g, meta)) => g.commit(meta) }
    assert(got("fam1") == Map("stats" -> ((1L, 2L)), "overlap" -> ((0L, 0L))))
    assert(got("fam2") == Map("stats" -> ((7L, 7L))))
  }

  test("collectAll keeps input order and tolerates a family with no rows") {
    // a legs frame can legitimately produce zero rows only if a store
    // built it that way — the dispatch must hand that family an empty
    // map, not another family's rows
    val folds = Seq(
      "empty" -> GuardedFold(legsOf(Seq(("stats", 1L, 1L))).filter(lit(false)),
        _ => ()),
      "full" -> GuardedFold(legsOf(Seq(("stats", 3L, 3L))), _ => ()))
    val collected = GuardedFold.collectAll(folds)
    assert(collected.head._2.isEmpty)
    assert(collected(1)._2.keySet == Set("stats"))
    assert(collected(1)._2("stats").getLong(1) == 3L)
  }

  test("a failed combined collect aborts EVERY family and rethrows") {
    val aborted = scala.collection.mutable.Set[String]()
    var committed = false
    val boom = legsOf(Seq(("stats", 1L, 1L)))
      .select(col("t"), col("a"), col("b"), col("arr"))
      .withColumn("a", raise_error(lit("guard leg failed")).cast("long"))
    val folds = Seq(
      "ok" -> GuardedFold(legsOf(Seq(("stats", 1L, 1L))),
        _ => committed = true, abort = () => aborted += "ok"),
      "bad" -> GuardedFold(boom, _ => committed = true,
        abort = () => aborted += "bad"))
    intercept[Exception] { GuardedFold.collectAll(folds) }
    assert(aborted == Set("ok", "bad"),
      "every family's abort must run so in-flight pre-guard appends are " +
        "awaited and partial next versions dropped")
    assert(!committed, "no family may commit after a failed collect")
  }

  test("runStandalone: Some collects and commits; None is a no-op") {
    var meta: Map[String, org.apache.spark.sql.Row] = null
    GuardedFold.runStandalone(Some(GuardedFold(
      legsOf(Seq(("stats", 5L, 5L))), m => meta = m)))
    assert(meta("stats").getLong(1) == 5L)
    GuardedFold.runStandalone(None) // replayed batch: must not throw
  }
}
