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
        meta => got("fam1") = meta.map { case (k, rs) =>
          k -> ((rs.head.getLong(1), rs.head.getLong(2))) }),
      "fam2" -> GuardedFold(legsOf(Seq(("stats", 7L, 7L))),
        meta => got("fam2") = meta.map { case (k, rs) =>
          k -> ((rs.head.getLong(1), rs.head.getLong(2))) }))
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
    assert(GuardedFold.one(collected(1)._2, "stats").getLong(1) == 3L)
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

  test("a store-local tag containing '/' is refused, aborting the fold") {
    // family dispatch prefixes `fam + "/"` and splits on the FIRST "/"
    // — a slashed store tag would silently land under the wrong local
    // key; the invariant is enforced at every collect (VERDICT r14
    // task 6) and a violation takes the abort path like any guard
    // failure, so no appends leak
    val aborted = scala.collection.mutable.Set[String]()
    var committed = false
    val folds = Seq(
      "ok" -> GuardedFold(legsOf(Seq(("stats", 1L, 1L))),
        _ => committed = true, abort = () => aborted += "ok"),
      "bad" -> GuardedFold(legsOf(Seq(("st/ats", 2L, 2L))),
        _ => committed = true, abort = () => aborted += "bad"))
    val e = intercept[IllegalArgumentException] { GuardedFold.collectAll(folds) }
    assert(e.getMessage.contains("must not contain '/'"))
    assert(aborted == Set("ok", "bad"))
    assert(!committed)
    // standalone path enforces the same invariant
    intercept[IllegalArgumentException] {
      GuardedFold.runStandalone(Some(GuardedFold(
        legsOf(Seq(("a/b", 1L, 1L))), _ => ())))
    }
  }

  test("a FAMILY name containing '/' is refused, aborting every fold") {
    // a slashed family name would mis-dispatch SILENTLY (its rows group
    // under the first segment; the family reads an EMPTY meta map — a
    // quiet no-op fold for a clusters-shaped commit); the refusal runs
    // inside the abort-all path so pre-guard appends still settle
    val aborted = scala.collection.mutable.Set[String]()
    var committed = false
    val folds = Seq(
      "ok" -> GuardedFold(legsOf(Seq(("stats", 1L, 1L))),
        _ => committed = true, abort = () => aborted += "ok"),
      "sl/ashed" -> GuardedFold(legsOf(Seq(("stats", 2L, 2L))),
        _ => committed = true, abort = () => aborted += "bad"))
    val e = intercept[IllegalArgumentException] { GuardedFold.collectAll(folds) }
    assert(e.getMessage.contains("family name"))
    assert(aborted == Set("ok", "bad"))
    assert(!committed)
  }

  test("DUPLICATE family names are refused, aborting every fold (ADVICE r15)") {
    // two families under one name would each receive the UNION of both
    // families' rows from the dispatch groupBy — cross-feeding edge/
    // did/scalar legs into both commits (doubled overlap counts
    // tripping guards, foreign edges entering the union-find); refusal
    // must take the abort-all path so pre-guard appends settle
    val aborted = scala.collection.mutable.Set[String]()
    var committed = false
    val folds = Seq(
      "twin" -> GuardedFold(legsOf(Seq(("stats", 1L, 1L))),
        _ => committed = true, abort = () => aborted += "a"),
      "twin" -> GuardedFold(legsOf(Seq(("stats", 2L, 2L))),
        _ => committed = true, abort = () => aborted += "b"))
    val e = intercept[IllegalArgumentException] { GuardedFold.collectAll(folds) }
    assert(e.getMessage.contains("distinct"))
    assert(aborted == Set("a", "b"))
    assert(!committed)
  }

  test("a repeated tag dispatches ALL its rows to its family (r15: micro-graph legs)") {
    // the clusters family ships one "edge" row per micro-graph edge —
    // the dispatch must hand back every row under the tag, and other
    // families' single-row tags must be unaffected by the multiplicity
    var edges: Seq[(Long, Long)] = null
    var otherStats: (Long, Long) = null
    val folds = Seq(
      "clusters" -> GuardedFold(
        legsOf(Seq(("edge", 1L, 2L), ("edge", 2L, 3L), ("edge", 7L, 9L),
          ("new_keys", 4L, 0L))),
        meta => {
          edges = meta("edge").toSeq.map(r => (r.getLong(1), r.getLong(2)))
          assert(GuardedFold.one(meta, "new_keys").getLong(1) == 4L)
        }),
      "spans" -> GuardedFold(legsOf(Seq(("stats", 5L, 5L))),
        meta => otherStats =
          (GuardedFold.one(meta, "stats").getLong(1),
            GuardedFold.one(meta, "stats").getLong(2))))
    GuardedFold.collectAll(folds).zip(folds).foreach {
      case ((g, meta), _) => g.commit(meta)
    }
    assert(edges.toSet == Set((1L, 2L), (2L, 3L), (7L, 9L)))
    assert(otherStats == ((5L, 5L)))
  }

  test("runStandalone: Some collects and commits; None is a no-op") {
    var meta: Map[String, Array[org.apache.spark.sql.Row]] = null
    GuardedFold.runStandalone(Some(GuardedFold(
      legsOf(Seq(("stats", 5L, 5L))), m => meta = m)))
    assert(GuardedFold.one(meta, "stats").getLong(1) == 5L)
    GuardedFold.runStandalone(None) // replayed batch: must not throw
  }
}
