package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SemDeDupSpec extends SparkSpec {

  private def frame(rows: Seq[(Long, Seq[Float])]) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  // orthogonal basis + copies: ids 1..3 distinct directions, 11/12
  // duplicate id 1's direction (scaled — cosine is scale-invariant)
  private val base = Seq(
    1L -> Seq(1f, 0f, 0f, 0f),
    2L -> Seq(0f, 1f, 0f, 0f),
    3L -> Seq(0f, 0f, 1f, 0f),
    11L -> Seq(2f, 0f, 0f, 0f),
    12L -> Seq(0.5f, 0f, 0f, 0f))

  test("exact semantic duplicates drop; the lowest cell-mate id survives") {
    val r = SemDeDup.semDedup(frame(base), k = 2, theta = 0.99)
      .collect().map(x => x.getLong(0) -> x.getBoolean(2)).toMap
    assert(r(1L), "first copy survives")
    assert(!r(11L) && !r(12L), "later copies drop")
    assert(r(2L) && r(3L), "orthogonal vectors untouched")
  }

  test("theta gates the drop: below-threshold neighbors survive") {
    val near = Seq(
      1L -> Seq(1f, 0f, 0f, 0f),
      2L -> Seq(1f, 0.5f, 0f, 0f)) // cosine ≈ 0.894
    val strict = SemDeDup.semDedup(frame(near), k = 1, theta = 0.95)
      .collect().map(x => x.getLong(0) -> x.getBoolean(2)).toMap
    assert(strict(1L) && strict(2L))
    val loose = SemDeDup.semDedup(frame(near), k = 1, theta = 0.85)
      .collect().map(x => x.getLong(0) -> x.getBoolean(2)).toMap
    assert(loose(1L) && !loose(2L))
  }

  test("oversize cells opt out of the pair stage (reported un-deduped)") {
    val r = SemDeDup.semDedup(frame(base), k = 1, theta = 0.99, maxCellSize = 2)
      .collect().map(x => x.getLong(0) -> x.getBoolean(2)).toMap
    // every vector lands in the single cell (size 5 > 2): all kept
    assert(r.values.forall(identity))
  }

  test("cell count bounded by k and every vector is assigned exactly once") {
    val out = SemDeDup.semDedup(frame(base), k = 3, theta = 0.99)
    assert(out.count() == base.size)
    val cells = out.select("cell").distinct().collect().map(_.getInt(0)).toSet
    assert(cells.forall(c => c >= 1 && c <= 3))
  }

  test("auto-k contract: k grows with the corpus, floors at 8") {
    // 40 vectors / targetCellSize 5 → k = 8 (exactly the floor);
    // targetCellSize 4 → k = 10 — cells auto-size so the expected
    // cell population stays ~targetCellSize as the corpus grows
    val many = (1L to 40L).map(i =>
      i -> Seq((i % 7).toFloat + 1f, (i % 5).toFloat, (i % 3).toFloat, 1f))
    val k8 = SemDeDup.semDedup(frame(many), theta = 0.999, targetCellSize = 5)
      .select(max("cell")).head().getInt(0)
    assert(k8 <= 8 && k8 >= 1)
    val k10 = SemDeDup.semDedup(frame(many), theta = 0.999, targetCellSize = 4)
      .select(max("cell")).head().getInt(0)
    assert(k10 <= 10 && k10 > 8, s"expected a cell id in (8, 10], got $k10")
  }

  test("auto-k equals an explicitly pinned k of the same size (one path)") {
    // the fixture scales resolve auto-k to the floor — the oracle's
    // LIMIT 8 draw — so q_semdedup stays byte-identical after r12
    val auto = SemDeDup.semDedup(frame(base), theta = 0.9)
      .orderBy("vec_id").collect().toSeq
    val pinned = SemDeDup.semDedup(frame(base), k = 8, theta = 0.9)
      .orderBy("vec_id").collect().toSeq
    assert(auto == pinned)
  }
}
