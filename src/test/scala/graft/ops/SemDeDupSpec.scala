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
}
