package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Semantic deduplication over an embedding column (SemDeDup, Abbas et
  * al. 2023, arXiv:2303.09540): partition the embedding space into
  * cells, compare pairs only WITHIN a cell, and drop every vector that
  * has a higher-priority near-duplicate (cosine ≥ θ) in its cell —
  * semantically-redundant documents (paraphrases, templated rewrites)
  * that no lexical dedup catches.
  *
  * Cells here are nearest-anchor regions where the anchors are the k
  * deterministically-drawn corpus vectors (lowest (md5(id), id) rank —
  * the IvfIndex seed idiom), NOT k-means iterates: the assignment is
  * then a pure per-row expression over a broadcast literal — engine-
  * independent and DuckDB-oracle-able end to end, which a trained
  * centroid table would forfeit (and SemDeDup's quality is insensitive
  * to centroid optimality; the cell only scopes the pair search).
  *
  * Scale shape:
  *  - k AUTO-SIZES with the corpus (r12, the embedNearDup lesson —
  *    "LSH bucket width is a function of corpus size, never a
  *    constant"): k = max(8, ⌈n / targetCellSize⌉) holds the EXPECTED
  *    cell size constant, so the within-cell pair stage stays
  *    O(n · targetCellSize) as the corpus grows instead of the
  *    O(n²/k) a fixed k degrades to. Pass `k` explicitly to pin it;
  *  - anchor draw: TakeOrderedAndProject (per-partition top-k, driver
  *    merge) — k vectors of driver metadata, no shuffle;
  *  - assignment: one `transform` over the literal anchor array per
  *    row — no shuffle, no join, and the expression tree is O(1) in k
  *    (an auto-sized k in the hundreds would otherwise explode a
  *    per-anchor-literal-column plan);
  *  - pair search: one shuffle on the cell id; `maxCellSize` hard-caps
  *    the quadratic term: oversize cells (embedding-space boilerplate,
  *    possible under any k when mass concentrates) are reported
  *    un-deduped rather than allowed to quadratically dominate.
  *  - keep rule: v is dropped iff SOME lower-id cell-mate has
  *    cosine(u, v) ≥ θ — an EXISTS (left-semi) against the pair
  *    stream, never a materialized pair list per vector.
  */
object SemDeDup {

  /** Per-vector verdict frame: (idCol, cell, kept). `k <= 0` (the
    * default) auto-sizes k from the corpus count; an explicit k pins
    * the cell count (the oracle-replay posture). */
  def semDedup(corpus: DataFrame, k: Int = 0, theta: Double = 0.95,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxCellSize: Int = 100000, targetCellSize: Int = 250): DataFrame = {
    val kEff =
      if (k > 0) k
      else math.max(8L,
        (corpus.count() + targetCellSize - 1) / targetCellSize).toInt

    // deterministic anchor draw (see object doc); anums are 1-based in
    // draw order so the oracle's row_number reproduces them
    val anchors: Seq[(Int, Seq[Float])] = corpus
      .select(col(idCol), col(vecCol))
      .orderBy(md5(col(idCol).cast("string")).asc, col(idCol).asc)
      .limit(kEff)
      .collect().zipWithIndex
      .map { case (r, i) => (i + 1, r.getSeq[Float](1)) }.toSeq
    require(anchors.nonEmpty, "empty corpus")

    // argmax-cosine cell as one per-row HOF over the literal anchor
    // array: max over struct(cos, -anum) picks highest cosine, ties to
    // the LOWEST anchor number (mirrored by the oracle's ORDER BY c
    // DESC, anum). Identical doubles to a per-anchor column expansion
    // — same dot-product fold, same divide — with a plan that stays
    // O(1) as k grows (spec-gated against the expanded form).
    val anchorsLit = typedLit(anchors)
    val scoredArr = transform(anchorsLit, a =>
      struct(
        Similarity.cosine(col(vecCol), a.getField("_2")).as("c"),
        (-a.getField("_1")).as("na")))
    val cellCol = -array_max(scoredArr).getField("na")

    val assigned = Persists.cacheFor(
      corpus.select(col(idCol), col(vecCol),
        Similarity.l2norm(col(vecCol)).as("__nrm"),
        cellCol.as("cell")), 3)

    // oversize cells opt out of the quadratic stage (kept as-is)
    val cellOk = assigned.groupBy("cell").count()
      .filter(col("count") <= maxCellSize).select("cell")
    val inPlay = assigned.join(broadcast(cellOk), Seq("cell"))

    val a = inPlay.select(col("cell"), col(idCol).as("__aid"),
      col(vecCol).as("__av"), col("__nrm").as("__an"))
    val b = inPlay.select(col("cell"), col(idCol).as("__bid"),
      col(vecCol).as("__bv"), col("__nrm").as("__bn"))
    val dropped = a.join(b, Seq("cell"))
      .filter(col("__aid") < col("__bid"))
      .filter(Similarity.dot(col("__av"), col("__bv"))
        / (col("__an") * col("__bn")) >= theta)
      .select(col("__bid").as(idCol)).distinct()

    assigned
      .join(dropped.withColumn("__drop", lit(true)), Seq(idCol), "left")
      .select(col(idCol), col("cell"), col("__drop").isNull.as("kept"))
  }
}
