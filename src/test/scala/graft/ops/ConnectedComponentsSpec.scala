package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Correctness of distributed min-label connected components:
  * transitivity through chains, multi-key star merging, singleton
  * preservation, and the non-convergence guard. */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def components(edgePairs: Seq[(Long, Long)], n: Long): Map[Long, Long] = {
    val nodes = (0L until n).toDF("id")
    val edges = edgePairs.toDF("src", "dst")
    ConnectedComponents.run(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain: transitive closure collapses to the min id") {
    // 0-1-2-3-4-5 path (diameter 5 — multiple propagation rounds)
    val comp = components(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)), 8L)
    assert((0L to 5L).forall(comp(_) == 0L))
    assert(comp(6L) == 6L && comp(7L) == 7L) // singletons keep own label
  }

  test("deep chain converges well under maxIter (frontier mode must not linearize)") {
    // 120-node path, diameter 119: frontier rounds advance one hop per
    // round, so an unguarded frontier tail would need ~119 rounds and
    // throw at maxIter=50. The halving guard falls back to full
    // jumping rounds (O(log diameter)) when the frontier stops
    // shrinking — this converges AND stays well under the limit.
    val n = 120
    val comp = components((0 until n - 1).map(i => (i.toLong, i + 1L)), n.toLong)
    assert((0 until n).forall(i => comp(i.toLong) == 0L))
    assert(ConnectedComponents.lastRounds < 30,
      s"expected O(log diameter) rounds, took ${ConnectedComponents.lastRounds}")
  }

  test("frontier mode deterministically engages on a small shrinking tail") {
    // edges (1,2),(1,3),(3,4),(4,5) with checkEvery=1: hub-min init
    // leaves 4→3, 5→4; the first full round (neighbor-min + jump)
    // fixes both (changed=2), and the confirmation round runs in
    // frontier mode (2 ≤ MaxValue/2). Guards the guard: a policy
    // regression that silently stops frontier mode from engaging
    // (e.g. seeding the halving check from the loop-entry sentinel)
    // is invisible to pure correctness tests.
    val nodes = (1L to 5L).toDF("id")
    val edges = Seq((1L, 2L), (1L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val comp = ConnectedComponents.run(nodes, edges, checkEvery = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 5L).forall(comp(_) == 1L))
    assert(ConnectedComponents.lastFrontierRounds >= 1,
      s"frontier mode never engaged (rounds=${ConnectedComponents.lastRounds})")
  }

  test("two stars merged by a bridge") {
    // star A: 1<-{2,3}, star B: 4<-{5,6}; bridge 3-6 merges all into 1
    val comp = components(Seq((1L, 2L), (1L, 3L), (4L, 5L), (4L, 6L), (3L, 6L)), 7L)
    assert((1L to 6L).forall(comp(_) == 1L))
    assert(comp(0L) == 0L)
  }

  test("edge direction and duplicates are irrelevant") {
    val a = components(Seq((2L, 1L), (1L, 2L), (2L, 1L)), 3L)
    assert(a(1L) == 1L && a(2L) == 1L && a(0L) == 0L)
  }

  test("keyEdges builds per-key stars and CC merges across keys") {
    // k1 groups {0,1} and {2,3}; k2 groups {1,2} → all one component
    val df = Seq(
      (0L, "a", "x"), (1L, "a", "y"), (2L, "b", "y"), (3L, "b", "z"))
      .toDF("doc_id", "k1", "k2")
    val edges = ConnectedComponents.keyEdges(df, "doc_id", Seq("k1", "k2"))
    // star shape: |group|-1 edges per group, hub = min id
    val es = edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(es == Set((0L, 1L), (2L, 3L), (1L, 2L)))
    val comp = ConnectedComponents.run(df.select(col("doc_id").as("id")), edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 3L).forall(comp(_) == 0L))
  }

  test("returned plan is lineage-truncated (flat), not 2^rounds deep") {
    // a 10-hop chain needs ~10 propagation rounds; without per-round
    // flattening the logical plan would be ~2^10 nodes and this count
    // explodes (the sf0.1 driver-OOM regression)
    val nodes = (0L until 12L).toDF("id")
    val edges = (0L until 11L).map(i => (i, i + 1)).toDF("src", "dst")
    val out = ConnectedComponents.run(nodes, edges)
    var n = 0
    out.queryExecution.analyzed.foreach(_ => n += 1)
    assert(n <= 5, s"expected a flat LogicalRDD-rooted plan, got $n nodes")
    assert(out.collect().forall(_.getLong(1) == 0L))
  }

  test("non-convergence throws instead of returning a wrong fixpoint") {
    val nodes = (0L until 6L).toDF("id")
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val e = intercept[IllegalArgumentException] {
      ConnectedComponents.run(nodes, edges, maxIter = 2)
    }
    assert(e.getMessage.contains("converge"))
  }

  test("q_dedup_clusters: every cluster is keyed by its min member and sizes add up") {
    val out = graft.ExtQueries.dedupClusters(spark, sfDir)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byComp = rows.groupBy(_._2)
    byComp.foreach { case (comp, members) =>
      assert(members.map(_._1).min == comp) // canonical id = min doc_id
      assert(members.forall(_._3 == members.size)) // cluster_size consistent
    }
    assert(rows.length == rows.map(_._1).distinct.length) // one row per doc
  }
}
