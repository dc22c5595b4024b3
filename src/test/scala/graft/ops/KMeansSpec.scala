package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Distributed Lloyd k-means: hand-geometry convergence, the
  * partitioning-invariance contract (decimal-sum means), native ==
  * HOF assignment kernel, tie-breaks, and empty-cluster carry. */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("two obvious blobs converge to their means; assignment splits them") {
    // blob A around (0,0), blob B around (10,10); k=2, one iteration
    // already lands each centroid on its blob's exact decimal mean
    val df = vecs(
      (1L, Seq(0f, 0f)), (2L, Seq(1f, 0f)), (3L, Seq(0f, 1f)),
      (4L, Seq(10f, 10f)), (5L, Seq(11f, 10f)), (6L, Seq(10f, 11f)))
    val m = KMeans.fit(df, k = 2, iters = 3, dim = 2)
    val cents = m.centroids.map(_.toList).sortBy(_.head).toList
    assert(cents == List(List(1.0 / 3, 1.0 / 3), List(31.0 / 3, 31.0 / 3)))
    val asg = KMeans.assign(df, m).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(Set(asg(1L), asg(2L), asg(3L)).size == 1)
    assert(Set(asg(4L), asg(5L), asg(6L)).size == 1)
    assert(asg(1L) != asg(4L))
  }

  test("fit is partitioning-invariant: 1 partition == many, bit-identical") {
    val emb = graft.model.Tables.embeddings(spark, sfDir)
    val one = KMeans.fit(emb.coalesce(1), k = 4, iters = 2, dim = 64)
    val many = KMeans.fit(emb.repartition(13), k = 4, iters = 2, dim = 64)
    assert(one.centroids.map(_.toList).toList ==
      many.centroids.map(_.toList).toList,
      "decimal-sum means must not depend on aggregation order")
  }

  test("native CentroidAssign == interpreted HOF reference, codegen on and off") {
    val emb = graft.model.Tables.embeddings(spark, sfDir).limit(50)
    val m = KMeans.init(emb, k = 3)
    for (cg <- Seq("true", "false")) {
      spark.conf.set("spark.sql.codegen.wholeStage", cg)
      try {
        val native = emb.select(col("vec_id"),
            graft.functions.CentroidAssign(col("embedding"), m.centroids).as("a"))
          .orderBy("vec_id").collect()
          .map(r => (r.getLong(0), r.getStruct(1).getInt(0), r.getStruct(1).getDouble(1)))
        val hof = emb.select(col("vec_id"),
            KMeans.assignHof(col("embedding"), m.centroids).as("a"))
          .orderBy("vec_id").collect()
          .map(r => (r.getLong(0), r.getStruct(1).getInt(0), r.getStruct(1).getDouble(1)))
        assert(native.toList == hof.toList, s"mode $cg")
      } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }

  test("exact distance tie assigns to the lowest cluster index") {
    // vector equidistant from both centroids (symmetric geometry →
    // bit-equal distances): must land in cluster 0 on both kernels
    val cents = Array(Array(1.0, 0.0), Array(-1.0, 0.0))
    val df = vecs((1L, Seq(0f, 5f)))
    val native = df.select(
        graft.functions.CentroidAssign(col("embedding"), cents).as("a"))
      .head().getStruct(0)
    assert(native.getInt(0) == 0)
    val hof = df.select(KMeans.assignHof(col("embedding"), cents).as("a"))
      .head().getStruct(0)
    assert(hof.getInt(0) == 0)
  }

  test("empty cluster keeps its previous centroid") {
    // md5('1') < md5('2') < md5('3'), so init = vectors of ids 1, 2 —
    // both (2,0). Every row then ties to cluster 0 (lowest index wins,
    // including (0,0): equidistant from two equal centroids), cluster
    // 1 goes EMPTY and must keep (2,0) verbatim while cluster 0 moves
    // to the 3-row mean
    val df = vecs((1L, Seq(2f, 0f)), (2L, Seq(2f, 0f)), (3L, Seq(0f, 0f)))
    val init = KMeans.init(df, k = 2)
    assert(init.centroids.map(_.toList).toList ==
      List(List(2.0, 0.0), List(2.0, 0.0)))
    val m = KMeans.fit(df, k = 2, iters = 1, dim = 2)
    assert(m.centroids(1).toList == List(2.0, 0.0), "empty cluster must carry")
    assert(m.centroids(0).toList != List(2.0, 0.0), "cluster 0 must absorb the rows")
  }

  test("malformed vector (dim mismatch) yields null assignment, not a wrong cluster") {
    val cents = Array(Array(0.0, 0.0))
    val df = vecs((1L, Seq(1f, 2f, 3f)))
    val r = df.select(
        graft.functions.CentroidAssign(col("embedding"), cents).as("a"))
      .head()
    assert(r.isNullAt(0))
  }

  test("card: sizes sum to corpus, purity in (0,1], clusters ordered") {
    val emb = graft.model.Tables.embeddings(spark, sfDir)
    val card = KMeans.card(emb, k = 4, iters = 2, dim = 64).orderBy("cluster")
    val rows = card.collect()
    assert(rows.map(_.getLong(1)).sum == emb.count())
    rows.foreach { r =>
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0)
      assert(r.getDouble(2) >= 0.0) // inertia
    }
  }
}
