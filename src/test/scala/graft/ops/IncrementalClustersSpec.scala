package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental cluster maintenance (r9): persisted CC labels updated
  * from delta-involving edges in O(delta + touched clusters). The
  * load-bearing property is the equivalence contract — labels after
  * applyDelta == batch CC over corpus ∪ delta — because that is what
  * lets the DuckDB oracle hash-gate q_dedup_clusters_incremental with
  * the batch recursive-CTE fixpoint. The second property is the scale
  * claim itself: untouched bucket partitions are never rewritten. */
class IncrementalClustersSpec extends SparkSpec {
  import spark.implicits._

  private val NB = 8

  /** Corpus: clusters {10,18}("A"), {11,19}("B"), {12,20,28}("C"),
    * singletons 13("D"), 14("E") → components 10,11,12,13,14 living in
    * buckets 2,3,4,5,6 (mod 8). */
  private def corpusKeyed: DataFrame = Seq(
    (10L, "A", null.asInstanceOf[String]),
    (18L, "A", null.asInstanceOf[String]),
    (11L, "B", null.asInstanceOf[String]),
    (19L, "B", null.asInstanceOf[String]),
    (12L, "C", null.asInstanceOf[String]),
    (20L, "C", null.asInstanceOf[String]),
    (28L, "C", null.asInstanceOf[String]),
    (13L, "D", null.asInstanceOf[String]),
    (14L, "E", null.asInstanceOf[String])
  ).toDF("doc_id", "k1", "k2")

  /** Delta exercising every update shape: 101+106 bridge "A"+"B" via a
    * shared fresh k2 (merge two corpus components — key identity is
    * (kidx, k), so the bridge needs same-column matches), 102 joins "C"
    * (adopt), 103+104 share a fresh key (new cluster), 105 is
    * keyless-fresh (singleton), and 1 joins "D" with an id SMALLER than
    * the corpus min (the merged component's label — and bucket —
    * moves). */
  private def deltaKeyed: DataFrame = Seq(
    (101L, "A", "AB"),
    (106L, "B", "AB"),
    (102L, "C", null.asInstanceOf[String]),
    (103L, "Z", null.asInstanceOf[String]),
    (104L, "Z", null.asInstanceOf[String]),
    (105L, "Q", null.asInstanceOf[String]),
    (1L, "D", null.asInstanceOf[String])
  ).toDF("doc_id", "k1", "k2")

  private def batchLabels(keyed: DataFrame): Map[Long, Long] = {
    val edges = ConnectedComponents.keyEdges(keyed, "doc_id", Seq("k1", "k2"))
    ConnectedComponents.run(keyed.select(col("doc_id").as("id")), edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def storeLabels(path: String): Map[Long, Long] =
    IncrementalClusters.readLabels(spark, path)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("applyDelta == batch CC on corpus ∪ delta (merge, adopt, fresh cluster, singleton, moved min)") {
    val path = java.nio.file.Files.createTempDirectory("graft-inc-cc").toString
    IncrementalClusters.writeState(corpusKeyed, "doc_id", Seq("k1", "k2"), path, NB)
    // sanity: the offline state matches batch CC on the corpus alone
    assert(storeLabels(path) == batchLabels(corpusKeyed))

    IncrementalClusters.applyDelta(spark, path, deltaKeyed, "doc_id", Seq("k1", "k2"), NB)
    val got = storeLabels(path)
    val expected = batchLabels(corpusKeyed.unionByName(deltaKeyed))
    assert(got == expected,
      s"diff: ${(expected.toSet diff got.toSet) ++ (got.toSet diff expected.toSet)}")
    // the shapes the fixture promises, asserted explicitly
    assert(got(101L) == 10L && got(106L) == 10L)                   // bridge docs
    assert(got(11L) == 10L && got(19L) == 10L)                     // A+B merged
    assert(got(102L) == 12L)                                       // adopted C
    assert(got(104L) == 103L)                                      // fresh cluster
    assert(got(105L) == 105L)                                      // singleton
    assert(got(13L) == 1L && got(1L) == 1L)                        // min moved
  }

  test("untouched bucket partitions keep their files byte-for-byte; emptied buckets are deleted") {
    val path = java.nio.file.Files.createTempDirectory("graft-inc-cc-mtime").toString
    IncrementalClusters.writeState(corpusKeyed, "doc_id", Seq("k1", "k2"), path, NB)
    def files(): Map[String, (Long, Long)] = {
      val root = new java.io.File(s"$path/labels")
      org.apache.commons.io.FileUtils.listFiles(root, null, true)
        .toArray.map(_.asInstanceOf[java.io.File])
        .filter(f => f.getName.endsWith(".parquet"))
        .map(f => f.getAbsolutePath -> (f.lastModified(), f.length())).toMap
    }
    val before = files()
    // component 14 (bucket 6) is untouched by the delta
    val untouchedBefore = before.filter(_._1.contains("cbucket=6"))
    assert(untouchedBefore.nonEmpty, "fixture must place component 14 in bucket 6")

    IncrementalClusters.applyDelta(spark, path, deltaKeyed, "doc_id", Seq("k1", "k2"), NB)
    val after = files()
    untouchedBefore.foreach { case (f, sig) =>
      assert(after.get(f).contains(sig), s"untouched bucket file rewritten: $f")
    }
    // the rewrite touched a strict subset of buckets (the O(touched) claim)
    assert(IncrementalClusters.lastTouchedBuckets > 0 &&
      IncrementalClusters.lastTouchedBuckets < NB)
    // component 13's old home (bucket 5) emptied when it merged into
    // component 1 (bucket 1): stale labels must not survive there
    assert(!new java.io.File(s"$path/labels/cbucket=5").exists(),
      "emptied bucket directory must be deleted, not left stale")
  }

  test("delta batches compose: two sequential folds == batch CC over all three sets") {
    val path = java.nio.file.Files.createTempDirectory("graft-inc-cc-seq").toString
    IncrementalClusters.writeState(corpusKeyed, "doc_id", Seq("k1", "k2"), path, NB)
    IncrementalClusters.applyDelta(spark, path, deltaKeyed, "doc_id", Seq("k1", "k2"), NB)
    // batch 2 bridges corpus singleton "E" with batch-1's fresh "Z"
    // cluster: 201 reaches the corpus through k1="E", 202 reaches the
    // PRIOR delta through k1="Z" (exercising the appended key-index
    // rows), and 201~202 connect through a fresh shared k2="X". 203
    // additionally merges TWO delta-born components (batch-1's "Q"
    // singleton into the "Z"∪"X" cluster) — both endpoints resolved
    // through keys the index only knows from batch-1 appends.
    val delta2 = Seq((201L, "E", "X"), (202L, "Z", "X"), (203L, "Q", "X"))
      .toDF("doc_id", "k1", "k2")
    IncrementalClusters.applyDelta(spark, path, delta2, "doc_id", Seq("k1", "k2"), NB)
    val got = storeLabels(path)
    val expected = batchLabels(
      corpusKeyed.unionByName(deltaKeyed).unionByName(delta2))
    assert(got == expected)
    assert(got(201L) == 14L && got(202L) == 14L && got(203L) == 14L &&
      got(103L) == 14L && got(104L) == 14L && got(105L) == 14L)
  }

  test("carried columns survive the fold: old rows keep theirs, delta rows bring theirs") {
    val path = java.nio.file.Files.createTempDirectory("graft-inc-cc-carry").toString
    val q = (df: DataFrame) => df.withColumn("quality", col("doc_id") * 0.5)
    IncrementalClusters.writeState(q(corpusKeyed), "doc_id", Seq("k1", "k2"),
      path, NB, carryCols = Seq("quality"))
    IncrementalClusters.applyDelta(spark, path, q(deltaKeyed), "doc_id", Seq("k1", "k2"), NB)
    val got = IncrementalClusters.readLabels(spark, path)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val all = (corpusKeyed.collect() ++ deltaKeyed.collect()).map(_.getLong(0))
    assert(got.keySet == all.toSet)
    all.foreach(id => assert(got(id) == id * 0.5, s"doc $id lost its carried value"))
    // a delta missing the carried column must fail loudly, not write
    // rows with silently-null quality
    val ex = intercept[IllegalArgumentException] {
      IncrementalClusters.applyDelta(spark, path,
        Seq((300L, "A", null.asInstanceOf[String])).toDF("doc_id", "k1", "k2"),
        "doc_id", Seq("k1", "k2"), NB)
    }
    assert(ex.getMessage.contains("carries column"))
  }

  test("mismatched bucket-count probe fails loudly") {
    val path = java.nio.file.Files.createTempDirectory("graft-inc-cc-params").toString
    IncrementalClusters.writeState(corpusKeyed, "doc_id", Seq("k1", "k2"), path, NB)
    val ex = intercept[IllegalArgumentException] {
      IncrementalClusters.applyDelta(spark, path, deltaKeyed, "doc_id",
        Seq("k1", "k2"), nBuckets = 16)
    }
    assert(ex.getMessage.contains("built with"))
  }
}
