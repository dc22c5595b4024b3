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

  test("prepareFold legs through an EXTERNAL combined collect fold identically (fused dispatch)") {
    // the daemon deliberately keeps the clusters round-trip on its own
    // overlapped future (BENCH_DAEMONFLOOR_r15: fusing it is a measured
    // regression), but the fused path is KEPT for a future cheap-legs
    // store — this pins that GuardedFold.collectAll's multi-row
    // dispatch (one "edge"/"did" row each, scalars, the ridden limit)
    // commits the same labels as the standalone fold
    val path = java.nio.file.Files.createTempDirectory("graft-inc-cc-fused").toString
    IncrementalClusters.writeState(corpusKeyed, "doc_id", Seq("k1", "k2"), path, NB)
    val g = graft.streaming.ContinuousDedup.prepareClustersFold(
      deltaKeyed, path, identity, nBuckets = NB, foldId = Some("fuse1"))
    assert(g.isDefined)
    GuardedFold.collectAll(Seq("clusters" -> g.get)).foreach {
      case (gf, meta) => gf.commit(meta)
    }
    assert(IncrementalClusters.lastMicroCcOnDriver,
      "a delta-bounded micro graph must take the driver union-find path")
    assert(storeLabels(path) == batchLabels(corpusKeyed.unionByName(deltaKeyed)))
    // the ledger committed with the flip: a standalone replay no-ops
    IncrementalClusters.applyDelta(spark, path, deltaKeyed, "doc_id",
      Seq("k1", "k2"), NB, foldId = Some("fuse1"))
    assert(storeLabels(path) == batchLabels(corpusKeyed.unionByName(deltaKeyed)))
  }

  test("untouched buckets carry over as hard links (same inode, zero copy); emptied buckets vanish") {
    val path = java.nio.file.Files.createTempDirectory("graft-inc-cc-mtime").toString
    IncrementalClusters.writeState(corpusKeyed, "doc_id", Seq("k1", "k2"), path, NB)
    def files(dir: String): Map[String, java.io.File] = {
      val root = new java.io.File(dir)
      org.apache.commons.io.FileUtils.listFiles(root, null, true)
        .toArray.map(_.asInstanceOf[java.io.File])
        .filter(f => f.getName.endsWith(".parquet"))
        .map(f => f.getAbsolutePath.stripPrefix(root.getAbsolutePath) -> f).toMap
    }
    val v1 = IncrementalClusters.currentLabelsDir(path)
    val before = files(v1)
    // component 14 (bucket 6) is untouched by the delta
    val untouchedBefore = before.filter(_._1.contains("cbucket=6"))
    assert(untouchedBefore.nonEmpty, "fixture must place component 14 in bucket 6")

    IncrementalClusters.applyDelta(spark, path, deltaKeyed, "doc_id", Seq("k1", "k2"), NB)
    val v2 = IncrementalClusters.currentLabelsDir(path)
    assert(v2 != v1, "fold must produce a NEW snapshot version")
    val after = files(v2)
    // untouched bucket files in the new snapshot are the SAME inodes as
    // the old snapshot's (hard links): byte-identical, mtime-identical,
    // no data copied — the O(touched) rewrite claim at the file level
    untouchedBefore.foreach { case (rel, f) =>
      val now = after.get(rel)
      assert(now.isDefined, s"untouched bucket file missing from new snapshot: $rel")
      assert(java.nio.file.Files.isSameFile(f.toPath, now.get.toPath),
        s"untouched bucket file copied/rewritten instead of linked: $rel")
    }
    // the rewrite touched a strict subset of buckets (the O(touched) claim)
    assert(IncrementalClusters.lastTouchedBuckets > 0 &&
      IncrementalClusters.lastTouchedBuckets < NB)
    // component 13's old home (bucket 5) emptied when it merged into
    // component 1 (bucket 1): stale labels must not survive there
    assert(!new java.io.File(s"$v2/cbucket=5").exists(),
      "emptied bucket directory must not appear in the new snapshot")
  }

  test("crash-consistent swap: pinned readers keep the old snapshot; a crashed fold's leftovers recover") {
    val path = java.nio.file.Files.createTempDirectory("graft-inc-cc-crash").toString
    IncrementalClusters.writeState(corpusKeyed, "doc_id", Seq("k1", "k2"), path, NB)
    val beforeFold = storeLabels(path)
    // a reader that resolved the pointer BEFORE the fold: its plan is
    // pinned to the old snapshot directory
    val pinned = IncrementalClusters.readLabels(spark, path)
    // simulate a PREVIOUS fold that crashed after staging: a partial
    // next-version directory with garbage where the fold will build
    val v1 = new java.io.File(IncrementalClusters.currentLabelsDir(path))
    val partial = new java.io.File(v1.getParent, s"v${v1.getName.drop(1).toLong + 1}")
    java.nio.file.Files.createDirectories(new java.io.File(partial, "cbucket=0").toPath)
    java.nio.file.Files.write(new java.io.File(partial, "cbucket=0/garbage.parquet").toPath,
      Array[Byte](1, 2, 3))
    // the crash never flipped the pointer, so readers still see v1
    assert(storeLabels(path) == beforeFold)
    // the next fold rebuilds the partial version from scratch and lands
    // exactly the batch-CC union
    IncrementalClusters.applyDelta(spark, path, deltaKeyed, "doc_id", Seq("k1", "k2"), NB)
    assert(storeLabels(path) == batchLabels(corpusKeyed.unionByName(deltaKeyed)))
    // the pinned pre-fold reader STILL reads the complete old snapshot
    // (one superseded version is retained for in-flight readers)
    assert(pinned.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == beforeFold)
  }

  test("distributed micro-CC path (driver limit 0) folds identically") {
    val path = java.nio.file.Files.createTempDirectory("graft-inc-cc-dist").toString
    IncrementalClusters.writeState(corpusKeyed, "doc_id", Seq("k1", "k2"), path, NB)
    IncrementalClusters.applyDelta(spark, path, deltaKeyed, "doc_id", Seq("k1", "k2"), NB,
      microCcDriverLimit = 0L)
    assert(!IncrementalClusters.lastMicroCcOnDriver)
    assert(storeLabels(path) == batchLabels(corpusKeyed.unionByName(deltaKeyed)))
  }

  test("key-index compaction bounds the file count across many folds; equivalence holds") {
    val path = java.nio.file.Files.createTempDirectory("graft-inc-cc-compact").toString
    IncrementalClusters.writeState(corpusKeyed, "doc_id", Seq("k1", "k2"), path, NB)
    def keyFiles(): Int = Option(
      new java.io.File(IncrementalClusters.currentKeysDir(path)).listFiles())
      .getOrElse(Array.empty).count(f => f.isFile && f.getName.endsWith(".parquet"))
    // each fold introduces a fresh key (Fi) and so appends to keys/;
    // with compactKeysAt=4 the snapshot compacts repeatedly instead of
    // accumulating one file per fold forever
    var all = corpusKeyed
    var maxFiles = 0
    (0 until 12).foreach { i =>
      val d = Seq((1000L + i, "A", s"F$i")).toDF("doc_id", "k1", "k2")
      IncrementalClusters.applyDelta(spark, path, d, "doc_id", Seq("k1", "k2"), NB,
        compactKeysAt = 4)
      all = all.unionByName(d)
      maxFiles = math.max(maxFiles, keyFiles())
    }
    assert(maxFiles <= 4 + 2,
      s"keys snapshot accumulated $maxFiles files — compaction not engaging")
    assert(storeLabels(path) == batchLabels(all))
    // all 12 delta docs share k1="A": one cluster with the corpus "A"s
    val got = storeLabels(path)
    (0 until 12).foreach(i => assert(got(1000L + i) == 10L))
  }

  test("delta contract is enforced loudly: duplicate ids in a batch, ids already in the store") {
    val path = java.nio.file.Files.createTempDirectory("graft-inc-cc-guard").toString
    IncrementalClusters.writeState(corpusKeyed, "doc_id", Seq("k1", "k2"), path, NB)
    val dup = Seq((301L, "A", null.asInstanceOf[String]),
      (301L, "B", null.asInstanceOf[String])).toDF("doc_id", "k1", "k2")
    val e1 = intercept[IllegalArgumentException] {
      IncrementalClusters.applyDelta(spark, path, dup, "doc_id", Seq("k1", "k2"), NB)
    }
    assert(e1.getMessage.contains("duplicate ids"))
    // id 10 is already labeled in the corpus store
    val overlap = Seq((10L, "A", null.asInstanceOf[String])).toDF("doc_id", "k1", "k2")
    val e2 = intercept[IllegalArgumentException] {
      IncrementalClusters.applyDelta(spark, path, overlap, "doc_id", Seq("k1", "k2"), NB)
    }
    assert(e2.getMessage.contains("must be disjoint"))
    // neither failed attempt mutated the store
    assert(storeLabels(path) == batchLabels(corpusKeyed))
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

  test("a commit handed a meta missing its scalar tags fails LOUDLY, never as a no-op fold (ADVICE r16)") {
    // the driver-path scalar tags (overlap, new_keys) are groupBy().agg
    // legs — exactly one row when dispatch is correct — so a lost-legs
    // dispatch (empty or mis-routed meta) must throw, not pass
    // guard(0,0,0) and complete as a ledger-less silent no-op
    val path = java.nio.file.Files.createTempDirectory("graft-inc-cc-scalar").toString
    IncrementalClusters.writeState(corpusKeyed, "doc_id", Seq("k1", "k2"), path, NB)
    val v1 = IncrementalClusters.currentLabelsDir(path)
    val g = IncrementalClusters.prepareFold(spark, path, deltaKeyed, "doc_id",
      Seq("k1", "k2"), NB)
    val dispatched = GuardedFold.collectAll(Seq("clusters" -> g.get))
    dispatched.foreach { case (gf, meta) =>
      val e = intercept[IllegalArgumentException] { gf.commit(meta - "overlap") }
      assert(e.getMessage.contains("exactly one row"))
    }
    assert(IncrementalClusters.currentLabelsDir(path) == v1,
      "a refused commit must leave the pointer on the old snapshot")
  }

  test("a labels file lost BETWEEN collect and commit refuses the fold (ADVICE r16 tamper)") {
    // the prepare-time manifest check is stale by commit time; the
    // commit re-validates the listing it is about to enumerate — a lost
    // file (here in an UNTOUCHED bucket, where readExact on the touched
    // set would never look and the hard-link carry would silently drop
    // it) must refuse the fold with the pointer unmoved
    val path = java.nio.file.Files.createTempDirectory("graft-inc-cc-tamper").toString
    IncrementalClusters.writeState(corpusKeyed, "doc_id", Seq("k1", "k2"), path, NB)
    val g = IncrementalClusters.prepareFold(spark, path, deltaKeyed, "doc_id",
      Seq("k1", "k2"), NB)
    assert(g.isDefined)
    val dispatched = GuardedFold.collectAll(Seq("clusters" -> g.get))
    val v1 = IncrementalClusters.currentLabelsDir(path)
    // component 14 lives in cbucket=6, untouched by deltaKeyed
    val victims = Option(new java.io.File(s"$v1/cbucket=6").listFiles())
      .getOrElse(Array.empty).filter(_.getName.endsWith(".parquet"))
    assert(victims.nonEmpty, "fixture must place an untouched bucket file")
    assert(victims.head.delete())
    val e = intercept[IllegalArgumentException] {
      dispatched.foreach { case (gf, meta) => gf.commit(meta) }
    }
    assert(e.getMessage.contains("manifest"))
    assert(IncrementalClusters.currentLabelsDir(path) == v1,
      "a refused commit must leave the pointer on the old snapshot")
  }
}
