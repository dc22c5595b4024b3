package graft.ops

import graft.SparkSpec

/** Fold==rebuild contracts for incremental span maintenance on toy
  * corpora (the sf-scale gate is q_dup_spans_incremental, hash-oracled
  * against the batch span SQL). n=4 grams keep the examples small. */
class IncrementalSpansSpec extends SparkSpec {

  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("inc_spans_spec").toString

  private def spansSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

  private def batch(all: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long)] =
    spansSet(DupSpans.duplicateSpans(all, n = 4))

  test("a delta that duplicates a previously-unique corpus block updates that doc's spans") {
    val corpus = docs(
      (1L, "a b c d e k1 k2 k3"),          // unique in the corpus alone
      (2L, "p q r s t u v w"))
    val delta = docs((10L, "z9 a b c d e z8 z7")) // now doc 1's block is duplicated
    val root = tmp()
    IncrementalSpans.writeState(corpus, root, n = 4, nBuckets = 8)
    assert(spansSet(IncrementalSpans.readSpans(spark, root)).isEmpty)
    IncrementalSpans.applyDelta(spark, root, delta, n = 4, nBuckets = 8)
    val folded = spansSet(IncrementalSpans.readSpans(spark, root))
    assert(folded == batch(corpus.unionByName(delta)))
    assert(folded.map(_._1) == Set(1L, 10L)) // both sides of the new dup marked
  }

  test("sequential folds compose; untouched docs' rows are preserved") {
    val corpus = docs(
      (1L, "a b c d x1 x2 x3 x4"),
      (2L, "a b c d y1 y2 y3 y4"), // 1-2 share "a b c d" from the start
      (3L, "m n o p m2 n2 o2 p2"))
    val d1 = docs((10L, "q r s t a b c d"))
    val d2 = docs((11L, "m n o p w1 w2 w3 w4"), (12L, "q r s t h1 h2 h3 h4"))
    val root = tmp()
    IncrementalSpans.writeState(corpus, root, n = 4, nBuckets = 8)
    IncrementalSpans.applyDelta(spark, root, d1, n = 4, nBuckets = 8)
    IncrementalSpans.applyDelta(spark, root, d2, n = 4, nBuckets = 8)
    val folded = spansSet(IncrementalSpans.readSpans(spark, root))
    assert(folded == batch(corpus.unionByName(d1).unionByName(d2)))
    // d2 made doc 3's block and d1's "q r s t" duplicated
    assert(folded.map(_._1).intersect(Set(3L, 10L, 12L)) == Set(3L, 10L, 12L))
  }

  test("n_docs_max tracks the post-delta document frequency") {
    val corpus = docs((1L, "a b c d e1 e2 e3 e4"), (2L, "a b c d f1 f2 f3 f4"))
    val root = tmp()
    IncrementalSpans.writeState(corpus, root, n = 4, nBuckets = 8)
    assert(spansSet(IncrementalSpans.readSpans(spark, root))
      .forall(_._4 == 2L))
    IncrementalSpans.applyDelta(spark, root,
      docs((10L, "a b c d g1 g2 g3 g4")), n = 4, nBuckets = 8)
    val folded = spansSet(IncrementalSpans.readSpans(spark, root))
    assert(folded.nonEmpty && folded.forall(_._4 == 3L))
  }

  test("delta contract: duplicate or already-present ids fail before mutation") {
    val root = tmp()
    IncrementalSpans.writeState(docs((1L, "a b c d e f g h")), root, n = 4, nBuckets = 8)
    intercept[IllegalArgumentException] {
      IncrementalSpans.applyDelta(spark, root,
        docs((5L, "x y z w a b c d"), (5L, "k l m n o p q r")), n = 4, nBuckets = 8)
    }
    intercept[IllegalArgumentException] {
      IncrementalSpans.applyDelta(spark, root,
        docs((1L, "x y z w a b c d")), n = 4, nBuckets = 8)
    }
    assert(SnapshotRoot.currentVersion(root) == "v1") // nothing flipped
  }

  test("continuous folding keeps file counts bounded (compaction) and stays correct") {
    val corpus = docs((1L, "a b c d e1 e2 e3 e4"))
    val root = tmp()
    IncrementalSpans.writeState(corpus, root, n = 4, nBuckets = 4)
    var all = corpus
    (1 to 20).foreach { i =>
      val delta = docs((100L + i, s"a b c d x$i y$i z$i w$i"))
      IncrementalSpans.applyDelta(spark, root, delta, n = 4, nBuckets = 4)
      all = all.unionByName(delta)
    }
    assert(spansSet(IncrementalSpans.readSpans(spark, root)) == batch(all))
    // append-only stores must compact: no bucket dir may exceed the
    // threshold by more than one fold's worth of files
    val cur = SnapshotRoot.currentDir(root)
    for (table <- Seq("grams", "gramdf", "docs")) {
      val worst = Option(new java.io.File(s"$cur/$table").listFiles())
        .getOrElse(Array.empty).filter(_.isDirectory)
        .map(d => Option(d.listFiles()).getOrElse(Array.empty)
          .count(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith(".")))
        .maxOption.getOrElse(0)
      assert(worst <= 17, s"$table bucket grew to $worst files — compaction never fired")
    }
  }

  test("untouched bucket directories are hard-linked, not rewritten") {
    // doc ids far apart so delta touches few id buckets
    val corpus = docs((1L, "a b c d e1 e2 e3 e4"), (2L, "z1 z2 z3 z4 z5 z6 z7 z8"),
      (3L, "m1 m2 m3 m4 m5 m6 m7 m8"))
    val root = tmp()
    IncrementalSpans.writeState(corpus, root, n = 4, nBuckets = 8)
    IncrementalSpans.applyDelta(spark, root,
      docs((9L, "a b c d q1 q2 q3 q4")), n = 4, nBuckets = 8)
    // doc 2 (dbucket 2) was untouched: its docs-store file must be the
    // SAME inode in v1 and v2 (hard link), proving no rewrite happened
    def files(v: String, sub: String) =
      Option(new java.io.File(s"$root/$v/docs/$sub").listFiles())
        .getOrElse(Array.empty).filter(_.getName.endsWith(".parquet"))
    val before = files("v1", "dbucket=2"); val after = files("v2", "dbucket=2")
    assert(before.nonEmpty && after.nonEmpty)
    def inode(f: java.io.File) =
      java.nio.file.Files.getAttribute(f.toPath, "unix:ino")
    assert(before.map(inode).toSet == after.map(inode).toSet)
  }

  test("a spans file lost BETWEEN collect and commit refuses the fold (ADVICE r16 tamper)") {
    // same window as the clusters rewrite: the commit-time listing
    // feeding the touched-bucket rewrite is re-validated against the
    // spans manifest — a file lost after the guard collect must refuse
    // loudly with the pointer unmoved, not silently drop carried rows
    val corpus = docs(
      (1L, "a b c d x1 x2 x3 x4"),
      (2L, "a b c d y1 y2 y3 y4"), // 1-2 share a block → spans nonempty
      (3L, "m n o p m2 n2 o2 p2"))
    val root = tmp()
    IncrementalSpans.writeState(corpus, root, n = 4, nBuckets = 8)
    val g = IncrementalSpans.prepareFold(spark, root,
      docs((10L, "q r s t a b c d")), n = 4, nBuckets = 8)
    assert(g.isDefined)
    val dispatched = GuardedFold.collectAll(Seq("spans" -> g.get))
    val cur = SnapshotRoot.currentDir(root)
    val victims = Option(new java.io.File(s"$cur/spans").listFiles())
      .getOrElse(Array.empty).filter(_.isDirectory)
      .flatMap(d => d.listFiles().filter(_.getName.endsWith(".parquet")))
    assert(victims.nonEmpty, "fixture must produce committed span rows")
    assert(victims.head.delete())
    val e = intercept[IllegalArgumentException] {
      dispatched.foreach { case (gf, meta) => gf.commit(meta) }
    }
    assert(e.getMessage.contains("manifest"))
    assert(SnapshotRoot.currentDir(root) == cur,
      "a refused commit must leave the pointer on the old snapshot")
  }
}
