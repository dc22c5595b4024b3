package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class IncrementalSegmentsSpec extends SparkSpec {

  private def frame(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, t) => (id, "s", t) }.toDF("doc_id", "source", "text")
  }

  private def card(df: DataFrame) =
    df.collect().map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("n_segments"), r.getAs[Long]("kept_segments"),
        r.getAs[String]("new_text"))).toMap

  private val corpus = Seq(
    1L -> "a b c d e f g h",      // two 4-token windows
    2L -> "a b c d x y z w",      // shares window 0 with doc 1
    3L -> "p q r s t u v m")
  private val delta1 = Seq(
    10L -> "x y z w fresh new words here", // window 0 = doc 2's window 1
    11L -> "totally novel content right here now yes")
  private val delta2 = Seq(
    20L -> "totally novel content right here now yes") // dup of 11

  test("ordered folds == batch dedup over the union (fold==rebuild)") {
    val root = java.nio.file.Files.createTempDirectory("inc_segs").toString
    IncrementalSegments.writeState(frame(corpus), root, n = 4, nBuckets = 8)
    IncrementalSegments.applyDelta(spark, root, frame(delta1), n = 4,
      nBuckets = 8, foldId = Some("f1"))
    IncrementalSegments.applyDelta(spark, root, frame(delta2), n = 4,
      nBuckets = 8, foldId = Some("f2"))
    val inc = card(IncrementalSegments.dedupFromState(spark, root, n = 4))
    val batch = card(SegmentDedup.dedup(frame(corpus ++ delta1 ++ delta2),
      SegmentDedup.tokenWindows(col("text"), 4), sep = " "))
    assert(inc == batch)
    assert(inc(2L)._2 == 1L, "doc 2 lost its copied window")
    assert(inc(20L)._2 == 0L, "full duplicate lost everything")
  }

  test("replayed fold id no-ops; params mismatch fails loudly; existing ids rejected") {
    val root = java.nio.file.Files.createTempDirectory("inc_segs2").toString
    IncrementalSegments.writeState(frame(corpus), root, n = 4, nBuckets = 8)
    IncrementalSegments.applyDelta(spark, root, frame(delta1), n = 4,
      nBuckets = 8, foldId = Some("f1"))
    val v = SnapshotRoot.currentVersion(root)
    IncrementalSegments.applyDelta(spark, root, frame(delta1), n = 4,
      nBuckets = 8, foldId = Some("f1")) // replay
    assert(SnapshotRoot.currentVersion(root) == v, "replay must not advance")
    intercept[IllegalArgumentException] {
      IncrementalSegments.applyDelta(spark, root, frame(delta2), n = 8,
        nBuckets = 8, foldId = Some("f2")) // wrong window size
    }
    intercept[IllegalArgumentException] {
      IncrementalSegments.applyDelta(spark, root, frame(delta1), n = 4,
        nBuckets = 8, foldId = Some("f3")) // ids already absorbed
    }
    assert(SnapshotRoot.currentVersion(root) == v, "failed folds leave the snapshot")
  }

  test("out-of-order arrival: first observed keeps the claim (never re-assigned)") {
    val root = java.nio.file.Files.createTempDirectory("inc_segs3").toString
    // high-id doc arrives FIRST and claims the segment
    IncrementalSegments.writeState(frame(Seq(100L -> "a b c d")), root,
      n = 4, nBuckets = 8)
    IncrementalSegments.applyDelta(spark, root,
      frame(Seq(1L -> "a b c d")), n = 4, nBuckets = 8, foldId = Some("late"))
    val keepers = IncrementalSegments.readKeepers(spark, root)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(keepers.values.toSet == Set(100L),
      "the earlier-arrived doc keeps the claim even against a lower id")
    val r = card(IncrementalSegments.dedupFromState(spark, root, n = 4))
    assert(r(100L)._2 == 1L && r(1L)._2 == 0L)
  }

  test("guard-leg store reads are manifest-checked: a lost docs file refuses the fold (r16 tamper)") {
    // the id-overlap guard leg enumerates the docs store from its
    // manifest-checked listing — a silently short listing would
    // UNDER-COUNT the overlap and admit a duplicate id that
    // first-observed-wins semantics then entrench
    val root = java.nio.file.Files.createTempDirectory("inc_segs_tamper").toString
    IncrementalSegments.writeState(frame(corpus), root, n = 4, nBuckets = 8)
    val v = SnapshotRoot.currentVersion(root)
    val victims = Option(new java.io.File(s"$root/$v/docs").listFiles())
      .getOrElse(Array.empty).filter(_.isDirectory)
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
    assert(victims.nonEmpty)
    assert(victims.head.delete())
    val e = intercept[IllegalArgumentException] {
      IncrementalSegments.applyDelta(spark, root, frame(delta1), n = 4,
        nBuckets = 8)
    }
    assert(e.getMessage.contains("manifest"))
    assert(SnapshotRoot.currentVersion(root) == v,
      "a refused fold leaves the snapshot pointer unmoved")
  }
}
