package graft.ops

import graft.SparkSpec

/** Pins the snapshot-retention contract (VERDICT r14 task 3): a flip
  * GC's everything older than the `retain` most recent superseded
  * versions. K=1 (the default, unchanged behavior) protects a reader
  * that resolved the pointer before ONE flip; a reader whose plan
  * pinned a version and then survives TWO flips scans deleted files —
  * under K≥2 the same reader succeeds. Daemon roots with long
  * concurrent readers raise SPARK_GRAFT_SNAPSHOT_RETAIN; at 100 TB the
  * knob maps onto the table format's snapshot-retention policy.
  */
class SnapshotRootSpec extends SparkSpec {
  import spark.implicits._

  private def mkRoot(tag: String): String = {
    val root = s"target/snapshot_root_spec_$tag"
    SnapshotRoot.initRoot(root, Seq((1L, "a")).toDF("id", "s"), Nil)
    root
  }

  /** Build the next version as a fresh parquet dir and flip to it. */
  private def fold(root: String, retain: Int): Unit = {
    val next = SnapshotRoot.nextVersion(root)
    val n = next.drop(1).toLong
    Seq((n, s"v$n")).toDF("id", "s").write.parquet(s"$root/$next")
    SnapshotRoot.flipAndGc(root, next, retain)
  }

  private def versions(root: String): Set[String] =
    SnapshotRoot.listDir(new java.io.File(root))
      .filter(f => f.isDirectory && f.getName.matches("v\\d+"))
      .map(_.getName).toSet

  test("retain=1 (default) keeps exactly one superseded version") {
    val root = mkRoot("k1")
    fold(root, retain = 1) // v1 -> v2: v1 retained
    assert(versions(root) == Set("v1", "v2"))
    fold(root, retain = 1) // v2 -> v3: v1 GC'd
    assert(versions(root) == Set("v2", "v3"))
    assert(SnapshotRoot.currentVersion(root) == "v3")
  }

  test("a reader crossing TWO flips fails under K=1 and succeeds under K=2") {
    // K=1: the documented two-flip hazard — the reader's pinned files
    // are GC'd mid-query
    val r1 = mkRoot("reader_k1")
    val pinned1 = spark.read.parquet(SnapshotRoot.currentDir(r1)) // pins v1
    pinned1.collect() // plan resolved against v1's files
    fold(r1, retain = 1); fold(r1, retain = 1) // two flips: v1 deleted
    intercept[Exception] { spark.read.parquet(s"$r1/v1").collect() }

    // K=2: the same reader survives both flips
    val r2 = mkRoot("reader_k2")
    val pinned2 = spark.read.parquet(SnapshotRoot.currentDir(r2))
    assert(pinned2.collect().length == 1)
    fold(r2, retain = 2); fold(r2, retain = 2)
    assert(versions(r2) == Set("v1", "v2", "v3"))
    assert(pinned2.collect().map(_.getLong(0)).toSeq == Seq(1L),
      "a reader pinned on v1 must still read v1's bytes after two flips under K=2")
    // a third flip under K=2 finally GC's v1
    fold(r2, retain = 2)
    assert(versions(r2) == Set("v2", "v3", "v4"))
  }

  test("defaultRetain honors the env contract shape") {
    // the env isn't set in tests — the default must be 1 (unchanged
    // pre-r15 behavior) and the explicit-arg path must reject K<1
    assert(SnapshotRoot.defaultRetain == 1)
    val root = mkRoot("badk")
    intercept[IllegalArgumentException] {
      SnapshotRoot.flipAndGc(root, "v2", retain = 0)
    }
  }
}
