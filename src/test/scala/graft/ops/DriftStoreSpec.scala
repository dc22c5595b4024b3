package graft.ops

import graft.SparkSpec

/** DriftStore fold==rebuild contracts on toy corpora (the sf-scale
  * end-to-end gate is q_drift_incremental, hash-oracled against the
  * batch drift SQL). */
class DriftStoreSpec extends SparkSpec {

  import spark.implicits._

  private def docs(rows: (Long, String, String, Long)*) =
    rows.toDF("doc_id", "source", "lang", "n_chars")

  private def profileRows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.select("source", "lang", "c", "h").collect()
      .map(r => s"${r.getString(0)}|${r.getString(1)}|${r.getLong(2)}|" +
        r.getSeq[Long](3).mkString(","))
      .toSet

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("drift_store_spec").toString

  test("two sequential folds == whole-corpus profile, including a delta-born lang") {
    val corpus = docs((1, "web", "en", 100), (2, "web", "en", 900),
      (3, "book", "fr", 400))
    val d1 = docs((10, "web", "de", 50)) // lang that exists nowhere yet
    val d2 = docs((11, "book", "fr", 400), (12, "news", "en", 2000)) // new source + clamp
    val root = tmp()
    DriftStore.writeProfile(corpus, root)
    DriftStore.applyDelta(spark, root, d1)
    DriftStore.applyDelta(spark, root, d2)
    val folded = profileRows(DriftStore.profile(spark, root))
    val whole = profileRows(DriftStore.profileOf(
      corpus.unionByName(d1).unionByName(d2)))
    assert(folded == whole)
  }

  test("null lang folds into '' on both paths") {
    val root = tmp()
    DriftStore.writeProfile(docs((1, "web", "en", 10)), root)
    DriftStore.applyDelta(spark, root,
      Seq((2L, "web", null.asInstanceOf[String], 10L)).toDF("doc_id", "source", "lang", "n_chars"))
    val langs = DriftStore.profile(spark, root).select("lang")
      .collect().map(_.getString(0)).toSet
    assert(langs == Set("en", ""))
  }

  test("a replayed fold id no-ops: the ledger rides the snapshot") {
    val root = tmp()
    DriftStore.writeProfile(docs((1, "web", "en", 10)), root)
    val delta = docs((2, "web", "en", 20))
    DriftStore.applyDelta(spark, root, delta, foldId = Some("batch-1"))
    val after = profileRows(DriftStore.profile(spark, root))
    // stream restart replays the same batch: must not double-count
    DriftStore.applyDelta(spark, root, delta, foldId = Some("batch-1"))
    assert(SnapshotRoot.currentVersion(root) == "v2") // no new version
    assert(profileRows(DriftStore.profile(spark, root)) == after)
    // a NEW id still folds
    DriftStore.applyDelta(spark, root, docs((3, "web", "fr", 30)),
      foldId = Some("batch-2"))
    assert(SnapshotRoot.currentVersion(root) == "v3")
  }

  test("each fold commits a new snapshot version and GCs old ones") {
    val root = tmp()
    DriftStore.writeProfile(docs((1, "web", "en", 10)), root)
    assert(SnapshotRoot.currentVersion(root) == "v1")
    DriftStore.applyDelta(spark, root, docs((2, "web", "en", 20)))
    DriftStore.applyDelta(spark, root, docs((3, "web", "en", 30)))
    assert(SnapshotRoot.currentVersion(root) == "v3")
    val versions = new java.io.File(root).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(versions == Set("v2", "v3")) // one superseded retained, v1 GC'd
  }
}
