package graft.streaming

import graft.SparkSpec
import graft.model.Tables
import graft.ops.{ConnectedComponents, DriftStore, DupSpans, IncrementalClusters, IncrementalDedup, IncrementalSpans}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The full ingest daemon (ContinuousIngest): ONE stream maintains
  * dedup labels, the drift profile, AND the span state — and each
  * family equals its batch re-derivation over everything written. The
  * composition inherits its contract from the per-family specs; this
  * gates that the families don't interfere when driven together. */
class ContinuousIngestSpec extends SparkSpec {

  private def keyedOf(df: DataFrame): DataFrame =
    graft.ExtQueries.clusterKeyedOf(df)

  test("one stream maintains labels + drift profile + spans, all == batch") {
    val docs = Tables.documents(spark, sfDir)
    val corpus = docs.filter(col("doc_id") % 4 === 0)
    val streamed = docs.filter(col("doc_id") % 4 =!= 0)
    val all = corpus.unionByName(streamed)
    val p = java.nio.file.Files.createTempDirectory("graft-cont-ingest").toString
    // offline builds, one per family
    IncrementalDedup.writeIndex(corpus, s"$p/index")
    IncrementalClusters.writeState(keyedOf(corpus), "doc_id", Seq("k1", "k2"), s"$p/state")
    DriftStore.writeProfile(corpus, s"$p/drift")
    IncrementalSpans.writeState(corpus.select("doc_id", "text"), s"$p/spans",
      n = 8, nBuckets = 16)
    (1 to 3).foreach(i => docs.filter(col("doc_id") % 4 === i)
      .coalesce(1).write.parquet(s"$p/feed/b$i"))

    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$p/feed/b*")
    // fifth family (r11): the corpus metric view's rollup folds per
    // microbatch; seed it with the offline corpus first
    val cat = new graft.api.MetricViewCatalog(spark,
      { case "documents" => all; case n => sys.error(s"no source $n") },
      Some(s"$p/metrics"))
    val mv = cat.createOrReplace("mv_corpus", graft.spec.Specs.corpusMetrics)
    val im = cat.incremental.get
    im.foldBatch(mv, corpus, foldId = Some("seed"))
    val n = ContinuousIngest.run(stream, s"$p/index", s"$p/state",
      s"$p/pairs", s"$p/drift", s"$p/spans", keyedOf,
      spanN = 8, spanBuckets = 16, metrics = Some((mv, im)))
    assert(n == 3, s"expected 3 microbatches, got $n")

    // metrics rollup == batch partials over the union; a replayed fold
    // id no-ops (the ledger guard)
    cat.materializer.get.markBuilt(mv)
    val live = mv.query(Seq("source"), Seq("doc_count", "char_sum"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val expect = all.groupBy("source")
      .agg(count(lit(1)).as("n"), sum("n_chars").as("cs"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(live == expect, "stream-maintained rollup == batch aggregate")
    im.foldBatch(mv, corpus, foldId = Some("seed")) // replay: must no-op
    val replayed = mv.query(Seq("source"), Seq("doc_count", "char_sum"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(replayed == expect, "replayed fold id must not double-merge")

    // dedup labels == batch CC over the union
    val gotLabels = IncrementalClusters.readLabels(spark, s"$p/state")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val keyedAll = keyedOf(docs)
    val expLabels = ConnectedComponents.run(
      keyedAll.select(col("doc_id").as("id")),
      ConnectedComponents.keyEdges(keyedAll, "doc_id", Seq("k1", "k2")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotLabels == expLabels)

    // drift profile == whole-corpus profile
    def profRows(df: DataFrame) = df.select("source", "lang", "c", "h")
      .collect().map(r => s"${r.getString(0)}|${r.getString(1)}|${r.getLong(2)}|" +
        r.getSeq[Long](3).mkString(",")).toSet
    assert(profRows(DriftStore.profile(spark, s"$p/drift")) ==
      profRows(DriftStore.profileOf(all)))

    // span table == batch re-gram over the union
    assert(IncrementalSpans.readSpans(spark, s"$p/spans")
      .collect().map(_.toSeq).toSet ==
      DupSpans.duplicateSpans(all, n = 8).collect().map(_.toSeq).toSet)
  }
}
