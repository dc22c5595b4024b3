package graft

import scala.jdk.CollectionConverters._

/** Content gate for the two rows-only queries (VERDICT r17 task 5):
  * q_daemon_status / q_sql_daemon_status have no DuckDB analogue (the
  * ledgers are commit-protocol text files, not tables), so the
  * driver's oracle checks rows only. This spec gates their CONTENT:
  * every status row must equal an INDEPENDENT recomputation from the
  * ledger files — the spec resolves each family's `_current` pointer
  * and reads `_applied_folds` with its own java.nio code (not
  * [[graft.streaming.ContinuousIngest.status]]'s), and recomputes the
  * expected batch fold ids from the raw fixture in plain Scala (not
  * [[graft.streaming.Folds.contentFoldId]]'s Spark aggregate). Checked
  * field-by-field: family set, applied-fold depth, the full fold-id
  * SEQUENCE (batch identity + order), the per-batch row counts the
  * fold ids embed, and the DataFrame/SQL-TVF twins' equality. */
class DaemonStatusContentSpec extends SparkSpec {

  // family -> ledger-bearing root, relative to the staged daemon dir
  // (the same map daemonStatus passes to ContinuousIngest.status)
  private def roots(p: String): Map[String, String] = Map(
    "dedup_index" -> s"$p/index",
    "clusters" -> s"$p/state/labels",
    "drift" -> s"$p/drift",
    "spans" -> s"$p/spans",
    "segments" -> s"$p/segs",
    "bm25" -> s"$p/bm25",
    "dsir" -> s"$p/dsir",
    "fingerprints" -> s"$p/fps")

  /** Spec-local ledger read: resolve the `_current` pointer (if the
    * root is snapshot-versioned) by reading the pointer FILE, then the
    * non-empty `_applied_folds` lines — no engine helper involved. */
  private def ledgerLines(root: String): Seq[String] = {
    val rootP = java.nio.file.Paths.get(root)
    val cur = rootP.resolve("_current")
    val live =
      if (java.nio.file.Files.exists(cur))
        rootP.resolve(new String(
          java.nio.file.Files.readAllBytes(cur), "UTF-8").trim)
      else rootP
    val ledger = live.resolve("_applied_folds")
    if (!java.nio.file.Files.exists(ledger)) Seq.empty
    else java.nio.file.Files.readAllLines(ledger).asScala.toSeq
      .filter(_.nonEmpty)
  }

  test("q_daemon_status rows == independent ledger recomputation " +
      "(families, batch-id sequence, embedded row counts)") {
    val status = ExtQueries.daemonStatus(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    val p = ExtQueries.streamCurState(spark, sfDir) // staged — same drain

    // expected fold ids recomputed from the raw fixture in plain Scala:
    // the daemon drains doc_id % 4 == 1, 2, 3 as three microbatches and
    // the content-derived id is "doc_id-<min>-<max>-<count>"
    val ids = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    def foldId(batch: Array[Long]): String =
      s"doc_id-${batch.min}-${batch.max}-${batch.length}"
    val batches = (1 to 3).map(i => ids.filter(_ % 4 == i))
    val expectIds = batches.map(b => foldId(b))

    assert(status.keySet == roots(p).keySet, "one row per state family")
    roots(p).foreach { case (family, root) =>
      val lines = ledgerLines(root)
      // the ledger itself must record exactly the three drained batches
      // in arrival order — batch identity, not just depth
      assert(lines == expectIds,
        s"$family ledger $lines != recomputed batch ids $expectIds")
      // field-level equality of the status row vs the spec's own read
      assert(status(family) == ((lines.size.toLong, lines.last)),
        s"$family status row ${status(family)} != ledger recomputation")
      // the embedded per-batch row counts match the fixture's batches
      lines.zip(batches).foreach { case (line, batch) =>
        assert(line.split("-").last.toLong == batch.length.toLong,
          s"$family fold id $line embeds wrong row count")
      }
    }
  }

  test("q_sql_daemon_status (TVF surface) == the DataFrame twin, field-level") {
    val df = ExtQueries.daemonStatus(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).sortBy(_._1)
    val sql = ExtQueries.sqlDaemonStatus(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).sortBy(_._1)
    assert(df.toSeq == sql.toSeq)
  }
}
