package graft.ops

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

/** Persisted ANN index artifacts (VERDICT r7 residual #3): train
  * offline once, persist, load in another session, probe a
  * cell-partitioned layout with directory-level pruning. */
class IndexStoreSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sfDir)
  private lazy val queries = emb.filter(col("vec_id") < 10)

  test("IVF model save -> load round-trips bit-identically") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-store").toString
    val trained = IvfIndex.train(emb)
    IndexStore.saveIvf(trained, dir)
    val loaded = IndexStore.loadIvf(dir)
    assert(loaded.centroids.length == trained.centroids.length)
    trained.centroids.zip(loaded.centroids).foreach { case (t, l) =>
      assert(java.util.Arrays.equals(t, l)) // exact doubles, not approx
    }
    // and the loaded model produces the identical query plan output
    val a = IvfIndex.topK(emb, queries, k = 5, trained).collect().map(_.toSeq).toSet
    val b = IvfIndex.topK(emb, queries, k = 5, loaded).collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("LSH plane tensor save -> load round-trips bit-identically (identical buckets)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-lsh-store").toString
    val planes = Similarity.planesFor(tables = 8, bits = 10, dim = 64, seed = 42L)
    IndexStore.savePlanes(planes, dir)
    val loaded = IndexStore.loadPlanes(dir)
    (planes.flatten: Array[Array[Double]]).zip(loaded.flatten: Array[Array[Double]])
      .foreach { case (t, l) => assert(java.util.Arrays.equals(t, l)) }
    val a = emb.select(graft.functions.HyperplaneBuckets(col("embedding"), planes))
      .collect().map(_.toSeq)
    val b = emb.select(graft.functions.HyperplaneBuckets(col("embedding"), loaded))
      .collect().map(_.toSeq)
    assert(a.sameElements(b))
  }

  test("shape drift fails loudly at load") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-bad")
    java.nio.file.Files.write(dir.resolve("ivf_centroids.txt"),
      "2 3\n1.0 2.0 3.0\n".getBytes) // header claims 2 rows, file has 1
    intercept[IllegalArgumentException] { IndexStore.loadIvf(dir.toString) }
  }

  test("IVF-partitioned layout: probe prunes directories and matches the in-session probe") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val model = IvfIndex.train(emb)
    val path = java.nio.file.Files.createTempDirectory("graft-ivf-layout").toString + "/emb"
    IvfIndex.writeIndexed(emb, path, model)

    val nprobe = 4
    val indexed = IvfIndex.topKIndexed(spark, path, queries, k = 5, model, nprobe)
    val inSession = IvfIndex.topK(emb, queries, k = 5, model, nprobe)
    assert(indexed.collect().map(_.toSeq).toSet ==
      inSession.collect().map(_.toSeq).toSet)

    // plan gate: the probe predicate reaches the scan as a partition
    // filter and selects exactly the probed cell directories — the
    // static-plan convention (an unexecuted AQE wrapper hides scans)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val probed = queries
        .select(explode(IvfIndex.probeCellsExpr(col("embedding"), model, nprobe)).as("c"))
        .distinct().count()
      val gated = IvfIndex.topKIndexed(spark, path, queries, k = 5, model, nprobe)
      val scan = gated.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec if s.relation.location.rootPaths.exists(
          _.toString.contains("graft-ivf-layout")) => s
      }.head
      // Spark ALSO inserts a DynamicPruningExpression for the broadcast
      // join on __cell; the static isin alone must already select
      // exactly the probed dirs (DPP can't be evaluated pre-execution)
      val staticFilters = scan.partitionFilters.filterNot(_.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruningExpression]))
      assert(staticFilters.nonEmpty,
        "probe predicate must reach the scan as a static PartitionFilter:\n" + scan)
      val selected = scan.relation.location.listFiles(staticFilters, Nil).size
      val totalCells = spark.read.parquet(path).select("__cell").distinct().count()
      assert(selected == probed && selected < totalCells,
        s"expected $probed of $totalCells cell dirs read, got $selected")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
