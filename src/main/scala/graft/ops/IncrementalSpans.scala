package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental exact-substring span maintenance: keep the
  * [[DupSpans]] output current as document batches arrive, at
  * O(delta + affected docs) instead of a corpus re-gram — the span
  * pillar's version of the O(delta) folds the engine already has for
  * pair dedup ([[IncrementalDedup]]), cluster labels
  * ([[IncrementalClusters]]), ANN cells ([[IvfIndex.appendIndexed]])
  * and the drift profile ([[DriftStore]]).
  *
  * == State (ONE [[SnapshotRoot]], four bucket-partitioned tables per
  * version — a single pointer flip keeps them mutually consistent) ==
  *  - `grams`  (g, doc_id) distinct pairs, partitioned by
  *    `gbucket = pmod(xxhash64(g), B)` — answers "which corpus docs
  *    contain this gram" with a bucket-pruned read;
  *  - `gramdf` (g, df) document-frequency PARTIALS (reads sum them),
  *    same partitioning;
  *  - `docs`   (doc_id, text), partitioned by
  *    `dbucket = pmod(doc_id, B)` — affected docs re-gram from a
  *    pruned read, never a corpus scan (the IncrementalDedup doc-store
  *    posture);
  *  - `spans`  the [[DupSpans]] output rows, partitioned like `docs`.
  *
  * == Fold (applyDelta) ==
  *  1. gram the delta (O(delta));
  *  2. corpus docs sharing ≥1 delta gram = the AFFECTED set: only
  *     their spans can change, because a span depends solely on its
  *     own grams' df and the delta shifts df only for grams it
  *     contains — any corpus doc holding such a gram is matched here,
  *     so untouched docs' rows are bit-stable by construction;
  *  3. re-derive spans for affected ∪ delta docs: their grams come
  *     from the pruned doc-store read + the delta, their post-delta
  *     df = stored df (slim 2-column store STREAMED through a
  *     broadcast semi-join — never shuffled) + the delta's per-gram
  *     distinct-doc count;
  *  4. write the next snapshot: gram/df/doc stores are APPEND-ONLY
  *     (every existing file hard-linked, the delta's part files moved
  *     in — O(delta) bytes, because a day-batch's grams hash into
  *     every bucket and a rewrite-touched-buckets design would
  *     rewrite the corpus-scale gram store per fold), with per-bucket
  *     compaction past `compactAt` files (gramdf partials summed);
  *     the spans table needs delete+insert semantics and rewrites its
  *     O(affected) touched buckets; one atomic pointer flip commits
  *     all four ([[SnapshotRoot]] crash contract).
  *
  * Equivalence contract (the oracle gate): after any fold sequence,
  * `spans` equals [[DupSpans.duplicateSpans]] over the union of
  * everything ever written — q_dup_spans_incremental runs the BATCH
  * span SQL. Delta ids must be new and unique (enforced loudly before
  * any mutation, the IncrementalClusters guard).
  */
object IncrementalSpans {

  import org.apache.spark.sql.types._
  // explicit read schemas: a just-initialized store can hold EMPTY
  // tables (a corpus with no duplicates writes zero span partitions),
  // and parquet cannot infer a schema from an empty directory
  private val gramsSchema = StructType(Seq(StructField("g", StringType),
    StructField("doc_id", LongType), StructField("gbucket", IntegerType)))
  private val gramdfSchema = StructType(Seq(StructField("g", StringType),
    StructField("df", LongType), StructField("gbucket", IntegerType)))
  private val docsSchema = StructType(Seq(StructField("doc_id", LongType),
    StructField("text", StringType), StructField("dbucket", IntegerType)))
  private val spansSchema = StructType(Seq(StructField("doc_id", LongType),
    StructField("span_start", LongType), StructField("span_end", LongType),
    StructField("n_docs_max", LongType), StructField("dbucket", IntegerType)))

  /** Tokenize + gram (doc_id, pos, g) — DupSpans' own gram stage, so
    * the fold==rebuild contract holds by construction. */
  private def gramsOf(docs: DataFrame, n: Int): DataFrame =
    DupSpans.gramRows(docs, n)

  private def gbucket(g: org.apache.spark.sql.Column, nBuckets: Int) =
    pmod(xxhash64(g), lit(nBuckets.toLong)).cast("int")
  private def dbucket(id: org.apache.spark.sql.Column, nBuckets: Int) =
    pmod(id, lit(nBuckets.toLong)).cast("int")

  /** Spans from grams + an (already ≥2-filtered) df frame — DupSpans'
    * own island stage (shared definition, no divergence risk). */
  private def spansFrom(grams: DataFrame, dupDf: DataFrame, n: Int): DataFrame =
    DupSpans.spansFrom(grams, dupDf, n)

  /** Offline build: state for `docs` at `root` (v1 + pointer). */
  def writeState(docs: DataFrame, root: String, n: Int = 8,
      nBuckets: Int = 64): Unit = {
    val d = docs.select(col("doc_id"), col("text"))
    val g = gramsOf(d, n)
    val pairs = g.select(col("g"), col("doc_id")).distinct()
    val df = pairs.groupBy("g").agg(count(lit(1)).as("df"))
    val spans = spansFrom(g, df.filter(col("df") >= 2), n)

    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val v1 = s"$root/v1"
    Bucketing.writePartitioned(
      pairs.withColumn("gbucket", gbucket(col("g"), nBuckets)), s"$v1/grams", Seq("gbucket"))
    Bucketing.writePartitioned(
      df.withColumn("gbucket", gbucket(col("g"), nBuckets)), s"$v1/gramdf", Seq("gbucket"))
    Bucketing.writePartitioned(
      d.withColumn("dbucket", dbucket(col("doc_id"), nBuckets)), s"$v1/docs", Seq("dbucket"))
    Bucketing.writePartitioned(
      spans.withColumn("dbucket", dbucket(col("doc_id"), nBuckets)), s"$v1/spans", Seq("dbucket"))
    java.nio.file.Files.write(java.nio.file.Paths.get(root, "_current"),
      "v1".getBytes("UTF-8"))
  }

  /** The live span output (the [[DupSpans.duplicateSpans]] shape). */
  def readSpans(spark: SparkSession, root: String): DataFrame =
    spark.read.schema(spansSchema)
      .parquet(s"${SnapshotRoot.currentDir(root)}/spans")
      .select("doc_id", "span_start", "span_end", "n_docs_max")

  /** Fold one delta batch (see object scaladoc). */
  def applyDelta(spark: SparkSession, root: String, delta: DataFrame,
      n: Int = 8, nBuckets: Int = 64): Unit = {
    val cur = SnapshotRoot.currentDir(root)
    val d = Persists.cacheFor(delta.select(col("doc_id"), col("text")), 64)
    val dg = Persists.cacheFor(gramsOf(d, n), 64)

    // ---- delta contract: new, unique ids (guard BEFORE any mutation).
    // ONE fused collect serves the guard stats AND the delta id-bucket
    // list (the IncrementalClusters single-collect lesson — every
    // separate driver action is a scheduler round-trip)
    val stats = d.agg(count(lit(1)).as("rows"),
      countDistinct(col("doc_id")).as("ids"),
      collect_set(dbucket(col("doc_id"), nBuckets)).as("bs")).head()
    require(stats.getLong(0) == stats.getLong(1),
      s"delta has ${stats.getLong(0)} rows but ${stats.getLong(1)} distinct " +
        "doc_id values — duplicate ids in one batch would corrupt the store")
    val dBucketsDelta = stats.getSeq[Int](2).toArray
    val overlap = spark.read.schema(docsSchema).parquet(s"$cur/docs")
      .filter(col("dbucket").isin(dBucketsDelta.map(Integer.valueOf): _*))
      .join(d.select("doc_id"), "doc_id").count() // id-bucket-pruned read
    require(overlap == 0L,
      s"$overlap delta doc_id(s) already present — delta ids must be new")

    // ---- affected corpus docs: share ≥1 gram with the delta.
    // Delta grams are day-scale → broadcast; the gram store read is
    // pruned to the delta grams' buckets.
    val dgSet = dg.select("g").distinct()
    val gBuckets = dgSet.select(gbucket(col("g"), nBuckets).as("b"))
      .distinct().collect().map(_.getInt(0)).sorted // metadata: ≤ nBuckets
    val gramStore = spark.read.schema(gramsSchema).parquet(s"$cur/grams")
      .filter(col("gbucket").isin(gBuckets.map(Integer.valueOf): _*))
    val touchedDocs = Persists.cacheFor(
      gramStore.join(broadcast(dgSet), "g").select("doc_id").distinct(), 64)

    // ---- re-derive spans for affected ∪ delta
    val dBucketsTouched = touchedDocs
      .select(dbucket(col("doc_id"), nBuckets).as("b"))
      .distinct().collect().map(_.getInt(0))
    val affectedText = spark.read.schema(docsSchema).parquet(s"$cur/docs")
      .filter(col("dbucket").isin(dBucketsTouched.map(Integer.valueOf): _*))
      .join(touchedDocs, "doc_id").select("doc_id", "text")
    val affGrams = Persists.cacheFor(gramsOf(affectedText, n).unionByName(dg), 64)

    // post-delta df for every gram of the affected set: stored df
    // (slim store streamed through a broadcast semi-join of the grams
    // we need) + the delta's distinct-doc contribution
    val needed = affGrams.select("g").distinct()
    val deltaDf = dg.select("g", "doc_id").distinct()
      .groupBy("g").agg(count(lit(1)).as("ddf"))
    // gramdf rows are PARTIAL increments (append-only store): the
    // stored frequency is the sum of a gram's partials
    val storedDf = spark.read.schema(gramdfSchema).parquet(s"$cur/gramdf")
      .join(broadcast(needed), "g")
      .groupBy("g").agg(sum("df").as("odf"))
    val newDf = storedDf.join(deltaDf, Seq("g"), "full_outer")
      .select(col("g"),
        (coalesce(col("odf"), lit(0L)) + coalesce(col("ddf"), lit(0L))).as("df"))
    val newSpans = Persists.cacheFor(
      spansFrom(affGrams, newDf.filter(col("df") >= 2), n), 64)

    // ---- next snapshot: rewrite touched buckets, hard-link the rest
    val next = SnapshotRoot.nextVersion(root)
    val nextDir = s"$root/$next"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(nextDir))

    val deltaPairs = dg.select("g", "doc_id").distinct()
    val spanBuckets = (dBucketsTouched ++ dBucketsDelta).distinct.sorted

    // Append-only stores (grams / gramdf / docs): a delta's grams hash
    // into EVERY bucket (millions of distinct grams per day-batch), so
    // a rewrite-touched-buckets design would rewrite the corpus-scale
    // gram store on every fold — the first sweep of this operator
    // measured exactly that (3.8× fold cost at a 100× corpus). Instead
    // the next snapshot hard-links every existing file and MOVES the
    // delta's part files into the bucket dirs — O(delta) bytes written
    // — and buckets whose file count passes `compactAt` are rolled up
    // (gramdf partials summed, pair/doc files merged) in one extra
    // partitioned write job, keeping file counts bounded under
    // continuous folding. The spans table alone needs delete+insert
    // semantics (affected docs' old rows must go), so it keeps the
    // rewrite-touched-buckets path; its touched set is O(affected
    // docs), not O(delta grams).
    val compactAt = 16
    def bucketOf(f: java.io.File): Int = f.getName.split("=")(1).toInt
    def dirs(path: String): Array[java.io.File] =
      Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.contains("="))
    def dataFiles(dir: java.io.File): Array[java.io.File] =
      Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))

    def append(table: String, bucketCol: String, deltaRows: DataFrame,
        compact: DataFrame => DataFrame, schema: org.apache.spark.sql.types.StructType): Unit = {
      val stage = s"$nextDir/_stage_$table"
      deltaRows.repartition(col(bucketCol))
        .write.partitionBy(bucketCol).parquet(stage)
      val tdir = new java.io.File(s"$nextDir/$table")
      java.nio.file.Files.createDirectories(tdir.toPath)
      val curDirs = dirs(s"$cur/$table").map(f => bucketOf(f) -> f).toMap
      val stageDirs = dirs(stage).map(f => bucketOf(f) -> f).toMap
      val oversized = (curDirs.keySet ++ stageDirs.keySet).filter { b =>
        curDirs.get(b).map(dataFiles(_).length).getOrElse(0) +
          stageDirs.get(b).map(dataFiles(_).length).getOrElse(0) > compactAt
      }
      curDirs.foreach { case (b, cd) =>
        if (!oversized(b))
          SnapshotRoot.linkDirInto(cd, new java.io.File(tdir, cd.getName))
      }
      stageDirs.foreach { case (b, sd) =>
        if (!oversized(b)) {
          val dst = new java.io.File(tdir, sd.getName)
          java.nio.file.Files.createDirectories(dst.toPath)
          dataFiles(sd).foreach { f => // spark part names are unique across writes
            java.nio.file.Files.move(f.toPath, dst.toPath.resolve(f.getName))
          }
        }
      }
      if (oversized.nonEmpty) {
        val ov = oversized.toSeq.sorted.map(Integer.valueOf)
        val rows = spark.read.schema(schema).parquet(s"$cur/$table")
          .filter(col(bucketCol).isin(ov: _*))
          .unionByName(spark.read.schema(schema).parquet(stage)
            .filter(col(bucketCol).isin(ov: _*)))
        val stage2 = s"$nextDir/_compact_$table"
        compact(rows).repartition(col(bucketCol))
          .write.partitionBy(bucketCol).parquet(stage2)
        oversized.foreach { b =>
          val src = new java.io.File(s"$stage2/$bucketCol=$b")
          val dst = new java.io.File(tdir, s"$bucketCol=$b")
          if (src.isDirectory) require(src.renameTo(dst), s"rename failed: $src")
          else java.nio.file.Files.createDirectories(dst.toPath)
        }
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(stage2))
      }
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(stage))
    }

    def rewrite(table: String, bucketCol: String, touched: Seq[Int],
        rows: DataFrame): Unit = {
      val stage = s"$nextDir/_stage_$table"
      rows.repartition(col(bucketCol))
        .write.partitionBy(bucketCol).parquet(stage)
      val tdir = new java.io.File(s"$nextDir/$table")
      java.nio.file.Files.createDirectories(tdir.toPath)
      touched.foreach { b =>
        val src = new java.io.File(s"$stage/$bucketCol=$b")
        val dst = new java.io.File(tdir, s"$bucketCol=$b")
        if (src.isDirectory) {
          require(src.renameTo(dst), s"rename failed: $src -> $dst")
        } else java.nio.file.Files.createDirectories(dst.toPath)
      }
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(stage))
      dirs(s"$cur/$table")
        .filter(f => !touched.contains(bucketOf(f)))
        .foreach(srcF => SnapshotRoot.linkDirInto(srcF,
          new java.io.File(tdir, srcF.getName)))
    }

    append("grams", "gbucket",
      deltaPairs.withColumn("gbucket", gbucket(col("g"), nBuckets)),
      identity, gramsSchema)
    append("gramdf", "gbucket",
      deltaDf.select(col("g"), col("ddf").as("df"))
        .withColumn("gbucket", gbucket(col("g"), nBuckets)),
      rows => rows.groupBy("g", "gbucket").agg(sum("df").as("df"))
        .select("g", "df", "gbucket"),
      gramdfSchema)
    append("docs", "dbucket",
      d.withColumn("dbucket", dbucket(col("doc_id"), nBuckets)),
      identity, docsSchema)

    val touchedSpanRows = spark.read.schema(spansSchema).parquet(s"$cur/spans")
      .filter(col("dbucket").isin(spanBuckets.map(Integer.valueOf): _*))
      .join(touchedDocs, Seq("doc_id"), "left_anti")
      .select("doc_id", "span_start", "span_end", "n_docs_max")
      .unionByName(newSpans)
      .withColumn("dbucket", dbucket(col("doc_id"), nBuckets))
    rewrite("spans", "dbucket", spanBuckets, touchedSpanRows)

    SnapshotRoot.flipAndGc(root, next)
  }
}
