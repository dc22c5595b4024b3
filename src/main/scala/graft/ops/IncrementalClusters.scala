package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental duplicate-CLUSTER maintenance: keep a persisted label
  * table (doc_id → connected-component id) up to date as delta batches
  * arrive, in O(delta + touched clusters) — the last O(corpus) stage of
  * the continuous-dedup story after [[IncrementalDedup]] made *pair*
  * generation O(delta) (VERDICT r8 task 1). Recomputing
  * [[ConnectedComponents]] over the whole corpus to absorb a day's
  * arrivals re-shuffles every edge of a 100 TB corpus; here a delta
  * batch touches only the clusters it actually connects to.
  *
  * Persisted state (written once by [[writeState]], the offline job):
  *  - `labels/`  — (doc_id, component), Hive-partitioned by
  *    `cbucket = pmod(component, nBuckets)`. Partitioning by the
  *    COMPONENT hash is the load-bearing choice: every row of a
  *    component lives in exactly one bucket directory, so a component
  *    merge rewrites whole buckets and never has to find scattered
  *    rows. (An id-partitioned layout would make endpoint lookup
  *    prunable instead, but a merge's relabeled rows scatter across
  *    every id bucket — the rewrite, not the lookup, is the stage that
  *    must stay O(touched).)
  *  - `keys/` — (kidx, k, min_id): for every distinct structural key
  *    value, the min corpus doc id sharing it — the star-root
  *    [[ConnectedComponents.keyEdges]] would link to. Slim fixed-width
  *    rows, the [[IncrementalDedup]] index posture.
  *
  * Per-delta-batch cost ([[applyDelta]]), by stage:
  *  1. delta key explosion + per-key delta-min window: O(delta);
  *  2. delta-touched key lookup: the corpus key index STREAMS through a
  *     broadcast semi-join on the delta's key set — no index shuffle
  *     (corpus-proportional SCAN of 3 slim columns, the documented
  *     residual, same class as IncrementalDedup's index stream);
  *  3. endpoint-label lookup: the label store streams through a
  *     broadcast join on the (small) edge-endpoint id set — no label
  *     shuffle (the second slim-scan residual);
  *  4. micro-graph CC: nodes = touched corpus component labels ∪ delta
  *     ids, edges = delta-involving edges mapped to labels — bounded by
  *     delta size + affected clusters, never the corpus;
  *  5. label rewrite: ONLY buckets holding a remapped component, a
  *     merge target, or a delta row are read (literal `isin` partition
  *     pruning) and dynamically overwritten — untouched bucket
  *     directories keep their files byte-for-byte (mtime-gated in
  *     IncrementalClustersSpec).
  *
  * EQUIVALENCE CONTRACT (spec-gated; what lets the DuckDB oracle
  * hash-gate q_dedup_clusters_incremental with the *batch* fixpoint
  * SQL): after applyDelta, `labels/` equals batch CC over the keyed
  * graph of corpus ∪ delta. Argument: contracting each corpus
  * component to a single node preserves connectivity (its members are
  * already mutually connected), delta edges connect exactly the
  * star-roots batch keyEdges would emit for the union's key groups
  * (linking to the stored corpus group-min reaches the same component
  * as linking to any other group member), and min-labels compose:
  * min over a merged group of {component mins ∪ delta ids} is the
  * min over all member ids, because each component's label already is
  * its cluster-wide min.
  *
  * (Reference scope note: the dbt reference has no graph operator —
  * this extends the LLM-pipeline surface, composing with the r8
  * incremental-dedup index into a fully O(delta) continuous pipeline.)
  */
object IncrementalClusters {

  /** Buckets the [[applyDelta]] label rewrite touched on the most
    * recent call — observability for the "rewrite is O(touched), not
    * O(corpus)" claim (spec + scale sweep), not operator contract. */
  @volatile private[graft] var lastTouchedBuckets: Int = 0

  private def keyRows(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame =
    df.select(col(idCol).cast("long").as("doc_id"),
        posexplode(array(keyCols.map(col): _*)).as(Seq("kidx", "k")))
      .filter(col("k").isNotNull)

  /** Offline state build: batch CC over the corpus's keyed graph →
    * bucket-partitioned label store + per-key star-root index. The
    * one-time O(corpus) cost every later delta batch amortizes.
    *
    * `carryCols` (r9): per-doc columns copied INTO the label store
    * (e.g. a quality score computed once at ingest) so downstream
    * cluster-level derivations — canonicalization being the one that
    * matters — are views over the slim store and never re-touch
    * document text. [[applyDelta]] carries the same columns from the
    * delta frame (their presence is checked against the store schema).
    */
  def writeState(corpus: DataFrame, idCol: String, keyCols: Seq[String],
      path: String, nBuckets: Int = 64, carryCols: Seq[String] = Nil): Unit = {
    require(nBuckets > 0)
    val edges = ConnectedComponents.keyEdges(corpus, idCol, keyCols)
    // checkEvery=1: keyEdges graphs are hub-shaped and hub-min init
    // pre-pays the first propagation round (the clusterLabels rule)
    val labels = ConnectedComponents.run(
      corpus.select(col(idCol).cast("long").as("id")), edges, checkEvery = 1)
    // carried columns ride along via one build-time join (offline cost)
    val withCarry =
      if (carryCols.isEmpty) labels
      else labels.join(
        corpus.select((col(idCol).cast("long").as("id") +: carryCols.map(col)): _*),
        Seq("id"), "left")
    // repartition by the partition column first: a default-partitioned
    // frame writes |tasks|×|buckets| tiny files (measured 12 s of a
    // 19 s writeState at sf0.1); clustered, each bucket dir gets one
    Bucketing.writePartitioned(
      withCarry.select((col("id").as("doc_id") +: col("component") +:
          carryCols.map(col) :+
          pmod(col("component"), lit(nBuckets.toLong)).cast("int").as("cbucket")): _*)
        .repartition(col("cbucket")),
      s"$path/labels", Seq("cbucket"))
    keyRows(corpus, idCol, keyCols)
      .groupBy("kidx", "k").agg(min("doc_id").as("min_id"))
      .write.mode("overwrite").parquet(s"$path/keys")
    java.nio.file.Files.write(java.nio.file.Paths.get(path).resolve("params"),
      s"nBuckets=$nBuckets keyCols=${keyCols.mkString(",")}".getBytes("UTF-8"))
  }

  /** The current label table (doc_id, component, carried…, cbucket). */
  def readLabels(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.parquet(s"$path/labels")
    val carried = raw.columns.filterNot(Set("doc_id", "component", "cbucket"))
    raw.select((col("doc_id").cast("long").as("doc_id") +:
      col("component").cast("long").as("component") +:
      carried.map(col).toSeq :+
      col("cbucket").cast("int").as("cbucket")): _*)
  }

  /** Carried column names of a label frame (schema-derived). */
  private def carriedCols(labels: DataFrame): Seq[String] =
    labels.columns.filterNot(Set("doc_id", "component", "cbucket")).toSeq

  private def requireParams(path: String, nBuckets: Int, keyCols: Seq[String]): Unit = {
    val p = java.nio.file.Paths.get(path).resolve("params")
    require(java.nio.file.Files.exists(p),
      s"no params file at $path — not a writeState artifact")
    val stored = new String(java.nio.file.Files.readAllBytes(p), "UTF-8").trim
    val probe = s"nBuckets=$nBuckets keyCols=${keyCols.mkString(",")}"
    require(stored == probe,
      s"cluster state at $path was built with [$stored] but probed with " +
        s"[$probe] — a mismatched bucket count would scatter components " +
        "across wrong partitions; rebuild or re-probe")
  }

  /** Fold one delta batch into the persisted label store. Delta ids
    * must be disjoint from the corpus's (the [[IncrementalDedup]]
    * contract). Updates `labels/` in place: one partitioned write to a
    * scratch dir, then per-directory renames swap the touched buckets —
    * per-partition commit atomicity, the same contract as dynamic
    * partition overwrite; a transactional table format layers
    * whole-snapshot atomicity on top in a production deployment. */
  def applyDelta(spark: SparkSession, path: String, delta: DataFrame,
      idCol: String, keyCols: Seq[String], nBuckets: Int = 64): Unit = {
    val dbg = sys.env.contains("GRAFT_CC_DEBUG")
    val t0 = System.nanoTime()
    def mark(l: String): Unit = if (dbg)
      println(f"[inccc] $l at ${(System.nanoTime() - t0) / 1e9}%.2f s")
    requireParams(path, nBuckets, keyCols)

    // 1. delta keys + per-key delta min (for keys the corpus has never
    // seen, the delta's own min is the star root). Cached across the
    // SEVERAL actions this fold runs (micro-CC's internal rounds, the
    // touched-bucket collect, the rewrite write, the key append) —
    // cacheFor over-counts deliberately; surplus registrations are
    // epoch-swept. Slim rows.
    val dk = Persists.cacheFor(keyRows(delta, idCol, keyCols), actions = 6)
    val wk = Window.partitionBy("kidx", "k")
    val dmin = dk.select(col("kidx"), col("k"), col("doc_id"),
      min("doc_id").over(wk).as("dmin"))

    // 2. corpus star-roots for delta-touched keys only: the slim index
    // streams through a broadcast semi-join — never shuffles. The
    // surviving rows are bounded by the delta's key set, so THEY can
    // broadcast into the edge join below.
    val hit = spark.read.parquet(s"$path/keys")
      .join(broadcast(dk.select("kidx", "k").distinct()), Seq("kidx", "k"), "left_semi")

    // delta-involving edges: every delta key occurrence links its doc
    // to the key's star root (stored corpus min if known, else the
    // delta min). Exactly the edges batch keyEdges adds for the union's
    // key groups beyond the corpus-internal ones already contracted
    // into the persisted labels.
    val edges = Persists.cacheFor(
      dmin.join(broadcast(hit), Seq("kidx", "k"), "left")
        .select(coalesce(col("min_id"), col("dmin")).as("src"),
          col("doc_id").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct(), actions = 6)

    // 3. endpoint labels: only edge endpoints can be corpus docs (every
    // dst is a delta doc; srcs are stored corpus mins or delta mins).
    // The label store streams through a broadcast join on that small id
    // set — rows out are bounded by |edges|.
    val labels = readLabels(spark, path)
    // carried per-doc columns (schema-derived from the frame already in
    // scope — no second footer read): the delta must supply them too,
    // so folded rows stay uniform
    val carry = carriedCols(labels)
    carry.foreach(c => require(delta.columns.contains(c),
      s"label store at $path carries column '$c' but the delta lacks it"))
    val srcIds = edges.select(col("src").as("doc_id")).distinct()
    val srcLab = Persists.cacheFor(
      labels.join(broadcast(srcIds), Seq("doc_id"))
        .select(col("doc_id"), col("component")), actions = 6)

    // 4. micro-graph CC over labels: corpus endpoints collapse to their
    // component label (contraction preserves connectivity), delta ids
    // enter as themselves. Size = O(delta + touched clusters).
    val lEdges = edges
      .join(srcLab.select(col("doc_id").as("src"), col("component").as("src_lab")),
        Seq("src"), "left")
      .select(coalesce(col("src_lab"), col("src")).as("src"), col("dst"))
    val deltaIds = delta.select(col(idCol).cast("long").as("doc_id")).distinct()
    val nodes = lEdges.select(col("src").as("id"))
      .union(lEdges.select(col("dst").as("id")))
      .union(deltaIds.select(col("doc_id").as("id")))
      .distinct()
    mark("pre-micro-cc")
    // checkEvery=1: the micro graph is hub-contracted stars (corpus
    // components collapse to one node), so hub-min init usually IS the
    // fixpoint — measured changed=0 after init at sf0.1, where the
    // default bundling paid a second ~5 s bulk round for nothing
    val micro = Persists.cacheFor(
      ConnectedComponents.run(nodes, lEdges, checkEvery = 1), actions = 4)
    mark("post-micro-cc")

    // old corpus label → merged label, where it actually changed
    val remap = micro
      .join(broadcast(srcLab.select(col("component").as("id")).distinct()), Seq("id"))
      .filter(col("component") =!= col("id"))
      .select(col("id").as("old_component"), col("component").as("new_component"))
    // every delta doc's label (edge-less delta docs are their own
    // singleton component), with the delta's carried columns riding
    // along (O(delta) join)
    val deltaLab = deltaIds
      .join(micro.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("component"))
      .join(delta.select((col(idCol).cast("long").as("doc_id") +:
        carry.map(col)): _*), Seq("doc_id"), "left")

    // 5. touched buckets: where a remapped component lived, where a
    // merge target lives, where a delta row lands. Collect is
    // metadata-scale — at most nBuckets distinct values.
    val bkt = (c: org.apache.spark.sql.Column) =>
      pmod(c, lit(nBuckets.toLong)).cast("int")
    val touched = remap.select(bkt(col("old_component")).as("b"))
      .union(remap.select(bkt(col("new_component")).as("b")))
      .union(deltaLab.select(bkt(col("component")).as("b")))
      .distinct().collect().map(_.getInt(0)).toSeq.sorted
    mark("touched-collect")
    lastTouchedBuckets = touched.size
    if (touched.isEmpty) { // empty delta: nothing to fold
      Seq(dk, edges, srcLab, micro).foreach(_.unpersist())
      return
    }

    // literal isin → static partition pruning: untouched bucket
    // directories are never opened (the IvfIndex probe pattern)
    val old = labels.filter(col("cbucket").isin(touched: _*))
    val rewritten = old
      .join(broadcast(remap.withColumnRenamed("old_component", "component")),
        Seq("component"), "left")
      .select((col("doc_id") +:
        coalesce(col("new_component"), col("component")).as("component") +:
        carry.map(col)): _*)
      .unionByName(deltaLab)
      .withColumn("cbucket", bkt(col("component")))

    // ONE Spark write job: the rewritten rows land directory-shaped in
    // a scratch dir (repartition by cbucket → one file per touched
    // bucket, not |tasks|×|buckets| tiny files), then plain filesystem
    // renames swap the touched buckets in. This replaces the previous
    // stage-write + read-back + dynamic-overwrite pair (a second full
    // Spark job existed only because Spark refuses a write whose plan
    // reads the destination) AND the emptied-bucket collect: a touched
    // bucket with no output directory simply stays deleted. Atomicity
    // is per-directory rename — the same per-partition commit contract
    // the dynamic overwrite gave; a transactional table format layers
    // whole-snapshot atomicity on top in production.
    val stage = new java.io.File(s"$path/labels._stage")
    org.apache.commons.io.FileUtils.deleteQuietly(stage)
    rewritten.repartition(col("cbucket"))
      .write.partitionBy("cbucket").parquet(stage.toString)
    mark("stage-write")
    val outDirs = Option(stage.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.startsWith("cbucket="))
    touched.foreach { b =>
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(s"$path/labels/cbucket=$b"))
    }
    outDirs.foreach { d =>
      java.nio.file.Files.move(d.toPath,
        java.nio.file.Paths.get(s"$path/labels/${d.getName}"))
    }
    org.apache.commons.io.FileUtils.deleteQuietly(stage)

    // 6. keys introduced by THIS delta enter the index, so later folds
    // can connect through them (sequential-fold composition, spec test
    // 3). Their star root is the delta's own per-key min — a doc that
    // is in `labels/` as of this fold. Cache+count materializes the
    // rows BEFORE the append so the append's plan never reads the
    // directory it writes. O(delta) rows, append-only.
    // cacheFor(2): the count is itself an action — a single
    // registration would release the cache there and the append would
    // re-read keys/ mid-write (the self-read hazard the cache exists
    // to prevent)
    val newKeys = Persists.cacheFor(
      dk.groupBy("kidx", "k").agg(min("doc_id").as("min_id"))
        .join(broadcast(hit.select("kidx", "k")), Seq("kidx", "k"), "left_anti"),
      actions = 2)
    mark("renames")
    if (newKeys.count() > 0)
      newKeys.write.mode("append").parquet(s"$path/keys")
    mark("key-append")
    Seq(dk, edges, srcLab, micro, newKeys).foreach(_.unpersist())
  }
}
