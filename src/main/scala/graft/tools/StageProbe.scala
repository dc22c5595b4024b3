package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolated, repeated measurement of the staged incremental folds —
  * the measurement harness VERDICT r11 task 1 asked for: each family's
  * state build + fold runs alone (fresh temp dirs per rep, n reps),
  * printing per-stage times per rep so a regression can be separated
  * from ambient host drift without reverse-engineering the full bench.
  *
  * Usage: `sbt "runMain graft.tools.StageProbe [family ...]"` with
  * SPARK_GRAFT_SF_DIR / SPARK_GRAFT_STAGE_RUNS (default 5).
  *
  * Every family also emits a machine-readable line
  * `PROBE_JSON {"probe":"<family>","reps":N,"stages":{label:[secs…]}}`
  * so drivers (the `ab` mode below, shell wrappers) never parse the
  * human-formatted columns.
  *
  * == A/B mode (r17, VERDICT r16 task 6) ==
  * `StageProbe ab <family> <pre-commit> [reps]` promotes the r16
  * same-host A/B triage recipe (git-checkout arm, interleaved reps,
  * committed per-rep vectors) into a tool: it materializes
  * `<pre-commit>` in a git worktree, builds BOTH arms with sbt, then
  * alternates single-rep probe JVMs pre/post (swapping which arm goes
  * first every rep, so a monotone host trend cannot masquerade as a
  * diff) and emits the paired per-stage vectors as ONE artifact
  * (stdout + target/stageprobe_ab_<family>.json). Fresh JVM per rep =
  * both arms equally cold — the comparison is arm-vs-arm, not
  * absolute. This settled r16 (daemonfloor 9.35 post vs 8.66 pre,
  * same hour → host, not diff) where control arithmetic could not.
  */
object StageProbe {

  /** Self-evaluating daemonfloor gate (VERDICT r17 task 2 — the
    * artifact used to adjudicate in prose). Two parts, anchors and
    * tolerances from [[graft.BandBudgets]]:
    *
    *  1. the SCALE.md r17 gate as pass booleans: min(drain_1batch) /
    *     min(drain_3batch) within `drainTolerance` ABOVE the r14/r15
    *     quiet-host anchors (a lower reading is a faster host) —
    *     [reading, limit, pass] triples + `pass`;
    *  2. the quiet-session detector: two CONSECUTIVE reps whose
    *     1-batch AND 3-batch drains agree within `quietTolerance` and
    *     sit at anchor level. When it fires, the intercept read from
    *     that window — f = (min d3 − min d1)/2 over the quiet pair —
    *     is a valid floor measurement, recorded with its verdict
    *     against the ≤`interceptFloor` target so the floor stops
    *     being carried on r15's authority. When it never fires the
    *     artifact says so (`"fired":false`), which is itself the
    *     adjudication ("no quiet session this run").
    */
  private[tools] def daemonfloorGateJson(
      d1: Vector[Double], d3: Vector[Double]): String = {
    import graft.BandBudgets._
    require(d1.nonEmpty && d1.size == d3.size, "paired drain vectors required")
    val lim1 = drain1Anchor * (1 + drainTolerance)
    val lim3 = drain3Anchor * (1 + drainTolerance)
    val m1 = d1.min
    val m3 = d3.min
    def close(a: Double, b: Double, tol: Double) =
      math.max(a, b) / math.min(a, b) <= 1 + tol
    val quietIdx = (0 until d1.size - 1).find { i =>
      close(d1(i), d1(i + 1), quietTolerance) &&
        close(d3(i), d3(i + 1), quietTolerance) &&
        math.min(d1(i), d1(i + 1)) <= drain1Anchor * (1 + quietTolerance) &&
        math.min(d3(i), d3(i + 1)) <= drain3Anchor * (1 + quietTolerance)
    }
    val quietJson = quietIdx.map { i =>
      val f = (math.min(d3(i), d3(i + 1)) - math.min(d1(i), d1(i + 1))) / 2
      val confirmed = f <= interceptFloor
      s""""quiet":{"fired":true,"reps":[${i + 1},${i + 2}],"intercept_f":${f"$f%.2f"},"floor":$interceptFloor,"floor_confirmed":$confirmed}"""
    }.getOrElse(""""quiet":{"fired":false}""")
    val pass = m1 <= lim1 && m3 <= lim3
    s"""{"drain_1batch_min":[${f"$m1%.2f"},${f"$lim1%.2f"},${m1 <= lim1}],"drain_3batch_min":[${f"$m3%.2f"},${f"$lim3%.2f"},${m3 <= lim3}],"anchors":{"drain_1batch":$drain1Anchor,"drain_3batch":$drain3Anchor,"tolerance":$drainTolerance},"pass":$pass,$quietJson}"""
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("ab")) { runAb(args.drop(1)); return }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_STAGE_RUNS", "5").toInt)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.sqlext.GraftExtensions")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      // explicit-file reads (BucketStore.readExact/readChecked) pass
      // per-file root paths; above the default threshold (32) Spark
      // spawns a distributed listing JOB per read -- pure scheduler
      // overhead on a local FS. (On a real cluster against object
      // storage the distributed listing is right; this is a local-mode
      // knob like maxPartitionBytes above.)
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "8192")
      // generated-class cache sized for the full query library
      // (r18; measured in Bench.scala - same rationale)
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "5000"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.model.Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text")
    val families = if (args.nonEmpty) args.toSet else Set("spans", "clusters")

    // per-family per-label sample vectors, for the PROBE_JSON lines
    val recorded = scala.collection.mutable.LinkedHashMap[
      String, scala.collection.mutable.LinkedHashMap[String, Vector[Double]]]()
    // daemonfloor's self-evaluated gate, emitted as the final stdout
    // act and as target/stageprobe_daemonfloor.json
    var daemonfloorGate: Option[String] = None
    var currentFamily = ""
    def record(label: String, t: Double): Unit = {
      val per = recorded.getOrElseUpdate(currentFamily,
        scala.collection.mutable.LinkedHashMap())
      per(label) = per.getOrElse(label, Vector.empty) :+ t
    }

    def tmp(prefix: String): String = {
      val p = java.nio.file.Files.createTempDirectory(prefix)
      p.toString
    }
    def timed(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val t = (System.nanoTime() - t0) / 1e9
      println(f"  $label%-14s $t%8.2f s")
      record(label, t)
      t
    }

    if (families("spans")) {
      currentFamily = "spans"
      println(s"== spans (n=$reps) ==")
      for (r <- 1 to reps) {
        val p = tmp("probe_spans")
        println(s" rep $r")
        timed("write_state") { graft.ops.IncrementalSpans.writeState(
          docs.filter(col("doc_id") % 10 =!= 7).select("doc_id", "text"), p) }
        timed("fold") { graft.ops.IncrementalSpans.applyDelta(
          spark, p, docs.filter(col("doc_id") % 10 === 7)) }
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
      }
    }

    if (families("clusters")) {
      currentFamily = "clusters"
      println(s"== clusters (n=$reps) ==")
      for (r <- 1 to reps) {
        val p = tmp("probe_clusters")
        println(s" rep $r")
        val quality = graft.ops.TextOps.textStats(docs)
          .select(col("doc_id"), col("quality_score"))
        val keyed = graft.ExtQueries.clusterKeyedOf(docs).join(quality, "doc_id")
        timed("write_state") { graft.ops.IncrementalClusters.writeState(
          keyed.filter(col("doc_id") % 10 =!= 7), "doc_id", Seq("k1", "k2"),
          p, carryCols = Seq("quality_score")) }
        timed("fold") { graft.ops.IncrementalClusters.applyDelta(spark, p,
          keyed.filter(col("doc_id") % 10 === 7), "doc_id", Seq("k1", "k2")) }
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
      }
    }

    if (families("segments")) {
      currentFamily = "segments"
      println(s"== segments (n=$reps) ==")
      for (r <- 1 to reps) {
        val p = tmp("probe_segs")
        println(s" rep $r")
        val t = docs.stat.approxQuantile("doc_id", Array(0.25, 0.5, 0.75), 0.01)
          .map(_.toLong)
        timed("write_state") { graft.ops.IncrementalSegments.writeState(
          docs.filter(col("doc_id") < t(0)), s"$p/state") }
        timed("fold") {
          Seq(
            docs.filter(col("doc_id") >= t(0) && col("doc_id") < t(1)),
            docs.filter(col("doc_id") >= t(1) && col("doc_id") < t(2)),
            docs.filter(col("doc_id") >= t(2)))
            .zipWithIndex.foreach { case (b, i) =>
              graft.ops.IncrementalSegments.applyDelta(spark, s"$p/state", b,
                foldId = Some(s"b$i"))
            }
        }
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
      }
    }

    // Daemon per-batch fixed-cost floor (r13, VERDICT r12 task 4): the
    // SAME stream corpus drained as ONE microbatch vs THREE through the
    // full 9-family ContinuousIngest. Volume work is identical in both
    // arms, so with t(n) = n·f + v the per-batch fixed cost is the
    // intercept f = (t3 − t1) / 2 — the measured floor for a 3-batch
    // stream_fold is then 3f + v = t3 by construction, and f tells how
    // much of it no data-side optimization can remove.
    // CAVEAT (ADVICE r13): f is not PURE scheduler/commit cost — each
    // fold's store-proportional guard reads (new-ids semi-joins,
    // carry-over relinking) run against a store that GROWS across the
    // 3-batch arm's folds, and three such scans happen instead of one,
    // so the intercept slightly overstates the irreducible fixed cost.
    // The seed corpus (1/4 of sf0.1 docs) keeps that term small but
    // not zero; read f as an upper bound.
    if (families("daemonfloor")) {
      currentFamily = "daemonfloor"
      println(s"== daemon fixed-cost floor: 1 vs 3 microbatches (n=$reps) ==")
      val allDocs = graft.model.Tables.documents(spark, sfDir)
      val keyedOf = (df: org.apache.spark.sql.DataFrame) =>
        graft.ExtQueries.clusterKeyedOf(df)
          .join(graft.ops.TextOps.textStats(df)
            .select(col("doc_id"), col("quality_score")), "doc_id")
      def drain(nBatches: Int): Double = {
        val p = tmp("probe_floor")
        val corpus = allDocs.filter(col("doc_id") % 4 === 0)
        graft.ops.IncrementalDedup.writeIndex(corpus, s"$p/index")
        graft.ops.IncrementalClusters.writeState(keyedOf(corpus), "doc_id",
          Seq("k1", "k2"), s"$p/state", carryCols = Seq("quality_score"))
        graft.ops.DriftStore.writeProfile(corpus, s"$p/drift")
        graft.ops.IncrementalSpans.writeState(
          corpus.select("doc_id", "text"), s"$p/spans")
        graft.ops.IncrementalSegments.writeState(
          corpus.select("doc_id", "source", "text"), s"$p/segs")
        graft.ops.Bm25Index.writeState(
          corpus.select("doc_id", "source", "text"), s"$p/bm25")
        val dsirPred = col("lang") === "en"
        graft.ops.DsirStore.writeCounts(corpus, dsirPred, s"$p/dsir")
        graft.ops.FingerprintStore.writeState(
          corpus.select("doc_id", "source", "text"), s"$p/fps")
        val cat = new graft.api.MetricViewCatalog(spark,
          { case "documents" => allDocs; case n => sys.error(s"no source $n") },
          Some(s"$p/metrics"))
        val mv = cat.createOrReplace("mv_corpus", graft.spec.Specs.corpusMetrics)
        val im = cat.incremental.get
        im.foldBatch(mv, corpus, foldId = Some("seed"))
        if (nBatches == 1)
          allDocs.filter(col("doc_id") % 4 =!= 0)
            .coalesce(1).write.parquet(s"$p/feed/b1")
        else (1 to 3).foreach(i => allDocs.filter(col("doc_id") % 4 === i)
          .coalesce(1).write.parquet(s"$p/feed/b$i"))
        val stream = spark.readStream.schema(allDocs.schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$p/feed/b*")
        val t0 = System.nanoTime()
        val n = graft.streaming.ContinuousIngest.run(stream,
          s"$p/index", s"$p/state", s"$p/pairs", s"$p/drift", s"$p/spans",
          keyedOf, metrics = Some((mv, im)),
          segmentsRoot = Some(s"$p/segs"), bm25Root = Some(s"$p/bm25"),
          dsir = Some((s"$p/dsir", dsirPred)),
          fingerprints = Some(s"$p/fps"))
        val t = (System.nanoTime() - t0) / 1e9
        require(n == nBatches, s"expected $nBatches batches, got $n")
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
        t
      }
      val oneB = scala.collection.mutable.ArrayBuffer[Double]()
      val threeB = scala.collection.mutable.ArrayBuffer[Double]()
      for (r <- 1 to reps) {
        println(s" rep $r")
        val t1 = drain(1); println(f"  drain_1batch  $t1%8.2f s")
        val t3 = drain(3); println(f"  drain_3batch  $t3%8.2f s")
        println(f"  intercept/batch ${(t3 - t1) / 2}%6.2f s")
        record("drain_1batch", t1)
        record("drain_3batch", t3)
        record("intercept", (t3 - t1) / 2)
        oneB += t1; threeB += t3
      }
      def med(v: Seq[Double]) = v.sorted.apply(v.size / 2)
      println(f"medians: 1-batch ${med(oneB.toSeq)}%.2f s, " +
        f"3-batch ${med(threeB.toSeq)}%.2f s, " +
        f"fixed cost/batch ${(med(threeB.toSeq) - med(oneB.toSeq)) / 2}%.2f s")
      // self-evaluating gate + quiet-session detector (VERDICT r17
      // task 2) — written to its own artifact file and queued for the
      // final stdout line (after PROBE_JSON, Spark quiesced)
      daemonfloorGate = Some(daemonfloorGateJson(oneB.toVector, threeB.toVector))
    }

    if (families("streamcur")) {
      currentFamily = "streamcur"
      println(s"== stream_curation (n=$reps) ==")
      for (r <- 1 to reps) {
        graft.ExtQueries.clearStaging()
        graft.ExtQueries.stageTimings.clear()
        println(s" rep $r")
        timed("total") { graft.ExtQueries.streamCuration(spark, sfDir)
          .write.format("noop").mode("overwrite").save() }
        graft.ExtQueries.stageTimings.get("q_stream_curation").foreach(_.foreach {
          case (k, v) =>
            println(f"  $k%-18s $v%8.2f s")
            record(k, v)
        })
      }
    }

    if (families("bm25")) {
      currentFamily = "bm25"
      println(s"== bm25 (n=$reps) ==")
      for (r <- 1 to reps) {
        val p = tmp("probe_bm25")
        println(s" rep $r")
        val t = docs.stat.approxQuantile("doc_id", Array(0.25, 0.5, 0.75), 0.01)
          .map(_.toLong)
        timed("write_state") { graft.ops.Bm25Index.writeState(
          docs.filter(col("doc_id") < t(0)), s"$p/state") }
        // per-batch fold timing WITH the compaction count that rode
        // inside it (r14, VERDICT r13 task 6): the dedicated-pass fold
        // samples spanned 5.8–16.6 s — this separates compaction reps
        // (buckets crossing compactAt trigger a corpus-bucket rewrite)
        // from data-only folds without changing the measured op.
        var foldTotal = 0.0
        Seq(
          docs.filter(col("doc_id") >= t(0) && col("doc_id") < t(1)),
          docs.filter(col("doc_id") >= t(1) && col("doc_id") < t(2)),
          docs.filter(col("doc_id") >= t(2)))
          .zipWithIndex.foreach { case (b, i) =>
            val c0 = graft.ops.BucketStore.compactedBuckets.sum()
            foldTotal += timed(s"fold_b${i + 1}") {
              graft.ops.Bm25Index.applyDelta(spark, s"$p/state", b,
                foldId = Some(s"b$i"))
            }
            val dc = graft.ops.BucketStore.compactedBuckets.sum() - c0
            println(f"  compacted_buckets_b${i + 1}%-1s $dc%6d")
          }
        println(f"  fold          $foldTotal%8.2f s")
        record("fold", foldTotal)
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
      }
    }

    spark.stop()
    // machine-readable per-family lines, last so no fold output follows
    recorded.foreach { case (fam, stages) =>
      val st = stages.map { case (k, v) =>
        "\"" + k + "\":" + v.map(x => f"$x%.3f").mkString("[", ",", "]")
      }.mkString("{", ",", "}")
      println(s"""PROBE_JSON {"probe":"$fam","reps":$reps,"stages":$st}""")
    }
    daemonfloorGate.foreach { gate =>
      val runsJson = recorded.get("daemonfloor").map(_.map { case (k, v) =>
        "\"" + k + "\":" + v.map(x => f"$x%.3f").mkString("[", ",", "]")
      }.mkString("{", ",", "}")).getOrElse("{}")
      val json =
        s"""{"metric":"daemonfloor_gate","reps":$reps,"runs":$runsJson,"gate":$gate}"""
      val out = java.nio.file.Paths.get("target/stageprobe_daemonfloor.json")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.writeString(out, json + "\n")
      println(s"DAEMONFLOOR_JSON $json")
    }
  }

  // ---------------------------------------------------------------
  // A/B mode
  // ---------------------------------------------------------------

  /** Matches build.sbt's jdk17AddOpens — Spark 4.x on JDK 17 needs
    * these when SparkSession is created outside spark-submit. */
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def sh(cwd: java.io.File, cmd: String*): String = {
    val pb = new ProcessBuilder(cmd: _*)
    pb.directory(cwd)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    val rc = proc.waitFor()
    require(rc == 0, s"${cmd.mkString(" ")} failed (rc=$rc):\n${out.takeRight(2000)}")
    out
  }

  /** One single-rep probe JVM against `classesDir`'s build; returns the
    * family's per-stage map parsed from the human-formatted
    * `  <label>  <secs> s` lines — NOT the PROBE_JSON line, because the
    * PRE arm runs the probe class from ITS OWN commit, which may
    * predate PROBE_JSON; the column format has been stable since r11
    * and prints identically on both arms. Labels are unique within a
    * single-rep run (the only mode ab launches). */
  private def probeOnce(classesDir: String, family: String): Map[String, Double] = {
    val java = System.getProperty("java.home") + "/bin/java"
    val cmd = Seq(java) ++ addOpens ++ Seq(
      s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
      "-Dspark.ui.enabled=false",
      "-cp", s"$classesDir:/opt/spark/jars/*",
      "graft.tools.StageProbe", family)
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("SPARK_GRAFT_STAGE_RUNS", "1")
    sys.env.get("SPARK_GRAFT_SF_DIR").foreach(
      pb.environment().put("SPARK_GRAFT_SF_DIR", _))
    // child stderr (Spark logs) flows to ours live; stdout is captured
    pb.redirectError(ProcessBuilder.Redirect.INHERIT)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    val rc = proc.waitFor()
    require(rc == 0, s"probe JVM failed (rc=$rc):\n${out.takeRight(2000)}")
    val timedLine = "^  (\\S+)\\s+(-?[0-9.]+) s$".r
    val pairs = out.linesIterator.collect {
      case timedLine(label, secs) => label -> secs.toDouble
    }.toVector
    require(pairs.nonEmpty, s"no timed stage lines for $family in probe output:\n" +
      out.takeRight(1500))
    // duplicate labels (shouldn't happen at STAGE_RUNS=1) get indexed
    // rather than silently overwritten
    val seen = scala.collection.mutable.HashMap[String, Int]()
    pairs.map { case (label, v) =>
      val n = seen.updateWith(label)(c => Some(c.getOrElse(0) + 1)).get
      (if (n == 1) label else s"$label#$n") -> v
    }.toMap
  }

  private def runAb(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: StageProbe ab <family> <pre-commit> [reps]")
    val family = args(0)
    val preCommit = args(1)
    val reps = math.max(1,
      args.lift(2).orElse(sys.env.get("SPARK_GRAFT_STAGE_RUNS"))
        .getOrElse("5").toInt)
    val repo = new java.io.File(".").getCanonicalFile
    val preSha = sh(repo, "git", "rev-parse", preCommit).trim
    val postSha = sh(repo, "git", "rev-parse", "HEAD").trim
    require(preSha != postSha, "pre-commit resolves to HEAD — nothing to A/B")
    val preDir = new java.io.File(repo, s"target/ab_worktree_${preSha.take(12)}")
    if (!new java.io.File(preDir, "build.sbt").exists()) {
      // -f tolerates a stale registration from a deleted target/
      sh(repo, "git", "worktree", "add", "--detach", "-f",
        preDir.getAbsolutePath, preSha)
    }
    println(s"[ab] building pre arm ($preSha) ...")
    sh(preDir, "sbt", "-batch", "compile")
    println(s"[ab] building post arm ($postSha) ...")
    sh(repo, "sbt", "-batch", "compile")
    val preCp = s"${preDir.getAbsolutePath}/target/scala-2.13/classes"
    val postCp = s"${repo.getAbsolutePath}/target/scala-2.13/classes"

    val pre = scala.collection.mutable.LinkedHashMap[String, Vector[Double]]()
    val post = scala.collection.mutable.LinkedHashMap[String, Vector[Double]]()
    def add(into: scala.collection.mutable.LinkedHashMap[String, Vector[Double]],
        m: Map[String, Double]): Unit =
      m.foreach { case (k, v) => into(k) = into.getOrElse(k, Vector.empty) :+ v }
    for (r <- 1 to reps) {
      // swap which arm goes first every rep: a monotone host trend then
      // penalizes each arm equally instead of always the second one
      val order = if (r % 2 == 1) Seq(("pre", preCp), ("post", postCp))
                  else Seq(("post", postCp), ("pre", preCp))
      order.foreach { case (arm, cp) =>
        println(s"[ab] rep $r $arm")
        val m = probeOnce(cp, family)
        if (arm == "pre") add(pre, m) else add(post, m)
      }
    }
    def med(v: Vector[Double]): Double = {
      val s = v.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    def js(m: scala.collection.mutable.LinkedHashMap[String, Vector[Double]]) =
      m.map { case (k, v) =>
        "\"" + k + "\":" + v.map(x => f"$x%.3f").mkString("[", ",", "]")
      }.mkString("{", ",", "}")
    val ratios = post.keys.filter(pre.contains).map { k =>
      "\"" + k + "\":" + f"${med(post(k)) / med(pre(k))}%.3f"
    }.mkString("{", ",", "}")
    val json =
      s"""{"metric":"stageprobe_ab","family":"$family","pre":"$preSha","post":"$postSha","reps":$reps,"pre_stages":${js(pre)},"post_stages":${js(post)},"post_over_pre_median":$ratios}"""
    val out = java.nio.file.Paths.get(s"target/stageprobe_ab_$family.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.writeString(out, json + "\n")
    println(json)
  }
}
