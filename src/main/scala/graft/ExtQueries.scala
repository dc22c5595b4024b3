package graft

import graft.model.Tables
import graft.ops._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data-pipeline + classic-analytics queries (builder brief:
  * dedup / text analysis / sessionization as first-class operators, and
  * TPC-H-shaped aggregations as bench headliners). */
object ExtQueries {

  // ------------------------------------------------------------ text analysis

  /** Token counting + quality scoring over documents (per-row HOFs,
    * fully codegen'd — no shuffle).
    *
    * Sorted BEFORE the stats projection (r18, guide §7.2 duplicated
    * subtrees): a global orderBy's range-partitioning pass samples its
    * CHILD, so `project-then-sort` evaluated the whole stats
    * expression tree twice per run (once for boundary sampling, once
    * for real). Sorting the slim (doc_id, text) scan first and
    * projecting after the exchange computes the stats exactly once;
    * doc_id is unique, so row order — and the hash oracle — are
    * unchanged. */
  def textStats(s: SparkSession, dir: String): DataFrame =
    TextOps.textStats(
        Tables.documents(s, dir).select("doc_id", "text").orderBy("doc_id"))
      .select("doc_id", "token_count", "bpe_token_count", "char_count",
        "avg_token_len", "punct_ratio", "digit_ratio", "stopword_ratio",
        "quality_score")

  val textStatsSql: String =
    """WITH toks AS (
      |  SELECT doc_id, text,
      |         string_split_regex(trim(text), '[ \t\n\x0B\f\r]+') AS tk
      |  FROM documents
      |), stats AS (
      |  SELECT doc_id,
      |         len(tk) AS token_count,
      |         len(regexp_extract_all(text, '''(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^ \t\n\x0B\f\r\p{L}\p{N}]+')) AS bpe_token_count,
      |         length(text) AS char_count,
      |         round(CAST(list_sum(list_transform(tk, w -> length(w))) AS DOUBLE) / len(tk), 6) AS avg_token_len,
      |         round(CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) / length(text), 6) AS punct_ratio,
      |         round(CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / length(text), 6) AS digit_ratio,
      |         round(CAST(len(list_filter(tk, w -> list_contains(['the','a','an','of','and','or','is','are','in','on','to','it','this','that','with','for','as','at','by','be'], w))) AS DOUBLE) / len(tk), 6) AS stopword_ratio
      |  FROM toks
      |)
      |SELECT doc_id, token_count, bpe_token_count,
      |       char_count, avg_token_len, punct_ratio,
      |       digit_ratio, stopword_ratio,
      |       round(least(1.0, greatest(0.0,
      |         0.15 * ln(1.0 + token_count)
      |         - 2.0 * punct_ratio - 2.0 * digit_ratio
      |         - abs(stopword_ratio - 0.35))), 6) AS quality_score
      |FROM stats ORDER BY doc_id""".stripMargin

  /** Content fingerprinting (md5 over normalized text) + exact dedup. */
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    TextOps.exactDedup(Tables.documents(s, dir)).orderBy("keep_id")

  val dedupExactSql: String =
    """SELECT md5(regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g')) AS fingerprint,
      |       min(doc_id) AS keep_id, count(*) AS copies
      |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin

  /** Corpus distribution-drift monitor: per-source total-variation
    * distance of BOTH the document-length distribution (histogram
    * sketch) and the language mix (exact small-domain counts — the
    * other thing crawl snapshots break, r9) against the whole corpus —
    * the check a training-data pipeline runs per crawl snapshot. STILL
    * one scan of the corpus: the single pass aggregates at
    * (source, lang) grain — count + histogram partial — and everything
    * coarser re-aggregates from those mergeable partials
    * (graft_hist_merge for the sketches, sum for the counts; never a
    * second pass). Length TVD is the bit-exact GraftHistTvd scalar (no
    * logs, unlike KL/PSI, so the oracle matches to the last ulp); lang
    * TVD keeps cross-engine exactness differently — the sum runs in
    * INTEGER arithmetic (Σ|c·G − g·T| is order-free; decimal(38)/
    * HUGEINT so 100 TB-scale products can't overflow) and floating
    * point enters only in the final single division. At 100 TB the
    * post-scan rows are |sources|·|langs| × bins longs — the monitor's
    * cost IS the one corpus scan. */
  def drift(s: SparkSession, dir: String): DataFrame =
    driftFromProfile(graft.ops.DriftStore.profileOf(Tables.documents(s, dir)))

  /** The monitor body over a (source, lang) profile — shared by the
    * batch path (profile computed in-scan) and the incremental path
    * (profile replayed from the persisted [[graft.ops.DriftStore]]). */
  private def driftFromProfile(profile: DataFrame): DataFrame = {
    // cached: referenced three times (per-source rollup, global lang
    // counts, global total) and self-joined subplans are not deduped —
    // without the cache the corpus would scan repeatedly.
    // |sources|·|langs| rows of bins longs, tiny.
    // lang normalized null→'' BEFORE grouping (DriftStore.profileOf):
    // the dense-grid left join below uses null-unsafe equality, so a
    // NULL lang group would count as 0 in the numerator while its docs
    // exist (and the oracle would drop the row entirely) — both
    // engines fold NULL into ''
    val byLang = graft.ops.Persists.cache(profile)
    val perSource = graft.ops.Persists.cache(byLang
      .groupBy("source")
      .agg(sum("c").as("doc_count"), expr("graft_hist_merge(h)").as("h")))
    val globalHist = perSource.agg(expr("graft_hist_merge(h)").as("g"),
      sum("doc_count").as("gt"))
    val globalLang = byLang.groupBy("lang").agg(sum("c").as("gc"))
    // dense (source, lang) grid: a lang ABSENT from a source still
    // contributes |0 − p_global(lang)| to that source's TVD. The grid
    // is metadata-scale (distinct sources × distinct langs).
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val langNum = perSource.select(col("source"), col("doc_count"))
      .crossJoin(broadcast(globalLang))
      .join(byLang.select(col("source"), col("lang"), col("c")),
        Seq("source", "lang"), "left")
      .crossJoin(broadcast(globalHist.select(col("gt"))))
      .groupBy("source")
      .agg(sum(abs(dec(coalesce(col("c"), lit(0L))) * dec(col("gt"))
        - dec(col("gc")) * dec(col("doc_count")))).as("num"),
        first("doc_count").as("doc_count"), first("gt").as("gt"))
    perSource.crossJoin(broadcast(globalHist.select(col("g"))))
      .join(langNum.select(col("source"), col("num"), col("gt")), "source")
      .select(col("source"), col("doc_count"),
        expr("graft_hist_tvd(h, g)").as("length_drift_tvd"),
        (lit(0.5) * (col("num").cast("double") /
          (col("doc_count").cast("double") * col("gt").cast("double"))))
          .as("lang_drift_tvd"))
      .orderBy("source")
  }

  private val stagedDriftStore = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Incremental drift monitoring ([[graft.ops.DriftStore]]): docs with
    * `doc_id % 10 = 7` play the freshly-arrived crawl batch (the
    * incremental-dedup split), the rest the already-profiled corpus.
    * The baseline profile is written once, the delta FOLDS in with one
    * delta-only scan, and the monitor replays the folded store — the
    * oracle is the batch drift SQL over the full corpus, so the hash
    * gate IS the fold==rebuild contract. */
  def driftIncremental(s: SparkSession, dir: String): DataFrame = {
    val path = stagedTempDir(stagedDriftStore, dir, "graft_drift_store") { p =>
      val docs = Tables.documents(s, dir)
      val t0 = System.nanoTime()
      graft.ops.DriftStore.writeProfile(docs.filter(col("doc_id") % 10 =!= 7), p)
      val t1 = System.nanoTime()
      graft.ops.DriftStore.applyDelta(s, p, docs.filter(col("doc_id") % 10 === 7))
      stageTimings("q_drift_incremental") = Seq(
        "write_profile" -> (t1 - t0) / 1e9,
        "fold" -> (System.nanoTime() - t1) / 1e9)
    }
    driftFromProfile(graft.ops.DriftStore.profile(s, path))
  }

  /** DuckDB re-expression of GraftHistogram/GraftHistTvd: same clamped
    * binning, dense bin grid (zero bins contribute |0 − q|), and the
    * |p−q| fold in ascending bin order (double addition is order-
    * sensitive; list_reduce replicates the engine's loop). */
  val driftSql: String =
    """WITH hb AS (
      |  SELECT source,
      |         CAST(least(127, greatest(0,
      |           floor(((CAST(n_chars AS DOUBLE) - 0.0) / (1024.0 - 0.0)) * 128.0)
      |         )) AS BIGINT) AS bin
      |  FROM documents
      |), sc AS (
      |  SELECT source, bin, count(*) AS c FROM hb GROUP BY 1, 2
      |), gc AS (
      |  SELECT bin, count(*) AS c FROM hb GROUP BY 1
      |), st AS (
      |  SELECT source, count(*) AS t FROM hb GROUP BY 1
      |), gt AS (
      |  SELECT count(*) AS t FROM hb
      |), diffs AS (
      |  SELECT g.source, g.bin,
      |         abs(CAST(coalesce(sc.c, 0) AS DOUBLE) / CAST(st.t AS DOUBLE)
      |             - CAST(coalesce(gc.c, 0) AS DOUBLE) / CAST(gt.t AS DOUBLE)) AS d
      |  FROM (SELECT s.source, b.bin
      |        FROM (SELECT DISTINCT source FROM documents) s
      |        CROSS JOIN (SELECT unnest(range(0, 128)) AS bin) b) g
      |  JOIN st ON st.source = g.source
      |  CROSS JOIN gt
      |  LEFT JOIN sc ON sc.source = g.source AND sc.bin = g.bin
      |  LEFT JOIN gc ON gc.bin = g.bin
      |), folded AS (
      |  SELECT source,
      |         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |           list(d ORDER BY bin)), (acc, x) -> acc + x) AS sm
      |  FROM diffs GROUP BY 1
      |), lc AS (
      |  -- NULL lang folds into '' (mirrors the engine's coalesce — a
      |  -- null-keyed group would silently drop from the numerator)
      |  SELECT source, coalesce(lang, '') AS lang, count(*) AS c
      |  FROM documents GROUP BY 1, 2
      |), lgl AS (
      |  SELECT lang, sum(c) AS gc FROM lc GROUP BY 1
      |), lnum AS (
      |  -- integer TVD numerator: order-free HUGEINT sum, mirroring the
      |  -- engine's decimal(38) arithmetic; the dense grid charges langs
      |  -- absent from a source with |0 - p_global|
      |  SELECT g.source,
      |         sum(abs(CAST(coalesce(lc.c, 0) AS HUGEINT) * CAST(gt.t AS HUGEINT)
      |                 - CAST(lgl.gc AS HUGEINT) * CAST(st.t AS HUGEINT))) AS num
      |  FROM (SELECT s.source, l.lang
      |        FROM (SELECT DISTINCT source FROM documents) s
      |        CROSS JOIN (SELECT DISTINCT coalesce(lang, '') AS lang
      |                    FROM documents) l) g
      |  JOIN st ON st.source = g.source
      |  CROSS JOIN gt
      |  JOIN lgl ON lgl.lang = g.lang
      |  LEFT JOIN lc ON lc.source = g.source AND lc.lang = g.lang
      |  GROUP BY 1
      |)
      |SELECT f.source, st.t AS doc_count, 0.5 * f.sm AS length_drift_tvd,
      |       0.5 * (CAST(ln.num AS DOUBLE)
      |              / (CAST(st.t AS DOUBLE) * CAST(gt.t AS DOUBLE))) AS lang_drift_tvd
      |FROM folded f JOIN st USING (source) JOIN lnum ln ON ln.source = f.source
      |CROSS JOIN gt ORDER BY f.source""".stripMargin

  /** One-pass data-profile card over the documents corpus — the
    * Deequ-style table summary a pipeline materializes per snapshot:
    * per column, null count, HLL approx-distinct, and (numeric) the
    * histogram median, ALL computed in a single aggregation pass (one
    * corpus scan emits one wide row of sketch results; the per-column
    * unpivot explodes a 5-element array of structs driver-free). At
    * 100 TB profiling cost is the scan — composing every statistic
    * into one Aggregate is the difference between 1 pass and
    * |columns| passes. Oracled: HLL estimates re-derived per column
    * with the q_mv_approx register chain, the median with the shared
    * quantile derivation — all hash-exact. The numeric column also
    * reports the histogram's CLAMPED count (r9): values outside the
    * declared `[lo, hi)` domain whose position the sketch destroyed.
    * Nonzero here means the domain declaration is wrong and every
    * percentile over this column is suspect — the profile card is
    * where that mis-declaration becomes visible instead of silent.
    * (The two graft_hist_agg calls are ONE sketch at runtime: Spark's
    * physical aggregation deduplicates identical aggregate
    * expressions.) */
  def profile(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    val aggs = Seq(count(lit(1)).as("n_rows")) ++
      cols.flatMap { c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        expr(s"graft_hll_estimate(graft_hll_agg(cast($c as string)))")
          .as(s"${c}__distinct")) } ++
      Seq(expr("graft_hist_quantile(graft_hist_agg(n_chars, 0.0, 1024.0, 256), 0.5, 0.0, 1024.0)")
        .as("n_chars__p50"),
        expr("graft_hist_clamped(graft_hist_agg(n_chars, 0.0, 1024.0, 256))")
          .as("n_chars__clamped"))
    val wide = docs.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      val numeric = c == "n_chars"
      val p50 = if (numeric) col("n_chars__p50") else lit(null).cast("double")
      val clamped = if (numeric) col("n_chars__clamped") else lit(null).cast("long")
      struct(lit(c).as("col_name"), col("n_rows"),
        col(s"${c}__nulls").as("n_nulls"),
        col(s"${c}__distinct").as("approx_distinct"), p50.as("p50"),
        clamped.as("n_clamped"))
    }
    wide.select(explode(array(rows: _*)).as("r")).select("r.*")
      .orderBy("col_name")
  }

  /** DuckDB scalar-subquery re-derivation of the engine HLL estimate
    * for one value expression — the shared register chain
    * ([[Queries.hllChainSql]]) at its global (keyless) grain. */
  private def hllEstimateSql(valExpr: String): String =
    s"(WITH ${Queries.hllChainSql(Seq(), "documents", valExpr)} SELECT approx FROM hll)"

  val profileSql: String = {
    // fold61 is char-based, so the text column carries the same ASCII
    // guard the dedup oracles use (error() beats a mystery mismatch)
    val textGuarded = "CASE WHEN text ~ '[^\\x00-\\x7F]' " +
      "THEN error('non-ASCII doc in profile oracle') ELSE text END"
    val exprs = Seq(
      "doc_id" -> "CAST(doc_id AS VARCHAR)",
      "text" -> textGuarded,
      "lang" -> "lang",
      "source" -> "source",
      "n_chars" -> "CAST(n_chars AS VARCHAR)")
    // the shared quantile generator at its global (keyless) grain
    val p50 =
      s"""(WITH hb AS (SELECT ${Queries.binSql("CAST(n_chars AS DOUBLE)", "0.0", "1024.0", 256)} AS bin
         |             FROM documents WHERE n_chars IS NOT NULL),
         |${Queries.quantileCtes(Seq(),
             "(SELECT bin, count(*) AS c FROM hb GROUP BY 1)",
             Seq("e" -> "0.5"), "0.0", "1024.0", 256)}
         |SELECT v FROM e)""".stripMargin
    // graft_hist_clamped mirror: out-of-domain ⟺ the UNclamped bin
    // index falls outside [0, bins−1] (GraftHistogram.rawBin)
    val clamped =
      """(SELECT count(*) FROM documents WHERE n_chars IS NOT NULL
        |  AND (floor(((CAST(n_chars AS DOUBLE) - 0.0) / (1024.0 - 0.0)) * 256.0) < 0
        |       OR floor(((CAST(n_chars AS DOUBLE) - 0.0) / (1024.0 - 0.0)) * 256.0) > 255))""".stripMargin
    val branches = exprs.map { case (name, ve) =>
      val p50Sql = if (name == "n_chars") p50 else "CAST(NULL AS DOUBLE)"
      val clampedSql = if (name == "n_chars") clamped else "CAST(NULL AS BIGINT)"
      s"""SELECT '$name' AS col_name,
         |       (SELECT count(*) FROM documents) AS n_rows,
         |       (SELECT count(*) FROM documents WHERE $name IS NULL) AS n_nulls,
         |       ${hllEstimateSql(ve)} AS approx_distinct,
         |       $p50Sql AS p50,
         |       $clampedSql AS n_clamped""".stripMargin
    }
    branches.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  /** Robust length-outlier filter — the CCNet/Gopher-style quality
    * gate: per language, Tukey fences (quartiles ± 1.5·IQR) derived
    * from the bounded histogram, then every doc flagged against its
    * language's fences. Quartiles from the sketch, not a sort: the
    * per-language stats are one aggregation over the corpus (|langs|
    * bin arrays), the flagging a broadcast join — no global sort, no
    * second scan shape that a percentile-rank filter would need at
    * 100 TB. Oracled bit-exactly: one quantileCtes call emits all
    * three quartile derivations, and the fence arithmetic is mirrored
    * op for op (pure +,−,×, no libm). */
  def outliers(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val stats = docs.groupBy("lang")
      .agg(expr("graft_hist_agg(n_chars, 0.0, 1024.0, 256)").as("h"))
      .select(col("lang"),
        expr("graft_hist_quantile(h, 0.25, 0.0, 1024.0)").as("q1"),
        expr("graft_hist_quantile(h, 0.5, 0.0, 1024.0)").as("med"),
        expr("graft_hist_quantile(h, 0.75, 0.0, 1024.0)").as("q3"))
    val x = col("n_chars").cast("double")
    val upper = col("q3") + (col("q3") - col("q1")) * lit(1.5)
    val lower = col("q1") - (col("q3") - col("q1")) * lit(1.5)
    docs.join(broadcast(stats), "lang")
      .select(col("doc_id"), col("lang"), col("n_chars"), col("med"),
        (x > upper || x < lower).as("is_outlier"))
      .orderBy("doc_id")
  }

  val outliersSql: String = {
    val counts = "(SELECT lang, bin, count(*) AS c FROM hb GROUP BY 1, 2)"
    s"""WITH hb AS (
       |  SELECT lang, ${Queries.binSql("CAST(n_chars AS DOUBLE)", "0.0", "1024.0", 256)} AS bin
       |  FROM documents
       |), """.stripMargin +
      Queries.quantileCtes(Seq("lang"), counts,
        Seq("e25" -> "0.25", "e50" -> "0.5", "e75" -> "0.75"),
        "0.0", "1024.0", 256) +
      """
        |SELECT d.doc_id, d.lang, d.n_chars, e50.v AS med,
        |       (CAST(d.n_chars AS DOUBLE) > e75.v + (e75.v - e25.v) * CAST(1.5 AS DOUBLE)
        |        OR CAST(d.n_chars AS DOUBLE) < e25.v - (e75.v - e25.v) * CAST(1.5 AS DOUBLE))
        |         AS is_outlier
        |FROM documents d
        |JOIN e25 USING (lang)
        |JOIN e50 USING (lang)
        |JOIN e75 USING (lang)
        |ORDER BY d.doc_id""".stripMargin
  }

  /** Language ID over documents (accuracy on real multilingual samples
    * is spec-tested; the marker-scoring contract itself is oracled —
    * the same marker sets + argmax fold re-expressed in DuckDB SQL). */
  def langId(s: SparkSession, dir: String): DataFrame =
    // sort-then-project (r18): see textStats — projecting langId before
    // the global orderBy evaluated the marker scans twice (range-bound
    // sampling re-runs the projection); doc_id is unique so the final
    // order is identical
    Tables.documents(s, dir)
      .select("doc_id", "text").orderBy("doc_id")
      .select(col("doc_id"), TextOps.langId(col("text")).as("lang_pred"))

  /** DuckDB re-expression of TextOps.langId: same marker sets, same
    * `score / (|tokens|+1)` arithmetic, same strict-improvement argmax
    * (first language in [en,de,fr,es,zh] order attaining the max wins;
    * max must clear the 0.005 'und' floor). */
  val langIdSql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |         string_split_regex(trim(lower(text)), '[ \t\n\x0B\f\r]+') AS tk,
      |         length(regexp_replace(text, '[^\x{4e00}-\x{9fff}]', '', 'g')) AS cjk,
      |         greatest(length(text), 1) AS tlen
      |  FROM documents
      |), s AS (
      |  SELECT doc_id,
      |    CAST(len(list_filter(tk, w -> list_contains(['the','a','of','and','is','to','in','that','it','for'], w))) AS DOUBLE) / (len(tk)+1) AS s_en,
      |    CAST(len(list_filter(tk, w -> list_contains(['der','die','das','und','ist','nicht','mit','ein','zu','den'], w))) AS DOUBLE) / (len(tk)+1) AS s_de,
      |    CAST(len(list_filter(tk, w -> list_contains(['le','la','les','et','est','un','une','des','que','pour'], w))) AS DOUBLE) / (len(tk)+1) AS s_fr,
      |    CAST(len(list_filter(tk, w -> list_contains(['el','la','los','las','y','es','un','una','que','por'], w))) AS DOUBLE) / (len(tk)+1) AS s_es,
      |    CAST(cjk AS DOUBLE) / tlen * 10.0 AS s_zh
      |  FROM t
      |)
      |SELECT doc_id,
      |  CASE WHEN greatest(s_en, s_de, s_fr, s_es, s_zh) <= 0.005 THEN 'und'
      |       WHEN s_en = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'en'
      |       WHEN s_de = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'de'
      |       WHEN s_fr = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'fr'
      |       WHEN s_es = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'es'
      |       ELSE 'zh' END AS lang_pred
      |FROM s ORDER BY doc_id""".stripMargin

  /** TF-IDF top-3 terms per document (keyword extraction — the
    * "characterize each doc by its distinguishing terms" profiling
    * stage). Scale shape: the document-frequency table is
    * vocabulary-sized (≪ corpus) and broadcast, as is the 1-row corpus
    * count; the corpus side is one (doc, word) shuffle with map-side
    * combine, then one window per doc for the top-k. ln matches DuckDB
    * at 6-dp rounding (same precedent as quality_score). */
  def tfidfTopTerms(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val tf = docs.select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(broadcast(dfreq), "word")
      .crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
    Sampling.topKPerGroup(scored, col("doc_id"), col("score"), col("word"), k = 3)
      .select("doc_id", "rk", "word", "score")
      .orderBy("doc_id", "rk")
  }

  val tfidfTopTermsSql: String =
    """WITH w AS (
      |  SELECT doc_id, string_split_regex(trim(text), '[ \t\n\x0B\f\r]+') AS ws FROM documents
      |), u AS (
      |  SELECT doc_id, unnest(ws) AS word FROM w
      |), tf AS (
      |  SELECT doc_id, word, count(*) AS tf FROM u GROUP BY 1, 2
      |), dfreq AS (
      |  SELECT word, count(*) AS df FROM tf GROUP BY 1
      |), n AS (
      |  SELECT count(*) AS n_docs FROM documents
      |), scored AS (
      |  SELECT tf.doc_id, tf.word,
      |         round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfreq.df), 6) AS score
      |  FROM tf JOIN dfreq USING (word) CROSS JOIN n
      |), ranked AS (
      |  SELECT doc_id, word, score,
      |         CAST(row_number() OVER (PARTITION BY doc_id
      |           ORDER BY score DESC, word ASC) AS INT) AS rk
      |  FROM scored
      |)
      |SELECT doc_id, rk, word, score FROM ranked
      |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin

  /** Gopher-style repetition signals (word-level duplicate/top-share/
    * adjacent-repeat) + threshold flag over documents. Oracled. */
  def repetition(s: SparkSession, dir: String): DataFrame =
    TextOps.repetitionStats(Tables.documents(s, dir)).orderBy("doc_id")

  val repetitionSql: String =
    """WITH w AS (
      |  SELECT doc_id, string_split_regex(trim(text), '[ \t\n\x0B\f\r]+') AS ws FROM documents
      |), base AS (
      |  SELECT doc_id, len(ws) AS n_words,
      |         round(1.0 - CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws), 6) AS dup_word_ratio,
      |         len(list_filter(range(2, len(ws) + 1), i -> ws[i] = ws[i-1])) AS adjacent_dup_count
      |  FROM w
      |), u AS (
      |  SELECT doc_id, unnest(ws) AS word FROM w
      |), c AS (
      |  SELECT doc_id, max(cnt) AS top FROM (
      |    SELECT doc_id, word, count(*) AS cnt FROM u GROUP BY doc_id, word
      |  ) GROUP BY doc_id
      |)
      |SELECT b.doc_id, b.n_words, b.dup_word_ratio,
      |       round(CAST(c.top AS DOUBLE) / b.n_words, 6) AS top_word_ratio,
      |       b.adjacent_dup_count,
      |       (b.dup_word_ratio > 0.8 OR round(CAST(c.top AS DOUBLE) / b.n_words, 6) > 0.2) AS flagged
      |FROM base b JOIN c USING (doc_id) ORDER BY b.doc_id""".stripMargin

  // ---------------------------------------------------------- sessionization

  /** Gap-based sessionization of the events table (30 min gap). */
  def sessionize(s: SparkSession, dir: String): DataFrame =
    Sessionize(Tables.events(s, dir))
      .select(col("user_id"), col("session_idx"), col("session_start"),
        col("session_end"), col("n_events"),
        col("total_value").cast("double").as("total_value"),
        col("n_clicks"), col("duration_s"))
      .orderBy("user_id", "session_idx")

  val sessionizeSql: String =
    """WITH flagged AS (
      |  SELECT user_id, ts, event_id, value, event_type,
      |         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
      |                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
      |              THEN 1 ELSE 0 END AS is_new
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), sessioned AS (
      |  SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
      |  FROM flagged
      |)
      |SELECT user_id, session_idx,
      |       min(ts) AS session_start, max(ts) AS session_end,
      |       count(*) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
      |       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_clicks,
      |       (epoch_us(max(ts)) - epoch_us(min(ts))) / 1e6 AS duration_s
      |FROM sessioned GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------- interval joins

  /** Purchase BURSTS (48 h-gap sessions over each user's purchase
    * events) shared by both interval-join queries. */
  private def bursts(ev: DataFrame, eventType: String, prefix: String): DataFrame =
    Sessionize(ev.filter(col("event_type") === eventType), gapSeconds = 172800L)
      .select(col("user_id"), col("session_idx").as(s"${prefix}_idx"),
        col("session_start").as(s"${prefix}_start"),
        col("session_end").as(s"${prefix}_end"))

  /** Error events inside each user's purchase bursts — the
    * point-in-interval range join
    * ([[graft.ops.IntervalJoin.pointInInterval]], day-wide bins, keyed
    * by user) aggregated to a per-burst error card. The oracle is the
    * NAIVE BETWEEN join over the same burst derivation, so the hash
    * gate proves the bin-bucketed equi-join plan loses and duplicates
    * nothing vs the quadratic plan it replaces. */
  def intervalJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchase = bursts(ev, "purchase", "p")
    val errs = ev.filter(col("event_type") === "error")
      .select("user_id", "event_id", "ts", "value")
    IntervalJoin.pointInInterval(errs, purchase, "ts",
        "p_start", "p_end", binWidth = 86400000000L, keys = Seq("user_id"))
      .groupBy(col("user_id"), col("p_idx").as("session_idx"))
      .agg(count(lit(1)).as("n_errors"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("err_value"),
        min("ts").as("first_error"))
      .orderBy("user_id", "session_idx")
  }

  /** Shared oracle CTE: the 48 h-gap burst windows for one event type
    * (the sessionize oracle's derivation, filtered and with µs gap
    * 172800000000). */
  private def burstCteSql(eventType: String, alias: String): String =
    s"""$alias AS (
      |  SELECT user_id,
      |         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx,
      |         ts
      |  FROM (
      |    SELECT user_id, ts, event_id,
      |           CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
      |                  OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 172800000000
      |                THEN 1 ELSE 0 END AS is_new
      |    FROM events WHERE event_type = '$eventType'
      |    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |  )
      |), ${alias}w AS (
      |  SELECT user_id, session_idx, min(ts) AS session_start, max(ts) AS session_end
      |  FROM $alias GROUP BY 1, 2
      |)""".stripMargin

  val intervalJoinSql: String =
    s"""WITH ${burstCteSql("purchase", "p")}
      |SELECT e.user_id, b.session_idx,
      |       count(*) AS n_errors,
      |       CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS err_value,
      |       min(e.ts) AS first_error
      |FROM events e JOIN pw b ON e.user_id = b.user_id
      |  AND e.ts >= b.session_start AND e.ts <= b.session_end
      |WHERE e.event_type = 'error'
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Left-outer interval enrichment: EVERY error event, with its
    * containing purchase-burst window where one exists (null window
    * columns otherwise) — [[graft.ops.IntervalJoin.pointInIntervalLeft]]
    * keyed on the event id. Oracle: the naive LEFT range join. */
  def intervalJoinLeft(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val errs = ev.filter(col("event_type") === "error")
      .select("user_id", "event_id", "ts")
    IntervalJoin.pointInIntervalLeft(errs, bursts(ev, "purchase", "p"),
        Seq("event_id"), "ts", "p_start", "p_end",
        binWidth = 86400000000L, keys = Seq("user_id"))
      .select(col("user_id"), col("event_id"), col("p_idx"),
        col("p_start"), col("p_end"))
      .orderBy("user_id", "event_id", "p_idx")
  }

  val intervalJoinLeftSql: String =
    s"""WITH ${burstCteSql("purchase", "p")}
      |SELECT e.user_id, e.event_id, b.session_idx AS p_idx,
      |       b.session_start AS p_start, b.session_end AS p_end
      |FROM events e LEFT JOIN pw b ON e.user_id = b.user_id
      |  AND e.ts >= b.session_start AND e.ts <= b.session_end
      |WHERE e.event_type = 'error'
      |ORDER BY 1, 2, 3""".stripMargin

  /** Overlapping (click-burst, view-burst) window pairs per user from
    * the interval-overlap range join
    * ([[graft.ops.IntervalJoin.intervalOverlap]] — both sides explode
    * to day bins, candidates dedup to the canonical shared bin), with
    * the exact overlap duration in integer-µs arithmetic. Oracle: the
    * naive O(n·m) overlap join over the same two burst CTEs. */
  def intervalOverlapQ(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    IntervalJoin.intervalOverlap(bursts(ev, "click", "c"), bursts(ev, "view", "v"),
        "c_start", "c_end", "v_start", "v_end",
        binWidth = 86400000000L, keys = Seq("user_id"))
      .select(col("user_id"), col("c_idx"), col("v_idx"),
        ((least(unix_micros(col("c_end")), unix_micros(col("v_end"))) -
          greatest(unix_micros(col("c_start")), unix_micros(col("v_start"))))
          / lit(1e6)).as("overlap_s"))
      .orderBy("user_id", "c_idx", "v_idx")
  }

  val intervalOverlapSql: String =
    s"""WITH ${burstCteSql("click", "c")},
      |${burstCteSql("view", "v")}
      |SELECT c.user_id, c.session_idx AS c_idx, v.session_idx AS v_idx,
      |       (least(epoch_us(c.session_end), epoch_us(v.session_end)) -
      |        greatest(epoch_us(c.session_start), epoch_us(v.session_start))) / 1e6
      |         AS overlap_s
      |FROM cw c JOIN vw v ON c.user_id = v.user_id
      |  AND c.session_start <= v.session_end
      |  AND v.session_start <= c.session_end
      |ORDER BY 1, 2, 3""".stripMargin

  /** The interval join through its SQL TVF surface
    * ([[graft.sqlext.OpsTvf]], r12 — VERDICT r11 task 7): the same
    * per-burst error card as q_interval_join, but the range join is
    * reached from pure SQL via `graft_interval_join(...)` over temp
    * views. Gated by the SAME oracle as the DataFrame path, so the
    * hash match proves SQL == DataFrame == naive BETWEEN join. */
  def sqlIntervalJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    bursts(ev, "purchase", "p").createOrReplaceTempView("graft_ij_purchase")
    ev.filter(col("event_type") === "error")
      .select("user_id", "event_id", "ts", "value")
      .createOrReplaceTempView("graft_ij_errors")
    s.sql(
      """SELECT user_id, p_idx AS session_idx, count(*) AS n_errors,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS err_value,
        |       min(ts) AS first_error
        |FROM graft_interval_join('graft_ij_errors', 'graft_ij_purchase',
        |  'ts', 'p_start', 'p_end', 86400000000, 'user_id')
        |GROUP BY user_id, p_idx
        |ORDER BY user_id, session_idx""".stripMargin)
  }

  /** Interval-overlap through its SQL TVF surface: the q_interval_
    * overlap card via `graft_interval_overlap(...)` over temp views —
    * same oracle as the DataFrame path (the naive quadratic overlap
    * join), so the hash gate proves all three agree. */
  def sqlIntervalOverlap(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    bursts(ev, "click", "c").createOrReplaceTempView("graft_io_click")
    bursts(ev, "view", "v").createOrReplaceTempView("graft_io_view")
    s.sql(
      """SELECT user_id, c_idx, v_idx,
        |       (least(unix_micros(c_end), unix_micros(v_end)) -
        |        greatest(unix_micros(c_start), unix_micros(v_start))) / 1e6
        |         AS overlap_s
        |FROM graft_interval_overlap('graft_io_click', 'graft_io_view',
        |  'c_start', 'c_end', 'v_start', 'v_end', 86400000000, 'user_id')
        |ORDER BY user_id, c_idx, v_idx""".stripMargin)
  }

  /** Exact-phrase search through its SQL TVF surface: q_phrase_search
    * via `graft_phrase(root, phrase)` — same raw-text oracle, so the
    * hash gate proves SQL == index-derived == text-derived. */
  def sqlPhrase(s: SparkSession, dir: String): DataFrame = {
    val path = stagedTempDir(stagedBm25Idx, dir, "graft_bm25_idx") { p =>
      Bm25Index.writeState(
        Tables.documents(s, dir).select("doc_id", "source", "text"), s"$p/state")
    }
    s.sql(
      s"""SELECT doc_id, source, n_hits
         |FROM graft_phrase('$path/state', 'small query line')
         |ORDER BY n_hits DESC, doc_id""".stripMargin)
  }

  /** BM25 retrieval through its SQL TVF surface ([[graft.sqlext
    * .OpsTvf]], r12): the q_bm25 rank card, but scored from the
    * persisted index via `graft_bm25(root, query)` in pure SQL — the
    * probe plan inherits the DataFrame path's bucket pruning. Same
    * oracle as q_bm25/q_bm25_indexed: SQL == indexed == batch. */
  def sqlBm25(s: SparkSession, dir: String): DataFrame = {
    val path = stagedTempDir(stagedBm25Idx, dir, "graft_bm25_idx") { p =>
      Bm25Index.writeState(
        Tables.documents(s, dir).select("doc_id", "source", "text"), s"$p/state")
    }
    s.sql(
      s"""SELECT rank, doc_id, source, n_terms, score FROM (
         |  SELECT doc_id, source, n_terms, score,
         |         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
         |  FROM graft_bm25('$path/state', '$Bm25Probe')
         |) WHERE rank <= 15 ORDER BY rank""".stripMargin)
  }

  /** Structured-Streaming surface in the driver contract: watermarked
    * tumbling-window agg over events driven by Trigger.AvailableNow into
    * a memory sink. The append-mode result IS deterministic — after the
    * final (empty) AvailableNow batch the watermark settles at
    * max(ts) - delay, and exactly the windows with
    * `window_end <= watermark` have been emitted — so it is oracled as
    * batch SQL with that cutoff (streaming == batch is additionally
    * spec-tested in StreamingSpec). */
  /** Staged copies of the events table for streaming reads, keyed by
    * source dir — written once per JVM so repeated invocations (bench
    * loops, verify) don't pay a full table re-write each call. */
  private val stagedEvents = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Stage as a SINGLE parquet file: the file stream source then has
    * exactly one file, so Trigger.AvailableNow processes all data in
    * one microbatch (initial watermark 0 → nothing is late, no state
    * evicted mid-stream) followed by the final empty batch that
    * settles the watermark. That makes BOTH streaming queries' final
    * states order-independent and batch-split-independent — the
    * property the DuckDB oracle needs. (Scan parallelism is unharmed:
    * the batch still splits by maxPartitionBytes.)
    *
    * The staged copy is shared ACROSS JVMs at a deterministic path
    * keyed by (source dir, source mtime): per-JVM temp dirs re-wrote
    * up to hundreds of MB per verify/bench/test JVM and accumulated in
    * /tmp forever. The mtime in the key invalidates the copy when a
    * (writable) fixture is regenerated; concurrent JVMs race benignly
    * — each stages into its own temp dir and the atomic rename's loser
    * just uses the winner's copy. */
  private[graft] def stageEvents(s: SparkSession, dir: String): String =
    stagedEvents.computeIfAbsent(dir, { d =>
      import java.nio.file.{Files, Paths, StandardCopyOption}
      val mtime = Files.getLastModifiedTime(Paths.get(s"$d/events.parquet")).toMillis
      // full MD5 of the (dir, mtime) pair — a 32-bit key could collide
      // across fixtures/regenerations and silently serve the wrong
      // events table (r5 review finding)
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$d:$mtime".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val target = Paths.get(System.getProperty("java.io.tmpdir"), s"graft_stage_events_$key")
      if (!Files.exists(target.resolve("_SUCCESS"))) {
        val tmp = Files.createTempDirectory("graft_stage_tmp")
        Tables.events(s, d).coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        try Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
        catch {
          case _: java.nio.file.FileAlreadyExistsException
             | _: java.nio.file.DirectoryNotEmptyException
             | _: java.nio.file.AccessDeniedException =>
            // concurrent staging won the rename; drop the loser's copy
            // instead of leaking it in /tmp
            org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)
        }
      }
      target.toString
    })

  /** State-store parallelism for the staged-fixture streaming queries
    * (r8): a streaming query's state-store count is frozen at first
    * start from shuffle.partitions, and EVERY store pays per-batch
    * commit + maintenance — so it must track expected state volume,
    * not the session's batch shuffle width. The whole staged horizon
    * here is tens of MB; 8 stores is already generous (measured:
    * q_stream_join 8.5 s → 2.7 s at sf0.1 vs 32 stores). An ingest
    * cluster sizes this ≈ cores via the session setting instead. */
  private val StreamParts = 8

  def streamWindow(s: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(s, dir)
    val tmp = stageEvents(s, dir)
    val sink = s"stream_win_${math.abs(dir.hashCode)}"
    graft.streaming.StreamingOps.runAvailableNow(
      graft.streaming.StreamingOps.windowedValue(
        s.readStream.schema(events.schema).parquet(tmp))
        .select(col("window_start"), col("event_type"), col("n_events"),
          col("total_value").cast("double").as("total_value")),
      sink, statePartitions = Some(StreamParts))
    s.table(sink).orderBy("window_start", "event_type")
  }

  /** DuckDB re-expression of the streaming query's deterministic final
    * state: 1-hour tumbling windows (epoch-aligned, same as Spark's
    * `window()`), emitted iff the window closed under the final
    * watermark max(ts) - 1h. */
  val streamWindowSql: String =
    """WITH m AS (SELECT max(ts) - INTERVAL '1 hour' AS wm FROM events),
      |w AS (
      |  SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
      |         count(*) AS n_events,
      |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |  FROM events GROUP BY 1, 2
      |)
      |SELECT window_start, event_type, n_events, total_value
      |FROM w, m WHERE window_start + INTERVAL '1 hour' <= wm
      |ORDER BY window_start, event_type""".stripMargin

  /** Streaming approx-percentile: the histogram sketch inside streaming
    * aggregation state (StreamingOps.windowedPercentile) — p50 event
    * value per closed 1-hour window. Same watermark-cutoff determinism
    * as q_stream_window; the oracle re-derives the bounded histogram
    * per (window, type) with the engine's binning/interpolation
    * arithmetic, so the streaming sketch is hash-gated end-to-end. */
  def streamPercentile(s: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(s, dir)
    val tmp = stageEvents(s, dir)
    val sink = s"stream_pct_${math.abs(dir.hashCode)}"
    graft.streaming.StreamingOps.runAvailableNow(
      graft.streaming.StreamingOps.windowedPercentile(
        s.readStream.schema(events.schema).parquet(tmp)),
      sink, statePartitions = Some(StreamParts))
    s.table(sink).orderBy("window_start", "event_type")
  }

  val streamPercentileSql: String =
    s"""WITH m AS (SELECT max(ts) - INTERVAL '1 hour' AS wm FROM events),
      |hb AS (
      |  SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
      |         ${Queries.binSql("CAST(value AS DOUBLE)", "0.0", "1024.0", 256)} AS bin
      |  FROM events
      |), """.stripMargin +
      Queries.quantileCtes(Seq("window_start", "event_type"),
        """(SELECT window_start, event_type, bin, count(*) AS c
          |        FROM hb GROUP BY 1, 2, 3)""".stripMargin,
        Seq("e" -> "0.5"), "0.0", "1024.0", 256) +
      """, n AS (
      |  SELECT window_start, event_type, count(*) AS n_events
      |  FROM hb GROUP BY 1, 2
      |)
      |SELECT n.window_start, n.event_type, n.n_events, e.v AS p50_value
      |FROM n JOIN e USING (window_start, event_type), m
      |WHERE n.window_start + INTERVAL '1 hour' <= m.wm
      |ORDER BY n.window_start, n.event_type""".stripMargin

  /** Streaming heavy hitters: the SpaceSaving sketch inside streaming
    * aggregation state (StreamingOps.windowedTopK) — top-3 users by
    * event count per closed 1-hour window. Exact regime at this scale
    * (per-window distinct users ≪ capacity), so fully hash-oracled
    * with the same watermark-cutoff determinism as q_stream_window. */
  def streamTopK(s: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(s, dir)
    val tmp = stageEvents(s, dir)
    val sink = s"stream_topk_${math.abs(dir.hashCode)}"
    graft.streaming.StreamingOps.runAvailableNow(
      graft.streaming.StreamingOps.windowedTopK(
        s.readStream.schema(events.schema).parquet(tmp)),
      sink, statePartitions = Some(StreamParts))
    s.table(sink).orderBy("window_start", "event_type", "top_user")
  }

  val streamTopKSql: String =
    """WITH m AS (SELECT max(ts) - INTERVAL '1 hour' AS wm FROM events),
      |u AS (
      |  SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
      |         CAST(user_id AS VARCHAR) AS u, count(*) AS cnt
      |  FROM events GROUP BY 1, 2, 3
      |), r AS (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY window_start, event_type
      |    ORDER BY cnt DESC, u) AS rk
      |  FROM u
      |)
      |SELECT window_start, event_type, u AS top_user, cnt AS events,
      |       CAST(0 AS BIGINT) AS err
      |FROM r, m
      |WHERE rk <= 3 AND window_start + INTERVAL '1 hour' <= m.wm
      |ORDER BY window_start, event_type, u""".stripMargin

  /** Streaming exact dedup driven end-to-end (VERDICT r4 ask #6):
    * `dropDuplicatesWithinWatermark` over the staged event stream,
    * keyed on (hour-bucket, user_id, event_type). The hour bucket is
    * used AS the event-time column, so all rows sharing a key have
    * IDENTICAL event times — which surviving physical row wins is
    * irrelevant (the projected output is the key itself), and
    * same-event-time duplicates are inside every watermark horizon by
    * construction. With the single-file staging (one AvailableNow data
    * batch, watermark 0 while it runs) the sink's final state is
    * exactly the distinct key set — deterministic, so fully oracled as
    * DISTINCT in DuckDB. Dedup emits on arrival (append mode needs no
    * window close), so no watermark cutoff applies. */
  def streamDedup(s: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(s, dir)
    val tmp = stageEvents(s, dir)
    val sink = s"stream_dedup_${math.abs(dir.hashCode)}"
    val keyed = s.readStream.schema(events.schema).parquet(tmp)
      .select(date_trunc("hour", col("ts")).as("ts"),
        col("user_id"), col("event_type"))
    graft.streaming.StreamingOps.runAvailableNow(
      graft.streaming.StreamingOps.dedupStream(
          keyed, Seq("ts", "user_id", "event_type"), "1 hour")
        .select(col("ts").as("hour_start"), col("user_id"), col("event_type")),
      sink, statePartitions = Some(StreamParts))
    s.table(sink).orderBy("hour_start", "user_id", "event_type")
  }

  val streamDedupSql: String =
    """SELECT DISTINCT date_trunc('hour', ts) AS hour_start, user_id, event_type
      |FROM events
      |ORDER BY hour_start, user_id, event_type""".stripMargin

  /** Stream-stream interval join (r7): every purchase joins the same
    * user's clicks from the preceding 30 minutes — the attribution
    * query, run as a real watermarked stream-stream join over the
    * staged single-file events stream. Inner-join emissions are final,
    * so with single-batch AvailableNow the result equals the batch
    * join — which is exactly what the oracle states. */
  def streamJoin(s: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(s, dir)
    val tmp = stageEvents(s, dir)
    val sink = s"stream_join_${math.abs(dir.hashCode)}"
    val src = s.readStream.schema(events.schema).parquet(tmp)
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_ts"), col("value").as("purchase_value"))
    val clicks = src.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("value").as("click_value"))
    graft.streaming.StreamingOps.runAvailableNow(
      graft.streaming.StreamingOps.intervalJoin(
          purchases, clicks, "user_id", "c_user", "p_ts", "c_ts", 1800L)
        .select(col("purchase_id"), col("user_id"), col("p_ts"),
          col("c_ts"), col("click_value")),
      sink, statePartitions = Some(StreamParts))
    s.table(sink).orderBy("purchase_id", "c_ts", "click_value")
  }

  val streamJoinSql: String =
    """SELECT p.event_id AS purchase_id, p.user_id, p.ts AS p_ts,
      |       c.ts AS c_ts, c.value AS click_value
      |FROM events p JOIN events c
      |  ON p.event_type = 'purchase' AND c.event_type = 'click'
      | AND p.user_id = c.user_id
      | AND c.ts >= p.ts - INTERVAL 1800 SECONDS AND c.ts <= p.ts
      |ORDER BY purchase_id, c_ts, click_value""".stripMargin

  /** Benchmark decontamination over documents: docs with doc_id % 50
    * == 0 play the eval set; every other doc reports how many of its
    * distinct word-4-grams appear in the eval set (4-grams because the
    * fixture vocabulary is tiny; real corpora use 8-13). Fully
    * SQL-expressible, so oracled. */
  def decontam(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    Decontamination.scan(
        train = docs.filter(col("doc_id") % 50 =!= 0),
        benchmark = docs.filter(col("doc_id") % 50 === 0),
        n = 4)
      .orderBy("doc_id")
  }

  val decontamSql: String =
    """WITH w AS (
      |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
      |), g AS (
      |  SELECT DISTINCT doc_id, array_to_string(ws[i:i+3], ' ') AS gram
      |  FROM w, LATERAL (SELECT unnest(range(1, greatest(len(ws) - 2, 1))) AS i) t
      |), bench AS (
      |  SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0
      |), hits AS (
      |  SELECT g.doc_id, count(*) AS n_hit_ngrams
      |  FROM g JOIN bench USING (gram)
      |  WHERE g.doc_id % 50 <> 0
      |  GROUP BY 1
      |)
      |SELECT d.doc_id, coalesce(h.n_hit_ngrams, 0) AS n_hit_ngrams,
      |       coalesce(h.n_hit_ngrams, 0) > 0 AS contaminated
      |FROM (SELECT doc_id FROM documents WHERE doc_id % 50 <> 0) d
      |LEFT JOIN hits h ON d.doc_id = h.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** Bloom-prefiltered decontamination (r10): the scale path for an
    * eval suite too big to broadcast as an exact string set — Catalyst
    * BloomFilterAggregate/BloomFilterMightContain prefilter, exact
    * verify behind it. Output is IDENTICAL to [[decontam]] by
    * construction (no false negatives; the verify join removes false
    * positives), so it shares [[decontamSql]] VERBATIM — the hash gate
    * proves the scale path changes nothing. */
  def decontamBloom(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    Decontamination.scanBloom(
        train = docs.filter(col("doc_id") % 50 =!= 0),
        benchmark = docs.filter(col("doc_id") % 50 === 0),
        n = 4)
      .orderBy("doc_id")
  }

  /** Semantic decontamination over embeddings: vectors with vec_id %
    * 50 == 0 play the eval set (the [[decontam]] convention); every
    * corpus vector reports how many eval embeddings sit within cosine
    * 0.3 and which one is nearest — the leakage screen for
    * paraphrased/translated eval content that shares no n-gram with
    * its source. Eval rows themselves hit at cosine 1.0 (a training
    * doc identical to an eval doc IS contamination), so no self
    * exclusion. Cosines are the exact left-to-right double fold on
    * both engines, so the theta cut and the argmax tie-break are
    * bit-reproducible. */
  def decontamSemantic(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    Decontamination.semanticScan(
        corpus = emb, evalSet = emb.filter(col("vec_id") % 50 === 0),
        theta = 0.3)
      .orderBy("vec_id")
  }

  lazy val decontamSemanticSql: String = {
    val cos = s"${dotFold("c.embedding", "ev.embedding")} / " +
      s"(sqrt(${dotFold("c.embedding", "c.embedding")}) * " +
      s"sqrt(${dotFold("ev.embedding", "ev.embedding")}))"
    s"""WITH ev AS (
       |  SELECT vec_id AS eval_id, embedding FROM embeddings WHERE vec_id % 50 = 0
       |), hit AS (
       |  SELECT c.vec_id, ev.eval_id, $cos AS cos_raw
       |  FROM embeddings c CROSS JOIN ev
       |  WHERE $cos >= 0.3
       |), agg AS (
       |  SELECT vec_id, count(*) AS n_eval_hits FROM hit GROUP BY 1
       |), top AS (
       |  SELECT vec_id, eval_id AS top_eval_id, round(cos_raw, 6) AS top_cosine
       |  FROM (SELECT vec_id, eval_id, cos_raw,
       |               row_number() OVER (PARTITION BY vec_id
       |                                  ORDER BY cos_raw DESC, eval_id ASC) AS rn
       |        FROM hit) r WHERE rn = 1
       |)
       |SELECT e.vec_id, coalesce(a.n_eval_hits, 0) AS n_eval_hits,
       |       t.top_eval_id, t.top_cosine,
       |       a.n_eval_hits IS NOT NULL AS contaminated
       |FROM embeddings e
       |LEFT JOIN agg a USING (vec_id) LEFT JOIN top t USING (vec_id)
       |ORDER BY e.vec_id""".stripMargin
  }

  /** As-of join: every purchase event picks up the user's most recent
    * click at-or-before it (ts + value). Oracled against DuckDB's
    * native ASOF LEFT JOIN. */
  def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    val clicks = ev.filter(col("event_type") === "click")
      .select("user_id", "ts", "value")
    AsOfJoin(purchases, clicks, Seq("user_id"), "ts",
        struct(col("ts").as("click_ts"), col("value").as("click_value")))
      .orderBy("event_id")
  }

  val asofJoinSql: String =
    """WITH p AS (
      |  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
      |), c AS (
      |  SELECT user_id, ts, value FROM events WHERE event_type = 'click'
      |)
      |SELECT p.event_id, p.user_id, p.ts, p.value,
      |       c.ts AS click_ts, c.value AS click_value
      |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
      |ORDER BY p.event_id""".stripMargin

  // ------------------------------------------------- classic analytics bench

  /** TPC-H Q1-shaped pricing summary over lineitem: the canonical
    * map-side-combinable aggregate (per-row decimal products rounded
    * to 4dp so both engines sum exactly). */
  def pricingSummary(s: SparkSession, dir: String): DataFrame = {
    // all-decimal products: exact, order-independent, identical across
    // engines (a per-row double round(x,4) straddles half-way points
    // differently between Spark and DuckDB)
    val l = Tables.lineitem(s, dir)
      .filter(to_date(col("l_shipdate")) <= lit("1998-09-02"))
      .withColumn("qty", col("l_quantity").cast("decimal(18,2)"))
      .withColumn("ep", col("l_extendedprice").cast("decimal(18,2)"))
      .withColumn("disc_price",
        col("l_extendedprice").cast("decimal(18,2)")
          * (lit(1).cast("decimal(9,4)") - col("l_discount").cast("decimal(9,4)")))
      .withColumn("charge",
        (col("l_extendedprice").cast("decimal(18,2)")
          * (lit(1).cast("decimal(9,4)") - col("l_discount").cast("decimal(9,4)")))
          * (lit(1).cast("decimal(9,4)") + col("l_tax").cast("decimal(9,4)")))
    l.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum("qty").cast("double").as("sum_qty"),
        sum("ep").cast("double").as("sum_base_price"),
        sum("disc_price").cast("double").as("sum_disc_price"),
        sum("charge").cast("double").as("sum_charge"),
        round(sum("qty").cast("double") / count(lit(1)), 6).as("avg_qty"),
        round(sum("ep").cast("double") / count(lit(1)), 6).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val pricingSummarySql: String =
    """WITH l AS (
      |  SELECT l_returnflag, l_linestatus,
      |         CAST(l_quantity AS DECIMAL(18,2)) AS qty,
      |         CAST(l_extendedprice AS DECIMAL(18,2)) AS ep,
      |         CAST(l_extendedprice AS DECIMAL(18,2))
      |           * (CAST(1 AS DECIMAL(9,4)) - CAST(l_discount AS DECIMAL(9,4))) AS disc_price,
      |         (CAST(l_extendedprice AS DECIMAL(18,2))
      |           * (CAST(1 AS DECIMAL(9,4)) - CAST(l_discount AS DECIMAL(9,4))))
      |           * (CAST(1 AS DECIMAL(9,4)) + CAST(l_tax AS DECIMAL(9,4))) AS charge
      |  FROM lineitem WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
      |)
      |SELECT l_returnflag, l_linestatus,
      |       CAST(sum(qty) AS DOUBLE) AS sum_qty,
      |       CAST(sum(ep) AS DOUBLE) AS sum_base_price,
      |       CAST(sum(disc_price) AS DOUBLE) AS sum_disc_price,
      |       CAST(sum(charge) AS DOUBLE) AS sum_charge,
      |       round(CAST(sum(qty) AS DOUBLE) / count(*), 6) AS avg_qty,
      |       round(CAST(sum(ep) AS DOUBLE) / count(*), 6) AS avg_price,
      |       count(*) AS count_order
      |FROM l GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** TPC-H Q5-shaped star join: revenue by nation through
    * region⋈nation⋈customer⋈orders⋈lineitem. The small dims (region,
    * nation) are explicitly broadcast — they stay tiny at any SF —
    * while customer/orders/lineitem join shuffle-side under AQE. */
  def revenueByNation(s: SparkSession, dir: String): DataFrame = {
    val nation = broadcast(Tables.nation(s, dir))
    val region = broadcast(Tables.region(s, dir))
    val rev = Tables.lineitem(s, dir)
      .withColumn("rev",
        col("l_extendedprice").cast("decimal(18,2)")
          * (lit(1).cast("decimal(9,4)") - col("l_discount").cast("decimal(9,4)")))
      .select("l_orderkey", "rev")
    Tables.orders(s, dir)
      // r18 (guide §6 predicate pushdown): the year(to_date(ts))
      // predicate is derived, so nothing reached the parquet scan —
      // conjoin the equivalent raw-timestamp range (session tz is
      // pinned UTC; year(to_date(ts)) = 1995 ⟺ ts ∈ [1995-01-01,
      // 1996-01-01) exactly, all inputs), which pushes as min/max
      // row-group pruning. The original conjunct stays — same rows.
      .filter(year(to_date(col("o_orderdate"))) === 1995 &&
        col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
      .join(Tables.customer(s, dir).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(nation, col("c_nationkey") === col("n_nationkey"))
      .join(region, col("n_regionkey") === col("r_regionkey"))
      .join(rev, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("r_name").as("region_name"), col("n_name").as("nation_name"))
      .agg(sum("rev").cast("double").as("revenue"), count(lit(1)).as("n_items"))
      .orderBy("region_name", "nation_name")
  }

  val revenueByNationSql: String =
    """SELECT r.r_name AS region_name, n.n_name AS nation_name,
      |       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
      |         * (CAST(1 AS DECIMAL(9,4)) - CAST(l.l_discount AS DECIMAL(9,4)))) AS DOUBLE) AS revenue,
      |       count(*) AS n_items
      |FROM orders o
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |WHERE year(CAST(o.o_orderdate AS DATE)) = 1995
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Top-k with ORDER BY + LIMIT (SURVEY §2.6 — free from Spark, shown
    * once): top 10 parts by shipped quantity. TakeOrderedAndProject —
    * no global sort at scale. */
  def topParts(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_partkey")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("total_qty"),
        count(lit(1)).as("n_ships"))
      .join(broadcast(Tables.part(s, dir).select("p_partkey", "p_name", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .select("p_partkey", "p_name", "p_brand", "total_qty", "n_ships")
      .orderBy(desc("total_qty"), asc("p_partkey"))
      .limit(10)

  val topPartsSql: String =
    """SELECT p.p_partkey, p.p_name, p.p_brand,
      |       CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
      |       count(*) AS n_ships
      |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |GROUP BY 1, 2, 3
      |ORDER BY total_qty DESC, p_partkey ASC LIMIT 10""".stripMargin

  // ----------------------------------------------------- dedup / similarity

  /** Segment-level (passage) dedup over 16-token windows
    * ([[graft.ops.SegmentDedup]], r11): drop every repeated segment
    * after its corpus-first occurrence, rebuild documents from the
    * survivors, and report the per-source curation card. Exact
    * duplicate documents lose ALL their segments to the keeper copy;
    * partially-copied passages lose only the copied windows. */
  def passageDedup(s: SparkSession, dir: String): DataFrame =
    passageCard(SegmentDedup.dedup(Tables.documents(s, dir),
      SegmentDedup.tokenWindows(col("text"), 16), sep = " "))

  /** Per-source curation card over a [[graft.ops.SegmentDedup]]-shaped
    * per-doc frame — shared by the batch and incremental queries so
    * both gate against the same oracle SQL. */
  private def passageCard(perDoc: DataFrame): DataFrame =
    perDoc.groupBy("source").agg(
        count(lit(1)).as("docs"),
        sum("n_segments").as("segments"),
        sum("kept_segments").as("kept_segments"),
        count(when(col("kept_segments") < col("n_segments"), 1)).as("docs_changed"),
        sum(length(col("new_text"))).as("kept_chars"))
      .orderBy("source")

  private val stagedIncSegs = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Incremental segment dedup ([[graft.ops.IncrementalSegments]]):
    * state built on the first id-quartile of the corpus, three folds
    * absorb the rest IN ID ORDER (the regime where first-observed ==
    * global-min keeper), and the card computes from the maintained
    * keeper store — gated by the SAME oracle SQL as the batch query:
    * the hash match IS the fold == rebuild contract. */
  def passageDedupIncremental(s: SparkSession, dir: String): DataFrame = {
    val path = stagedTempDir(stagedIncSegs, dir, "graft_inc_segs") { p =>
      val docs = Tables.documents(s, dir).select("doc_id", "source", "text")
      val t = quartileSplits(docs)
      val t0 = System.nanoTime()
      graft.ops.IncrementalSegments.writeState(
        docs.filter(col("doc_id") < t(0)), s"$p/state")
      val tState = System.nanoTime()
      Seq(
        docs.filter(col("doc_id") >= t(0) && col("doc_id") < t(1)),
        docs.filter(col("doc_id") >= t(1) && col("doc_id") < t(2)),
        docs.filter(col("doc_id") >= t(2)))
        .zipWithIndex.foreach { case (b, i) =>
          graft.ops.IncrementalSegments.applyDelta(s, s"$p/state", b,
            foldId = Some(s"b$i"))
        }
      stageTimings("q_passage_dedup_incremental") = Seq(
        "write_state" -> (tState - t0) / 1e9,
        "fold" -> (System.nanoTime() - tState) / 1e9)
    }
    passageCard(graft.ops.IncrementalSegments.dedupFromState(s, s"$path/state"))
  }

  val passageDedupSql: String =
    """WITH tk AS (
      |  SELECT doc_id, string_split_regex(trim(text), '[ \t\n\x0B\f\r]+') AS t
      |  FROM documents WHERE length(trim(text)) > 0
      |), seg AS (
      |  SELECT doc_id,
      |         unnest(range(CAST(ceil(len(t) / 16.0) AS BIGINT))) AS pos,
      |         unnest(list_transform(range(CAST(ceil(len(t) / 16.0) AS BIGINT)),
      |                i -> array_to_string(t[i*16+1 : i*16+16], ' '))) AS seg
      |  FROM tk
      |), segf AS (
      |  SELECT doc_id, pos, seg,
      |         md5(regexp_replace(lower(trim(seg)), '[ \t\n\x0B\f\r]+', ' ', 'g')) AS fp
      |  FROM seg WHERE length(trim(seg)) > 0
      |), kept AS (
      |  SELECT doc_id, pos, seg FROM (
      |    SELECT doc_id, pos, seg,
      |           row_number() OVER (PARTITION BY fp ORDER BY doc_id, pos) AS rn
      |    FROM segf) WHERE rn = 1
      |), perdoc AS (
      |  SELECT doc_id, count(*) AS kept_segments,
      |         string_agg(seg, ' ' ORDER BY pos) AS new_text
      |  FROM kept GROUP BY 1
      |), counts AS (
      |  SELECT doc_id, count(*) AS n_segments FROM segf GROUP BY 1
      |), j AS (
      |  SELECT d.source,
      |         coalesce(c.n_segments, 0) AS n_segments,
      |         coalesce(p.kept_segments, 0) AS kept_segments,
      |         coalesce(p.new_text, '') AS new_text
      |  FROM documents d
      |  LEFT JOIN counts c USING (doc_id)
      |  LEFT JOIN perdoc p USING (doc_id)
      |)
      |SELECT source, count(*) AS docs,
      |       CAST(sum(n_segments) AS BIGINT) AS segments,
      |       CAST(sum(kept_segments) AS BIGINT) AS kept_segments,
      |       count(CASE WHEN kept_segments < n_segments THEN 1 END) AS docs_changed,
      |       CAST(sum(length(new_text)) AS BIGINT) AS kept_chars
      |FROM j GROUP BY source ORDER BY source""".stripMargin

  /** MinHash candidate pairs staged to parquet once per source dir:
    * q_dedup_minhash and q_ngram_jaccard both consume the same
    * banding + verify pipeline — the most expensive text stage in the
    * suite — and recomputing it per query doubled that cost whenever
    * both ran (VERDICT r4). Same once-per-JVM staging pattern as
    * [[stagedEvents]]; the first evaluation pays the pipeline, repeats
    * replay the (tiny, pairs-only) parquet — visible as a fast tail in
    * the bench's per-run arrays. */
  private val stagedPairs = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The shared per-(JVM, dir) staging idiom: build an artifact once
    * into a fresh temp dir, replay thereafter. Per-JVM on purpose
    * (cross-JVM reuse would let a bench record a previous process's
    * replay as the pipeline cost) — so clean up on exit instead of
    * accumulating a dir per JVM in /tmp. One definition, four users
    * (minhash pairs, cluster labels ×2, the inc-dedup index). */
  /** Per-query staging-STAGE timings (seconds), recorded by staging
    * closures that conflate a one-time offline state build with the
    * recurring per-delta work. Bench surfaces these in its JSON so the
    * singleRun headline number can be read apart (VERDICT r9 demerit
    * 3: q_dedup_clusters_incremental's 15 s is ~80% writeState). */
  val stageTimings =
    scala.collection.concurrent.TrieMap[String, Seq[(String, Double)]]()

  /** Per-query staging COUNTERS (counts, not seconds) — kept apart
    * from [[stageTimings]] so artifact consumers summing or comparing
    * stage seconds never misread a bucket count as a duration
    * (ADVICE r14). Bench surfaces these under a separate `counters`
    * field. */
  val stageCounters =
    scala.collection.concurrent.TrieMap[String, Seq[(String, Long)]]()

  /** Three id split points partitioning the corpus into ~quartiles for
    * the state-build + 3-folds incremental harnesses. Distributed
    * Greenwald–Khanna sketch (`approxQuantile`), NOT a driver-side
    * sort-and-collect of every doc_id (VERDICT r11 task 6 — the old
    * form was the last corpus-sized collect in main): the fold ==
    * rebuild contracts hold under ANY monotone split, so a ±1%-rank
    * split point changes batch sizes marginally and results not at
    * all. */
  private def quartileSplits(docs: DataFrame): Seq[Long] =
    docs.stat.approxQuantile("doc_id", Array(0.25, 0.5, 0.75), 0.01)
      .map(_.toLong).toSeq

  // every staging registry, so [[clearStaging]] can reset them all —
  // keep in sync with the `stagedTempDir` call sites
  private lazy val stagingRegistries = Seq(
    stagedDriftStore, stagedEvents, stagedIncSegs, stagedPairs,
    stagedIncIndex, stagedDsirStore, stagedBm25Idx, stagedBm25Inc,
    stagedClusters, stagedIncSpans, stagedIncClusters, stagedStreamCur,
    stagedLiveMetrics, stagedIvf, stagedIvfInc, stagedFpStore)

  /** Drop every per-(JVM, dir) staged artifact so the NEXT invocation
    * of each staged query re-runs its full staging pipeline into a
    * fresh temp dir. This is the bench's dedicated stage-measurement
    * lever (VERDICT r11 tasks 1/5): per-stage costs are re-measured
    * n≥5 times by clearing between reps, instead of being n=1 samples
    * inside a contended full sweep. Deletes the old temp dirs. */
  def clearStaging(): Unit = stagingRegistries.foreach { reg =>
    // FileUtils, not an uncloseable Files.walk stream: the walk held
    // directory handles open (16 registries × stage reps leaked fds
    // each bench pass — ADVICE r12; fd exhaustion is also the prime
    // suspect behind the r12 soak's null listFiles)
    reg.values().forEach { p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
    }
    reg.clear()
  }

  private def stagedTempDir(
      registry: java.util.concurrent.ConcurrentHashMap[String, String],
      dir: String, prefix: String)(build: String => Unit): String =
    registry.computeIfAbsent(dir, { _ =>
      val p = java.nio.file.Files.createTempDirectory(prefix)
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        org.apache.commons.io.FileUtils.deleteQuietly(p.toFile)))
      build(p.toString)
      p.toString
    })

  private def minhashPairs(s: SparkSession, dir: String): DataFrame = {
    val path = stagedTempDir(stagedPairs, dir, "graft_minhash_pairs") { p =>
      val t0 = System.nanoTime()
      MinHashLSH.candidatePairs(Tables.documents(s, dir))
        .write.mode("overwrite").parquet(p)
      // the staging pipeline is the honest q_dedup_minhash cost; sweep
      // samples after the first replay the staged parquet (r12: the
      // bench's dedicated stage pass re-measures this n≥5)
      stageTimings("q_dedup_minhash") = Seq(
        "pipeline" -> (System.nanoTime() - t0) / 1e9)
    }
    s.read.parquet(path)
  }

  /** MinHash+LSH near-dup candidates: top-20 verified pairs by exact
    * Jaccard (deterministic seed). Fully oracled since r6: the base and
    * bucket hashes are the engine-owned PolyHash61 (not xxhash64), so
    * the entire pipeline is re-derivable in DuckDB — see
    * [[minhashPairsCtes]]. Recall/precision are additionally
    * spec-tested (DedupSpec). */
  def dedupMinhash(s: SparkSession, dir: String): DataFrame =
    minhashPairs(s, dir)
      .orderBy(desc("jaccard"), asc("a_id"), asc("b_id"))
      .limit(20)

  /** Shared DuckDB re-expression of MinHashLSH.candidatePairs at its
    * defaults (k=64, bands=16, r=4, w=3, seed=42, maxBucketSize=1000):
    * word 3-shingles → PolyHash61 base hash folded into the 2^31-1
    * field → per-doc k-min signature with the (a_i, b_i) family
    * embedded as literals (the spec-fixed java.util.Random stream is
    * driver-side, so the oracle just inlines its draws) → per-band
    * bucket = PolyHash61 of the same "band,slice" string Spark hashes →
    * census-filtered self-join → distinct candidate pairs. HUGEINT
    * keeps the h·B partial products exact; Spark's wraparound
    * `& (2^61-1)` equals HUGEINT `% 2^61` because the modulus divides
    * 2^64 (the winnowing precedent, [[winnowDedupSql]]). */
  /** DuckDB re-expression of [[graft.functions.PolyHash61]]: the 61-bit
    * polynomial fold over the chars of scalar expression `e`. Char-based
    * (ord/substr), so it equals the engine's UTF-8-byte fold only on
    * pure-ASCII text — a precondition ENFORCED in-oracle by
    * [[asciiGuardedTokensCte]]'s error() branch (ADVICE r6), not just by
    * the fixture-level FixtureSpec test. */
  private[graft] def fold61(e: String) =
    s"CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT), " +
      s"list_transform(range(1, length($e)+1), ci -> CAST(ord(substr($e, ci, 1)) AS HUGEINT))), " +
      s"(acc, c) -> (acc * 1000000007 + c) % 2305843009213693952) AS BIGINT)"

  /** Shared `tk` CTE body: lower-cased whitespace tokens per doc, with
    * fold61's ord(char)==byte precondition enforced loudly — a
    * non-ASCII corpus fails the oracle query with a clear message
    * instead of producing a mysterious hash mismatch (ADVICE r6). The
    * whitespace class is the engine's spelled-out [[TextOps.WhitespaceRe]]
    * (RE2's \\s lacks \\x0B; Java's includes it). */
  private val asciiGuardedTokensCte: String =
    s"""tk AS (
       |  SELECT doc_id, string_split_regex(trim(lower(
       |           CASE WHEN text ~ '[^\\x00-\\x7F]'
       |                THEN error('non-ASCII doc ' || doc_id ||
       |                           ': fold61 ord-as-byte precondition violated')
       |                ELSE text END)),
       |         '[ \\t\\n\\x0B\\f\\r]+') AS tk FROM documents
       |)""".stripMargin

  private val minhashPairsCtes: String = {
    val (as, bs) = graft.functions.MinHashSignature.params(64, 42L)
    val pa = as.mkString("[", ",", "]")
    val pb = bs.mkString("[", ",", "]")
    s"""WITH $asciiGuardedTokensCte, sh AS (
       |  -- a doc with fewer than 3 tokens has no 3-shingles (mirrors
       |  -- MinHashLSH.shinglesFromTokens' CASE; r7)
       |  SELECT doc_id, CASE WHEN len(tk) < 3 THEN []::VARCHAR[]
       |         ELSE list_distinct(list_filter(
       |           list_transform(range(1, len(tk) - 1),
       |             si -> array_to_string(tk[si:si+2], ' ')),
       |           s -> length(s) > 0)) END AS sh
       |  FROM tk
       |), shr AS (
       |  SELECT doc_id, unnest(sh) AS s FROM sh
       |), hs AS (
       |  SELECT doc_id, ${fold61("s")} % 2147483647 AS h FROM shr
       |), hls AS (
       |  SELECT doc_id, list(h) AS hl FROM hs GROUP BY doc_id
       |), params AS (
       |  SELECT $pa::BIGINT[] AS pa, $pb::BIGINT[] AS pb
       |), sigs AS (
       |  SELECT doc_id, list_transform(range(1, 65),
       |           i -> list_min(list_transform(hl, hh -> (pa[i]*hh + pb[i]) % 2147483647))) AS sig
       |  FROM hls CROSS JOIN params
       |), bstrs AS (
       |  SELECT doc_id, band, array_to_string(list_prepend(CAST(band AS VARCHAR),
       |           list_transform(sig[band*4+1 : band*4+4], x -> CAST(x AS VARCHAR))), ',') AS bstr
       |  FROM (SELECT doc_id, unnest(range(0, 16)) AS band, sig FROM sigs)
       |), banded AS (
       |  SELECT doc_id, band, ${fold61("bstr")} AS bucket FROM bstrs
       |), census AS (
       |  SELECT band, bucket FROM banded GROUP BY band, bucket
       |  HAVING count(*) BETWEEN 2 AND 1000
       |), slim AS (
       |  SELECT b.doc_id, b.band, b.bucket FROM banded b JOIN census USING (band, bucket)
       |), pairs AS (
       |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM slim a JOIN slim b USING (band, bucket)
       |  WHERE a.doc_id < b.doc_id
       |)""".stripMargin
  }

  val dedupMinhashSql: String = minhashPairsCtes +
    """
      |SELECT p.a_id, p.b_id,
      |       round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
      |             / len(list_distinct(list_concat(sa.sh, sb.sh))), 6) AS jaccard
      |FROM pairs p JOIN sh sa ON sa.doc_id = p.a_id JOIN sh sb ON sb.doc_id = p.b_id
      |ORDER BY jaccard DESC, a_id, b_id LIMIT 20""".stripMargin

  /** Incremental dedup against a persisted corpus index (r8): docs with
    * `doc_id % 10 = 7` play the freshly-arrived delta, the rest the
    * already-indexed corpus. O(delta) per batch — the corpus
    * contributes only its once-written slim band-bucket index, never a
    * re-scan (IncrementalDedupSpec plan-gates that the index streams
    * through broadcast joins unshuffled). Oracled by the BATCH CTEs
    * restricted to delta-involving pairs, which is exactly
    * [[graft.ops.IncrementalDedup]]'s equivalence contract. */
  def dedupIncremental(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    IncrementalDedup.deltaPairs(s, stageIncIndex(s, dir),
        docs.filter(col("doc_id") % 10 === 7))
      .orderBy(desc("jaccard"), asc("a_id"), asc("b_id"))
      .limit(20)
  }

  val dedupIncrementalSql: String = minhashPairsCtes +
    """
      |SELECT p.a_id, p.b_id,
      |       round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
      |             / len(list_distinct(list_concat(sa.sh, sb.sh))), 6) AS jaccard
      |FROM pairs p JOIN sh sa ON sa.doc_id = p.a_id JOIN sh sb ON sb.doc_id = p.b_id
      |WHERE p.a_id % 10 = 7 OR p.b_id % 10 = 7
      |ORDER BY jaccard DESC, a_id, b_id LIMIT 20""".stripMargin

  private val stagedIncIndex = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Once-per-JVM corpus index build for [[dedupIncremental]] (the
    * "offline index job"; same per-JVM temp staging + cleanup as
    * [[minhashPairs]]). */
  private def stageIncIndex(s: SparkSession, dir: String): String =
    stagedTempDir(stagedIncIndex, dir, "graft_inc_index") { p =>
      IncrementalDedup.writeIndex(
        Tables.documents(s, dir).filter(col("doc_id") % 10 =!= 7), p)
    }

  /** SimHash fingerprints (per-row HOFs, no shuffle). Fully oracled
    * since r7: the per-token hash is PolyHash61 (not xxhash64), so
    * DuckDB re-derives the bit-vote fold exactly (VERDICT r6 task 6 —
    * the same swap that oracled minhash in r6). */
  def simhashFingerprints(s: SparkSession, dir: String): DataFrame =
    // sort-then-project (r18): see textStats — one simhash pass, not two
    SimHash.fingerprints(
      Tables.documents(s, dir).select("doc_id", "text").orderBy("doc_id"))

  /** DuckDB re-expression of [[SimHash.simhash]]: PolyHash61 per
    * lower-cased whitespace token, then each hash votes ±1 on each of
    * 64 bit positions; a positive vote total sets the bit. Bits 61-63
    * can never be set (PolyHash61 < 2^61 ⇒ those bits vote −n), so the
    * `1 << b` sum stays within BIGINT. Token multiset semantics match:
    * `unnest` keeps duplicate tokens exactly like Spark's `transform`. */
  val simhashSql: String =
    s"""WITH $asciiGuardedTokensCte, toks AS (
       |  SELECT doc_id, unnest(tk) AS t FROM tk
       |), hs AS (
       |  SELECT doc_id, ${fold61("t")} AS h FROM toks
       |), votes AS (
       |  SELECT doc_id, bits.b AS b,
       |         sum(CASE WHEN (h >> bits.b) & 1 = 1 THEN 1 ELSE -1 END) AS v
       |  FROM hs CROSS JOIN (SELECT unnest(range(0, 64)) AS b) bits
       |  GROUP BY doc_id, bits.b
       |)
       |SELECT doc_id,
       |       CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash
       |FROM votes GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Char-3-gram Jaccard over MinHash candidates (n-gram variant of the
    * verify stage). Fully oracled since r6 — shares [[minhashPairsCtes]]
    * with q_dedup_minhash, exactly as the engine side shares the staged
    * candidate pipeline. */
  def ngramJaccard(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val pairs = minhashPairs(s, dir)
    // n-grams for CANDIDATE docs only (pairs ≪ corpus — the same
    // pruning as candidatePairs' verify stage, r7): the interpreted
    // charNgramsFromNorm transform over the full corpus on BOTH join
    // branches was this query's dominant cost
    val candIds = pairs.select(col("a_id").as("doc_id"))
      .union(pairs.select(col("b_id").as("doc_id"))).distinct()
    val grams = graft.ops.Persists.cache(docs
      .join(candIds, Seq("doc_id"), "left_semi")
      .withColumn("__norm", TextOps.normalized(col("text")))
      .select(col("doc_id"), TextOps.charNgramsFromNorm(col("__norm"), 3).as("g")))
    pairs
      .join(grams.select(col("doc_id").as("a_id"), col("g").as("ga")), "a_id")
      .join(grams.select(col("doc_id").as("b_id"), col("g").as("gb")), "b_id")
      .withColumn("ngram_jaccard", round(
        size(array_intersect(col("ga"), col("gb"))).cast("double") /
          size(array_union(col("ga"), col("gb"))), 6))
      .select("a_id", "b_id", "ngram_jaccard")
      .orderBy(desc("ngram_jaccard"), asc("a_id"), asc("b_id"))
      .limit(20)
  }

  val ngramJaccardSql: String = minhashPairsCtes +
    """,
      |ng AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |           range(1, greatest(length(norm) - 3, 0) + 2),
      |           gi -> substr(norm, gi, 3))) AS g
      |  FROM (SELECT doc_id, regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g') AS norm FROM documents)
      |)
      |SELECT p.a_id, p.b_id,
      |       round(CAST(len(list_intersect(ga.g, gb.g)) AS DOUBLE)
      |             / len(list_distinct(list_concat(ga.g, gb.g))), 6) AS ngram_jaccard
      |FROM pairs p JOIN ng ga ON ga.doc_id = p.a_id JOIN ng gb ON gb.doc_id = p.b_id
      |ORDER BY ngram_jaccard DESC, a_id, b_id LIMIT 20""".stripMargin

  /** Brute-force cosine top-5 for the first 10 vectors (exact ANN
    * baseline). Oracle: identical left-to-right double fold in DuckDB. */
  def annBruteForce(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10), k = 5)
      .orderBy("query_id", "rank")
  }

  val annBruteForceSql: String =
    """WITH scored AS (
      |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |         list_sum(list_transform(list_zip(q.embedding, c.embedding),
      |           p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
      |         / (sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |            * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
      |           AS cos_raw
      |  FROM embeddings q, embeddings c
      |  WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id
      |), ranked AS (
      |  SELECT query_id, neighbor_id, cos_raw,
      |         row_number() OVER (PARTITION BY query_id
      |                            ORDER BY cos_raw DESC, neighbor_id ASC) AS rank
      |  FROM scored
      |)
      |SELECT query_id, rank, neighbor_id, round(cos_raw, 6) AS cosine
      |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** LSH-bucketed ANN. Fully oracled since r7: the Gaussian hyperplanes
    * are driver-side constants from spec-fixed java.util.Random (the
    * MinHashSignature.params precedent), so the oracle embeds the whole
    * plane tensor as a literal and re-derives buckets → candidates →
    * exact cosine ranking in DuckDB. Recall vs brute force additionally
    * spec-tested (SimilaritySpec). */
  def annLsh(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    Similarity.lshTopK(emb, emb.filter(col("vec_id") < 10), k = 5)
      .orderBy("query_id", "rank")
  }

  /** DuckDB literal for a [tables][bits][dim] plane tensor (Scala's
    * shortest-round-trip Double.toString parses back to the identical
    * double). */
  private def planesLiteral(tables: Int, bits: Int, dim: Int, seed: Long): String =
    Similarity.planesFor(tables, bits, dim, seed)
      .map(_.map(_.mkString("[", ",", "]")).mkString("[", ",", "]"))
      .mkString("[", ",", "]")

  /** The engine's EXACT left-to-right double dot fold
    * (ArrayDotProduct / the aggregate-HOF spec): bit-identical is
    * required where a SIGN decides a bucket bit — `list_sum`'s
    * summation order is unspecified, `list_reduce` is the same fold. */
  private def dotFold(v: String, p: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(list_zip($v, $p), pr -> CAST(pr[1] AS DOUBLE) * CAST(pr[2] AS DOUBLE))), " +
      s"(acc, x) -> acc + x)"

  /** Per-table bucket: Σ_b (sign(v·plane[t][b]) << b) — mirrors
    * Similarity.bucketExpr with 1-based SQL indexing. */
  private def bucketFold(bits: Int, vec: String, planesIdx: String): String =
    s"CAST(list_sum(list_transform(range(1, ${bits + 1}), b -> " +
      s"CASE WHEN ${dotFold(vec, s"$planesIdx[b]")} > 0 " +
      s"THEN (CAST(1 AS BIGINT) << (b - 1)) ELSE CAST(0 AS BIGINT) END)) AS BIGINT)"

  val annLshSql: String = {
    val cos = s"${dotFold("q.embedding", "c.embedding")} / " +
      s"(sqrt(${dotFold("q.embedding", "q.embedding")}) * sqrt(${dotFold("c.embedding", "c.embedding")}))"
    s"""WITH params AS (
       |  SELECT ${planesLiteral(16, 5, 64, 42L)}::DOUBLE[][][] AS planes
       |), tabs AS (
       |  SELECT unnest(range(0, 16)) AS tbl
       |), cb AS (
       |  SELECT e.vec_id, tabs.tbl,
       |         ${bucketFold(5, "e.embedding", "planes[tabs.tbl + 1]")} AS bucket
       |  FROM embeddings e CROSS JOIN params CROSS JOIN tabs
       |), cand AS (
       |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
       |  FROM cb q JOIN cb c ON q.tbl = c.tbl AND q.bucket = c.bucket
       |  WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id
       |), scored AS (
       |  SELECT cand.query_id, cand.neighbor_id, $cos AS cos_raw
       |  FROM cand JOIN embeddings q ON q.vec_id = cand.query_id
       |            JOIN embeddings c ON c.vec_id = cand.neighbor_id
       |), ranked AS (
       |  SELECT query_id, neighbor_id, cos_raw,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY cos_raw DESC, neighbor_id ASC) AS rank
       |  FROM scored
       |)
       |SELECT query_id, rank, neighbor_id, round(cos_raw, 6) AS cosine
       |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  /** Embedding-cosine near-dup pairs (LSH candidates, exact verify):
    * top-20 most-similar pairs. */
  def embedNearDup(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    // hyperplane count must GROW with the corpus: at fixed bits the
    // per-bucket density is n/2^bits, so the bucket self-join's pair
    // count is O(n²/2^bits) — the r5 100× sweep measured exactly that
    // quadratic blowup at bits=10. Sizing bits ≈ log2(n/2) holds
    // density (and recall/candidate trade) roughly constant; the floor
    // keeps every driver scale (n ≤ 2000 → bits = 10) byte-identical
    // to the fixed-knob output. No upper cap (a cap re-pins the knob
    // and re-introduces the quadratic regime past n = 2^(cap+1) —
    // extra planes cost only linear dot products; the 62-bit ceiling
    // just keeps the bucket id inside a Long, unreachable in practice).
    val bits = math.min(62, math.max(10,
      (math.log(emb.count().toDouble / 2.0) / math.log(2.0)).ceil.toInt))
    Similarity.embeddingNearDup(emb, threshold = -1.0, bits = bits)
      .orderBy(desc("cosine"), asc("a_id"), asc("b_id"))
      .limit(20)
  }

  /** DuckDB re-expression of [[embedNearDup]] (fully oracled since r7,
    * the annLshSql plane-literal technique): the tensor is embedded for
    * bits=10 — the auto-sizing formula's value at every driver scale —
    * and the oracle RECOMPUTES the formula from count(*), failing
    * loudly via error() if the corpus ever outgrows the embedded tensor
    * (the ASCII-guard pattern: a wrong-scale oracle must not silently
    * mismatch). */
  val embedNearDupSql: String = {
    val cos = s"${dotFold("a.embedding", "b.embedding")} / " +
      s"(sqrt(${dotFold("a.embedding", "a.embedding")}) * sqrt(${dotFold("b.embedding", "b.embedding")}))"
    s"""WITH bitchk AS (
       |  SELECT CASE WHEN least(62, greatest(10, CAST(ceil(log2(count(*) / 2.0)) AS INT))) <> 10
       |              THEN CAST(error('embedNearDup oracle embeds a bits=10 tensor; corpus now needs bits='
       |                   || least(62, greatest(10, CAST(ceil(log2(count(*) / 2.0)) AS INT)))) AS INT)
       |              ELSE 10 END AS bits
       |  FROM embeddings
       |), params AS (
       |  SELECT ${planesLiteral(8, 10, 64, 42L)}::DOUBLE[][][] AS planes
       |), tabs AS (
       |  SELECT unnest(range(0, 8)) AS tbl
       |), cb AS (
       |  SELECT e.vec_id, tabs.tbl,
       |         ${bucketFold(10, "e.embedding", "planes[tabs.tbl + 1]")} AS bucket
       |  FROM embeddings e CROSS JOIN params CROSS JOIN tabs CROSS JOIN bitchk
       |  WHERE bitchk.bits = 10
       |), census AS (
       |  SELECT tbl, bucket FROM cb GROUP BY tbl, bucket
       |  HAVING count(*) BETWEEN 2 AND 10000
       |), slim AS (
       |  SELECT cb.vec_id, cb.tbl, cb.bucket FROM cb JOIN census USING (tbl, bucket)
       |), pairs AS (
       |  SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
       |  FROM slim a JOIN slim b USING (tbl, bucket)
       |  WHERE a.vec_id < b.vec_id
       |)
       |SELECT p.a_id, p.b_id, round($cos, 6) AS cosine
       |FROM pairs p JOIN embeddings a ON a.vec_id = p.a_id
       |             JOIN embeddings b ON b.vec_id = p.b_id
       |ORDER BY cosine DESC, a_id, b_id LIMIT 20""".stripMargin
  }

  /** Unigram-LM quality card (r11, [[graft.ops.UnigramLm]]): corpus-
    * trained mean token log-probability per document, rolled up per
    * source. The per-word log-probs are 6dp-fixed decimals and every
    * cross-row sum is exact decimal, so the scores hash-oracle. */
  def unigramQuality(s: SparkSession, dir: String): DataFrame =
    UnigramLm.scores(Tables.documents(s, dir))
      .groupBy("source")
      .agg(count(lit(1)).as("docs"),
        min("logp").as("min_logp"),
        max("logp").as("max_logp"),
        round(sum(col("logp").cast("decimal(18,6)")).cast("double")
          / count(lit(1)), 6).as("avg_logp"))
      .orderBy("source")

  val unigramQualitySql: String =
    """WITH tk AS (
      |  SELECT doc_id, source,
      |         unnest(string_split_regex(lower(trim(text)), '[ \t\n\x0B\f\r]+')) AS w
      |  FROM documents WHERE length(trim(text)) > 0
      |), dwc AS (
      |  SELECT doc_id, source, w, count(*) AS c FROM tk GROUP BY 1, 2, 3
      |), vocab AS (
      |  SELECT w, count(*) AS cw FROM tk GROUP BY 1
      |), tot AS (
      |  SELECT CAST(sum(cw) AS BIGINT) AS t FROM vocab
      |), lp AS (
      |  SELECT w, CAST(round(ln(CAST(cw AS DOUBLE) / t), 6) AS DECIMAL(18,6)) AS lp
      |  FROM vocab, tot
      |), ds AS (
      |  SELECT doc_id, source,
      |         round(CAST(sum(CAST(c AS DECIMAL(18,0)) * lp) AS DOUBLE)
      |               / sum(c), 6) AS logp
      |  FROM dwc JOIN lp USING (w) GROUP BY 1, 2
      |)
      |SELECT source, count(*) AS docs,
      |       min(logp) AS min_logp, max(logp) AS max_logp,
      |       round(CAST(sum(CAST(logp AS DECIMAL(18,6))) AS DOUBLE)
      |             / count(*), 6) AS avg_logp
      |FROM ds GROUP BY source ORDER BY source""".stripMargin

  /** Bigram-LM quality ([[graft.ops.BigramLm]], r11): the order-1
    * perplexity filter's per-source card — same shape as the unigram
    * card so the two filters read side by side. */
  def bigramQuality(s: SparkSession, dir: String): DataFrame =
    BigramLm.scores(Tables.documents(s, dir))
      .groupBy("source")
      .agg(count(lit(1)).as("docs"),
        min("logp").as("min_logp"),
        max("logp").as("max_logp"),
        round(sum(col("logp").cast("decimal(18,6)")).cast("double")
          / count(lit(1)), 6).as("avg_logp"))
      .orderBy("source")

  val bigramQualitySql: String =
    """WITH tk AS (
      |  SELECT doc_id, source,
      |         string_split_regex(lower(trim(text)), '[ \t\n\x0B\f\r]+') AS t
      |  FROM documents
      |  WHERE len(string_split_regex(lower(trim(text)), '[ \t\n\x0B\f\r]+')) >= 2
      |), bg AS (
      |  SELECT doc_id, source,
      |         unnest(list_transform(range(len(t) - 1), i -> t[i+1])) AS w1,
      |         unnest(list_transform(range(len(t) - 1), i -> t[i+2])) AS w2
      |  FROM tk
      |), dbc AS (
      |  SELECT doc_id, source, w1, w2, count(*) AS c FROM bg GROUP BY 1, 2, 3, 4
      |), vocab AS (
      |  SELECT w1, w2, CAST(sum(c) AS BIGINT) AS cb FROM dbc GROUP BY 1, 2
      |), hist AS (
      |  SELECT w1, CAST(sum(cb) AS BIGINT) AS ch FROM vocab GROUP BY 1
      |), lp AS (
      |  SELECT w1, w2,
      |         CAST(round(ln(CAST(cb AS DOUBLE) / ch), 6) AS DECIMAL(18,6)) AS lp
      |  FROM vocab JOIN hist USING (w1)
      |), ds AS (
      |  SELECT doc_id, source,
      |         round(CAST(sum(CAST(c AS DECIMAL(18,0)) * lp) AS DOUBLE)
      |               / sum(c), 6) AS logp
      |  FROM dbc JOIN lp USING (w1, w2) GROUP BY 1, 2
      |)
      |SELECT source, count(*) AS docs,
      |       min(logp) AS min_logp, max(logp) AS max_logp,
      |       round(CAST(sum(CAST(logp AS DECIMAL(18,6))) AS DOUBLE)
      |             / count(*), 6) AS avg_logp
      |FROM ds GROUP BY source ORDER BY source""".stripMargin

  /** DSIR data selection ([[graft.ops.Dsir]], r11): score the
    * non-English pool against an English-target hashed-ngram model and
    * keep the 50 most target-like documents — the "make the crawl look
    * like the reference corpus" card. The oracle re-derives the whole
    * chain (md5 feature buckets, add-one smoothed bucket counts, 6dp
    * log-ratio weights, exact decimal per-doc sums) in DuckDB. */
  def dsirSelect(s: SparkSession, dir: String): DataFrame =
    Dsir.scores(Tables.documents(s, dir), targetPred = col("lang") === "en",
        buckets = 4096)
      .select(col("doc_id"), col("source"), col("n_feats"),
        col("log_w"), col("log_w_per_feat"))
      .orderBy(col("log_w").desc, col("doc_id"))
      .limit(50)

  val dsirSelectSql: String =
    """WITH tk AS (
      |  SELECT doc_id, source, (lang = 'en') AS is_t,
      |         string_split_regex(lower(trim(text)), '[ \t\n\x0B\f\r]+') AS t
      |  FROM documents WHERE length(trim(text)) > 0
      |), feats AS (
      |  SELECT doc_id, source, is_t, unnest(t) AS g FROM tk
      |  UNION ALL
      |  SELECT doc_id, source, is_t,
      |         unnest(list_transform(range(len(t) - 1),
      |           i -> t[i+1] || ' ' || t[i+2])) AS g
      |  FROM tk WHERE len(t) >= 2
      |), fb AS (
      |  SELECT doc_id, source, is_t,
      |         ((strpos('0123456789abcdef', substr(md5(g), 1, 1)) - 1) * 4096
      |        + (strpos('0123456789abcdef', substr(md5(g), 2, 1)) - 1) * 256
      |        + (strpos('0123456789abcdef', substr(md5(g), 3, 1)) - 1) * 16
      |        + (strpos('0123456789abcdef', substr(md5(g), 4, 1)) - 1)) % 4096 AS b
      |  FROM feats
      |), dbc AS (
      |  SELECT doc_id, source, is_t, b, count(*) AS c FROM fb GROUP BY 1, 2, 3, 4
      |), bc AS (
      |  SELECT b, CAST(sum(CASE WHEN is_t THEN c ELSE 0 END) AS BIGINT) AS tc,
      |            CAST(sum(CASE WHEN is_t THEN 0 ELSE c END) AS BIGINT) AS rc
      |  FROM dbc GROUP BY b
      |), tot AS (
      |  SELECT CAST(sum(tc) AS BIGINT) AS t, CAST(sum(rc) AS BIGINT) AS r FROM bc
      |), lw AS (
      |  SELECT b, CAST(round(
      |           ln(CAST(tc + 1 AS DOUBLE) / CAST(t + 4096 AS DOUBLE))
      |         - ln(CAST(rc + 1 AS DOUBLE) / CAST(r + 4096 AS DOUBLE)), 6)
      |         AS DECIMAL(18,6)) AS lw
      |  FROM bc, tot
      |), ds AS (
      |  SELECT doc_id, source,
      |         CAST(sum(c) AS BIGINT) AS n_feats,
      |         CAST(sum(CAST(c AS DECIMAL(18,0)) * lw) AS DOUBLE) AS log_w,
      |         round(CAST(sum(CAST(c AS DECIMAL(18,0)) * lw) AS DOUBLE)
      |               / sum(c), 6) AS log_w_per_feat
      |  FROM dbc JOIN lw USING (b) WHERE NOT is_t GROUP BY 1, 2
      |)
      |SELECT doc_id, source, n_feats, log_w, log_w_per_feat
      |FROM ds ORDER BY log_w DESC, doc_id LIMIT 50""".stripMargin

  /** N-gram novelty card (late r11): per source, what fraction of its
    * 8-token grams appear NOWHERE else in the corpus — "how much new
    * content does this feed actually add", the acquisition-side
    * complement of the duplicate-overlap matrix. Grams are per-doc
    * DISTINCT (the [[graft.ops.DupSpans]] convention — raw-case
    * tokens, space-joined), so df counts documents; novelty = grams
    * with df == 1. One (doc, gram) collapse + one gram-grain df
    * aggregate — the exact-substring machinery's cost envelope. */
  def noveltyCard(s: SparkSession, dir: String): DataFrame = {
    val n = 8
    val d = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), TextOps.tokens(col("text")).as("tk"))
      .filter(size(col("tk")) >= n)
    // NOT cached (r18, measured): persisting the exploded gram frame
    // materializes corpus×grams rows to MEMORY_AND_DISK and reads them
    // back in both branches — recomputing the narrow per-row gram
    // build twice is cheaper than one spill write + two spill reads
    // (the q_dup_spans posture; shuffle/broadcast shape unchanged)
    val dgs = d.select(col("doc_id"), col("source"),
      explode(array_distinct(expr(
        s"transform(sequence(0, size(tk) - $n), i -> array_join(slice(tk, i + 1, $n), ' '))")))
        .as("g"))
    val dfT = dgs.groupBy("g").agg(count(lit(1)).as("df"))
    dgs.join(dfT, "g")
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("uniq"))
      .groupBy("source")
      .agg(count(lit(1)).as("docs_scored"),
        sum("n_grams").as("total_grams"),
        sum("uniq").as("unique_grams"),
        round(sum("uniq").cast("double") / sum("n_grams"), 6).as("novelty_frac"))
      .orderBy("source")
  }

  val noveltyCardSql: String =
    """WITH tk AS (
      |  SELECT doc_id, source,
      |         string_split_regex(trim(text), '[ \t\n\x0B\f\r]+') AS t
      |  FROM documents
      |  WHERE len(string_split_regex(trim(text), '[ \t\n\x0B\f\r]+')) >= 8
      |), g AS (
      |  SELECT DISTINCT doc_id, source,
      |         array_to_string(list_slice(t, i + 1, i + 8), ' ') AS g
      |  FROM tk, unnest(range(len(t) - 7)) AS u(i)
      |), df AS (
      |  SELECT g, count(*) AS df FROM g GROUP BY g
      |), per AS (
      |  SELECT doc_id, source, count(*) AS n_grams,
      |         sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS uniq
      |  FROM g JOIN df USING (g) GROUP BY 1, 2
      |)
      |SELECT source, count(*) AS docs_scored,
      |       CAST(sum(n_grams) AS BIGINT) AS total_grams,
      |       CAST(sum(uniq) AS BIGINT) AS unique_grams,
      |       round(CAST(sum(uniq) AS DOUBLE) / sum(n_grams), 6) AS novelty_frac
      |FROM per GROUP BY source ORDER BY source""".stripMargin

  /** Incremental novelty (late r11): the novelty card for an ARRIVAL
    * batch, served from the span state's maintained gram-df store
    * ([[graft.ops.IncrementalSpans.readGramDf]] — append-only partials
    * sum to exact whole-corpus doc-frequencies after any fold
    * sequence) instead of a corpus re-gram. The oracle is the BATCH
    * novelty derivation restricted to the delta's docs, so the hash
    * gate proves maintained-df == recomputed-df through the per-source
    * rollup. At scale the slim (g, df) store would prefilter on the
    * delta's gram bloom (the span fold's own trick); at result grain
    * the plain join is already gram-hash-bucket-prunable. */
  def noveltyIncremental(s: SparkSession, dir: String): DataFrame = {
    dupSpansIncremental(s, dir) // ensure the staged fold-built state
    val path = stagedIncSpans.get(dir)
    val n = 8
    val dgs = Tables.documents(s, dir)
      .filter(col("doc_id") % 10 === 7)
      .select(col("doc_id"), col("source"), TextOps.tokens(col("text")).as("tk"))
      .filter(size(col("tk")) >= n)
      .select(col("doc_id"), col("source"),
        explode(array_distinct(expr(
          s"transform(sequence(0, size(tk) - $n), i -> array_join(slice(tk, i + 1, $n), ' '))")))
          .as("g"))
    dgs.join(IncrementalSpans.readGramDf(s, path), "g")
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("uniq"))
      .groupBy("source")
      .agg(count(lit(1)).as("docs_scored"),
        sum("n_grams").as("total_grams"),
        sum("uniq").as("unique_grams"),
        round(sum("uniq").cast("double") / sum("n_grams"), 6).as("novelty_frac"))
      .orderBy("source")
  }

  val noveltyIncrementalSql: String =
    """WITH tk AS (
      |  SELECT doc_id, source,
      |         string_split_regex(trim(text), '[ \t\n\x0B\f\r]+') AS t
      |  FROM documents
      |  WHERE len(string_split_regex(trim(text), '[ \t\n\x0B\f\r]+')) >= 8
      |), g AS (
      |  SELECT DISTINCT doc_id, source,
      |         array_to_string(list_slice(t, i + 1, i + 8), ' ') AS g
      |  FROM tk, unnest(range(len(t) - 7)) AS u(i)
      |), df AS (
      |  SELECT g, count(*) AS df FROM g GROUP BY g
      |), per AS (
      |  SELECT doc_id, source, count(*) AS n_grams,
      |         sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS uniq
      |  FROM g JOIN df USING (g) WHERE doc_id % 10 = 7 GROUP BY 1, 2
      |)
      |SELECT source, count(*) AS docs_scored,
      |       CAST(sum(n_grams) AS BIGINT) AS total_grams,
      |       CAST(sum(uniq) AS BIGINT) AS unique_grams,
      |       round(CAST(sum(uniq) AS DOUBLE) / sum(n_grams), 6) AS novelty_frac
      |FROM per GROUP BY source ORDER BY source""".stripMargin

  /** Split-leakage card (late r11): duplicate content spanning
    * train/val/test boundaries — THE eval-hygiene number (a test doc
    * whose duplicate sits in train is memorization, not
    * generalization). The fingerprint is the md5 of the first 8
    * tokens: exact whole-doc fingerprints catch only verbatim copies
    * (this fixture has none — every dup is perturbed), while shared
    * openings catch boilerplate and near-dup leakage at exact-match
    * cost, the standard cheap screen before a minhash-grade audit.
    * Collapse to distinct (fp, split), self-join within the
    * fingerprint, count per unordered split pair — all stages
    * fingerprint-scale; text never crosses a shuffle. */
  def splitLeakage(s: SparkSession, dir: String): DataFrame = {
    val toks = TextOps.tokens(lower(col("text")))
    val fps = Tables.documents(s, dir)
      .filter(length(trim(col("text"))) > 0)
      .select(md5(concat_ws(" ", slice(toks, 1, 8))).as("fp"),
        Sampling.splitAssign(col("doc_id")).as("split"))
    val d = fps.select("fp", "split").distinct()
    val a = d.select(col("fp"), col("split").as("split_a"))
    val b = d.select(col("fp"), col("split").as("split_b"))
    a.join(b, "fp").filter(col("split_a") < col("split_b"))
      .groupBy("split_a", "split_b")
      .agg(count(lit(1)).as("shared_fingerprints"))
      .orderBy("split_a", "split_b")
  }

  val splitLeakageSql: String =
    """WITH f AS (
      |  SELECT md5(array_to_string(list_slice(
      |           string_split_regex(lower(trim(text)), '[ \t\n\x0B\f\r]+'), 1, 8), ' ')) AS fp,
      |         ((instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)),1,1))-1) * 4096
      |        + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)),2,1))-1) * 256
      |        + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)),3,1))-1) * 16
      |        + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)),4,1))-1)) % 100 AS pct
      |  FROM documents WHERE length(trim(text)) > 0
      |), d AS (
      |  SELECT DISTINCT fp,
      |         CASE WHEN pct < 80 THEN 'train' WHEN pct < 90 THEN 'val'
      |              ELSE 'test' END AS split
      |  FROM f
      |)
      |SELECT a.split AS split_a, b.split AS split_b,
      |       count(*) AS shared_fingerprints
      |FROM d a JOIN d b ON a.fp = b.fp AND a.split < b.split
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Corpus snapshot diff ([[graft.ops.CorpusDiff]], late r11): two
    * deterministic versions of the documents table (v1 drops the
    * `%10==3` ids; v2 drops `%10==4` and edits every `%7==0` text), the
    * per-source added/removed/changed/unchanged card. Oracle: the same
    * md5-fingerprint full-outer join in DuckDB. */
  def corpusDiff(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val oldV = docs.filter(col("doc_id") % 10 =!= 3)
    val newV = docs.filter(col("doc_id") % 10 =!= 4)
      .withColumn("text", when(col("doc_id") % 7 === 0,
        concat(col("text"), lit(" v2"))).otherwise(col("text")))
    CorpusDiff.diff(oldV, newV)
      .groupBy("source", "status")
      .agg(count(lit(1)).as("n_docs"),
        min("doc_id").as("min_id"), max("doc_id").as("max_id"))
      .orderBy("source", "status")
  }

  val corpusDiffSql: String =
    """WITH oldv AS (
      |  SELECT doc_id, source, text FROM documents WHERE doc_id % 10 <> 3
      |), newv AS (
      |  SELECT doc_id, source,
      |         CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
      |  FROM documents WHERE doc_id % 10 <> 4
      |), o AS (
      |  SELECT doc_id, source, md5(coalesce(CAST(text AS VARCHAR), '<NULL>')) AS fp
      |  FROM oldv
      |), n AS (
      |  SELECT doc_id, source, md5(coalesce(CAST(text AS VARCHAR), '<NULL>')) AS fp
      |  FROM newv
      |), j AS (
      |  SELECT doc_id, coalesce(n.source, o.source) AS source,
      |         CASE WHEN o.fp IS NULL THEN 'added'
      |              WHEN n.fp IS NULL THEN 'removed'
      |              WHEN o.fp <> n.fp THEN 'changed'
      |              ELSE 'unchanged' END AS status
      |  FROM o FULL OUTER JOIN n USING (doc_id)
      |)
      |SELECT source, status, count(*) AS n_docs,
      |       CAST(min(doc_id) AS BIGINT) AS min_id,
      |       CAST(max(doc_id) AS BIGINT) AS max_id
      |FROM j GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  private val stagedFpStore = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Maintained fingerprint state ([[graft.ops.FingerprintStore]],
    * r12 — VERDICT r11 task 8): built on the `%10 != 7` docs, the rest
    * folds in, shared by the two state-served cards below. Text is
    * hashed once per document at ingest; the cards read fixed-width
    * stored rows. */
  private def fpState(s: SparkSession, dir: String): String =
    stagedTempDir(stagedFpStore, dir, "graft_fp_store") { p =>
      val docs = Tables.documents(s, dir).select("doc_id", "source", "text")
      val t0 = System.nanoTime()
      graft.ops.FingerprintStore.writeState(
        docs.filter(col("doc_id") % 10 =!= 7), s"$p/state")
      val t1 = System.nanoTime()
      graft.ops.FingerprintStore.applyDelta(s, s"$p/state",
        docs.filter(col("doc_id") % 10 === 7), foldId = Some("b0"))
      stageTimings("q_split_leakage_incremental") = Seq(
        "write_state" -> (t1 - t0) / 1e9,
        "fold" -> (System.nanoTime() - t1) / 1e9)
    }

  /** Split-leakage card from the maintained store — gated by the SAME
    * oracle SQL as the batch card: the hash match IS the
    * "maintained state == raw-text recompute" contract. */
  def splitLeakageIncremental(s: SparkSession, dir: String): DataFrame =
    graft.ops.FingerprintStore.splitLeakageCard(s, s"${fpState(s, dir)}/state")

  /** Corpus diff served from the maintained store: the OLD side is the
    * stored fingerprints for the `%10 != 3` snapshot (no old-text
    * re-hash — its own state, built + folded), the new side hashes
    * fresh. Same oracle SQL as q_corpus_diff. */
  def corpusDiffIncremental(s: SparkSession, dir: String): DataFrame = {
    val path = stagedTempDir(stagedFpStore, s"$dir#oldv", "graft_fp_oldv") { p =>
      val docs = Tables.documents(s, dir).select("doc_id", "source", "text")
      val oldV = docs.filter(col("doc_id") % 10 =!= 3)
      val t0 = System.nanoTime()
      graft.ops.FingerprintStore.writeState(
        oldV.filter(col("doc_id") % 2 === 0), s"$p/state")
      val t1 = System.nanoTime()
      graft.ops.FingerprintStore.applyDelta(s, s"$p/state",
        oldV.filter(col("doc_id") % 2 =!= 0), foldId = Some("b0"))
      stageTimings("q_corpus_diff_incremental") = Seq(
        "write_state" -> (t1 - t0) / 1e9,
        "fold" -> (System.nanoTime() - t1) / 1e9)
    }
    val docs = Tables.documents(s, dir)
    val newV = docs.filter(col("doc_id") % 10 =!= 4)
      .withColumn("text", when(col("doc_id") % 7 === 0,
        concat(col("text"), lit(" v2"))).otherwise(col("text")))
    graft.ops.FingerprintStore.diffAgainst(s, s"$path/state", newV)
      .groupBy("source", "status")
      .agg(count(lit(1)).as("n_docs"),
        min("doc_id").as("min_id"), max("doc_id").as("max_id"))
      .orderBy("source", "status")
  }

  /** Overlapping retrieval chunks ([[graft.ops.Chunking]], late r11):
    * every document fanned out to 64-token windows at stride 48 — the
    * RAG-export unit. The oracle re-derives starts, counts and the
    * joined chunk text in DuckDB, so the hash gate pins the exact
    * boundary arithmetic (coverage of the tail, the short-doc single
    * chunk, the overlap region) across engines. */
  def chunksExport(s: SparkSession, dir: String): DataFrame =
    Chunking.chunks(Tables.documents(s, dir), window = 64, stride = 48)
      .orderBy("doc_id", "chunk_id")

  val chunksExportSql: String =
    """WITH tk AS (
      |  SELECT doc_id, source,
      |         string_split_regex(lower(trim(text)), '[ \t\n\x0B\f\r]+') AS t
      |  FROM documents WHERE length(trim(text)) > 0
      |), ks AS (
      |  SELECT doc_id, source, t, len(t) AS n,
      |         CAST(floor((greatest(len(t) - 64, 0) + 47) / 48.0) AS INT) AS k
      |  FROM tk
      |)
      |SELECT doc_id, source, CAST(i AS INT) AS chunk_id,
      |       k + 1 AS n_chunks, CAST(i * 48 AS INT) AS chunk_start,
      |       CAST(least(64, n - i * 48) AS INT) AS n_tokens,
      |       array_to_string(list_slice(t, i * 48 + 1, least(i * 48 + 64, n)), ' ')
      |         AS chunk_text
      |FROM ks, unnest(range(k + 1)) AS u(i)
      |ORDER BY doc_id, chunk_id""".stripMargin

  /** Chunking through its SQL TVF surface (r13 — VERDICT r12 task 6:
    * the last Scala-only operator family; the reference's only query
    * surface is SQL): the SAME export as q_chunks via
    * `graft_chunks('view', window, stride)`, gated by the SAME oracle,
    * so the hash match proves SQL == DataFrame == DuckDB re-derivation. */
  def sqlChunks(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir).createOrReplaceTempView("graft_chunk_docs")
    s.sql(
      """SELECT doc_id, source, chunk_id, n_chunks, chunk_start,
        |       n_tokens, chunk_text
        |FROM graft_chunks('graft_chunk_docs', 64, 48)
        |ORDER BY doc_id, chunk_id""".stripMargin)
  }

  private val stagedDsirStore = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Incremental DSIR ([[graft.ops.DsirStore]]): the model counts fold
    * in three deterministic arrival batches (`doc_id % 3`), then the
    * full pool is scored FROM THE STORE. Oracle = the batch q_dsir SQL
    * verbatim — the hash gate IS the fold==rebuild contract (exact
    * element-wise count sums make it hold under any arrival order). */
  def dsirIncremental(s: SparkSession, dir: String): DataFrame = {
    val pred = col("lang") === "en"
    val path = stagedTempDir(stagedDsirStore, dir, "graft_dsir_store") { p =>
      val docs = Tables.documents(s, dir)
      val t0 = System.nanoTime()
      DsirStore.writeCounts(docs.filter(col("doc_id") % 3 === 0), pred, s"$p/s")
      val t1 = System.nanoTime()
      DsirStore.applyDelta(s, s"$p/s", docs.filter(col("doc_id") % 3 === 1),
        pred, foldId = Some("b1"))
      DsirStore.applyDelta(s, s"$p/s", docs.filter(col("doc_id") % 3 === 2),
        pred, foldId = Some("b2"))
      stageTimings("q_dsir_incremental") = Seq(
        "write_counts" -> (t1 - t0) / 1e9,
        "fold" -> (System.nanoTime() - t1) / 1e9)
    }
    DsirStore.scoresFromState(s, s"$path/s", Tables.documents(s, dir), pred)
      .select(col("doc_id"), col("source"), col("n_feats"),
        col("log_w"), col("log_w_per_feat"))
      .orderBy(col("log_w").desc, col("doc_id"))
      .limit(50)
  }

  // ---------------------------------------------------------- BM25 retrieval

  /** The fixed audit probe for the BM25 queries: one rare term (df≈5%
    * of the corpus — high idf, drives the ranking) plus three
    * corpus-common terms, so the score mixes a discriminative match
    * with tf/length normalization effects. */
  private val Bm25Probe = "dup merge stream window"

  /** BM25 lexical retrieval ([[graft.ops.Bm25]]): top-15 documents for
    * the audit probe — the keyword-side complement of the ANN queries
    * (eval-set mining / "documents like this" curation audits). The
    * (score desc, doc_id asc) total order makes the cut deterministic. */
  def bm25(s: SparkSession, dir: String): DataFrame =
    bm25Card(Bm25.scores(
      Tables.documents(s, dir).select("doc_id", "source", "text"), Bm25Probe))

  /** Rank card over a [[graft.ops.Bm25]] score frame — shared by the
    * batch, indexed, and incremental queries so all three gate against
    * the same oracle SQL. Result-grain window (matched docs only). */
  private def bm25Card(scores: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col("doc_id").asc)
    scores.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 15)
      .select("rank", "doc_id", "source", "n_terms", "score")
      .orderBy("rank")
  }

  private val stagedBm25Idx = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val stagedBm25Inc = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** BM25 served from the persisted inverted index
    * ([[graft.ops.Bm25Index]], staged once per JVM/dir): the probe
    * reads only the query terms' hash-buckets — no corpus scan. Gated
    * by the SAME oracle SQL as the batch query: the hash match proves
    * indexed == batch. */
  def bm25Indexed(s: SparkSession, dir: String): DataFrame = {
    val path = stagedTempDir(stagedBm25Idx, dir, "graft_bm25_idx") { p =>
      Bm25Index.writeState(
        Tables.documents(s, dir).select("doc_id", "source", "text"), s"$p/state")
    }
    bm25Card(Bm25Index.scoresFromState(s, s"$path/state", Bm25Probe))
  }

  /** Incrementally-maintained BM25 index: state built on the first
    * id-quartile, three folds absorb the rest, probe from the
    * maintained store — same oracle SQL, so the hash gate IS the
    * fold == rebuild contract (exact under ANY arrival order: every
    * index table is purely additive). */
  def bm25Incremental(s: SparkSession, dir: String): DataFrame = {
    val path = stagedTempDir(stagedBm25Inc, dir, "graft_bm25_inc") { p =>
      val docs = Tables.documents(s, dir).select("doc_id", "source", "text")
      val t = quartileSplits(docs)
      val t0 = System.nanoTime()
      Bm25Index.writeState(docs.filter(col("doc_id") < t(0)), s"$p/state")
      val tState = System.nanoTime()
      // count the bucket compactions that ride inside the folds (r14,
      // VERDICT r13 task 6): the fold samples spanned 5.8–16.6 s in the
      // r13 dedicated pass, and whether a rep crosses a compactAt
      // threshold is what separates the tails — recording the count IN
      // the stage split lets the artifact attribute its own variance.
      val c0 = graft.ops.BucketStore.compactedBuckets.sum()
      Seq(
        docs.filter(col("doc_id") >= t(0) && col("doc_id") < t(1)),
        docs.filter(col("doc_id") >= t(1) && col("doc_id") < t(2)),
        docs.filter(col("doc_id") >= t(2)))
        .zipWithIndex.foreach { case (b, i) =>
          Bm25Index.applyDelta(s, s"$p/state", b, foldId = Some(s"b$i"))
        }
      stageTimings("q_bm25_incremental") = Seq(
        "write_state" -> (tState - t0) / 1e9,
        "fold" -> (System.nanoTime() - tState) / 1e9)
      stageCounters("q_bm25_incremental") = Seq(
        "fold_compacted_buckets" ->
          (graft.ops.BucketStore.compactedBuckets.sum() - c0))
    }
    bm25Card(Bm25Index.scoresFromState(s, s"$path/state", Bm25Probe))
  }

  /** Exact top-15 via MaxScore dynamic pruning
    * ([[graft.ops.Bm25Index.topKFromState]]): the probe mixes one rare
    * term with three stopword-grade terms (df ≈ 0.8·N — exactly what
    * `maxDfRatio` would drop), and the oracle is UNPRUNED full scoring
    * over the whole corpus, so the hash gate proves the pruned path
    * changes nothing while only fully scoring the rare term's
    * matches. */
  def bm25TopK(s: SparkSession, dir: String): DataFrame = {
    val path = stagedTempDir(stagedBm25Idx, dir, "graft_bm25_idx") { p =>
      Bm25Index.writeState(
        Tables.documents(s, dir).select("doc_id", "source", "text"), s"$p/state")
    }
    val top = Bm25Index.topKFromState(s, s"$path/state", Bm25TopKProbe, k = 15)
    bm25Card(top)
  }

  private val Bm25TopKProbe = "dup the part order"

  val bm25TopKSql: String = bm25SqlFor(Seq("dup", "the", "part", "order"))

  /** Phrase probe served from the INCREMENTALLY-built index (the
    * q_bm25_incremental staging — state + three folds): same raw-text
    * oracle as q_phrase_search, so the hash gate proves the positional
    * postings survive the fold path occurrence-for-occurrence too. */
  def phraseSearchIncremental(s: SparkSession, dir: String): DataFrame = {
    bm25Incremental(s, dir) // ensure the staged fold-built index exists
    val path = stagedBm25Inc.get(dir)
    Bm25Index.phraseFromState(s, s"$path/state", "small query line")
      .orderBy(col("n_hits").desc, col("doc_id"))
  }

  /** TF-IDF top-3 terms per document served from the MAINTAINED
    * inverted index (r12): tf from postings, df from the summed
    * partials, N from the stats table — keyword extraction with no
    * corpus re-tokenize, over the same fold-built state as
    * q_bm25_incremental. The oracle recomputes lowered TF-IDF over
    * token-bearing docs from raw text (the index's tokenization
    * contract), so the hash gate proves index-served == recompute
    * across the writeState + 3-folds build. */
  def tfidfIncremental(s: SparkSession, dir: String): DataFrame = {
    bm25Incremental(s, dir) // ensure the staged fold-built index exists
    val path = stagedBm25Inc.get(dir)
    Bm25Index.tfidfFromState(s, s"$path/state").orderBy("doc_id", "rk")
  }

  /** TF-IDF keywords through the SQL TVF surface (r13): the same
    * fold-built index as q_tfidf_incremental via `graft_tfidf(root,
    * k)`, same raw-text oracle — the hash gate proves SQL ==
    * index-served == recompute. */
  def sqlTfidf(s: SparkSession, dir: String): DataFrame = {
    bm25Incremental(s, dir) // ensure the staged fold-built index exists
    val path = stagedBm25Inc.get(dir)
    s.sql(
      s"""SELECT doc_id, rk, word, score
         |FROM graft_tfidf('$path/state', 3)
         |ORDER BY doc_id, rk""".stripMargin)
  }

  val tfidfIncrementalSql: String =
    """WITH w AS (
      |  SELECT doc_id, string_split_regex(lower(trim(text)), '[ \t\n\x0B\f\r]+') AS ws
      |  FROM documents WHERE length(trim(text)) > 0
      |), u AS (
      |  SELECT doc_id, unnest(ws) AS word FROM w
      |), tf AS (
      |  SELECT doc_id, word, count(*) AS tf FROM u GROUP BY 1, 2
      |), dfreq AS (
      |  SELECT word, count(*) AS df FROM tf GROUP BY 1
      |), n AS (
      |  SELECT count(*) AS n_docs FROM w
      |), scored AS (
      |  SELECT tf.doc_id, tf.word,
      |         round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfreq.df), 6) AS score
      |  FROM tf JOIN dfreq USING (word) CROSS JOIN n
      |), ranked AS (
      |  SELECT doc_id, word, score,
      |         CAST(row_number() OVER (PARTITION BY doc_id
      |           ORDER BY score DESC, word ASC) AS INT) AS rk
      |  FROM scored
      |)
      |SELECT doc_id, rk, word, score FROM ranked
      |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin

  /** Exact-phrase search from the positional index
    * ([[graft.ops.Bm25Index.phraseFromState]], r11): every document
    * containing the probe phrase as consecutive tokens, with its hit
    * count, served from posting lists alone. The oracle re-derives the
    * hits from RAW TEXT (a token-trigram scan), so the hash gate
    * proves index-derived == text-derived occurrence-for-occurrence. */
  def phraseSearch(s: SparkSession, dir: String): DataFrame = {
    val path = stagedTempDir(stagedBm25Idx, dir, "graft_bm25_idx") { p =>
      Bm25Index.writeState(
        Tables.documents(s, dir).select("doc_id", "source", "text"), s"$p/state")
    }
    Bm25Index.phraseFromState(s, s"$path/state", "small query line")
      .orderBy(col("n_hits").desc, col("doc_id"))
  }

  val phraseSearchSql: String =
    """WITH tk AS (
      |  SELECT doc_id, source,
      |         string_split_regex(lower(trim(text)), '[ \t\n\x0B\f\r]+') AS t
      |  FROM documents WHERE length(trim(text)) > 0
      |), hits AS (
      |  SELECT doc_id, source,
      |         CAST(len(list_filter(range(len(t) - 2),
      |               i -> t[i+1] = 'small' AND t[i+2] = 'query'
      |                    AND t[i+3] = 'line')) AS BIGINT) AS n_hits
      |  FROM tk
      |)
      |SELECT doc_id, source, n_hits FROM hits WHERE n_hits > 0
      |ORDER BY n_hits DESC, doc_id""".stripMargin

  /** The BM25 math re-derived in DuckDB — idf and each (doc, term)
    * contribution 6dp-fixed as DECIMAL(18,6) with per-doc sums in
    * exact decimal arithmetic, mirroring [[graft.ops.Bm25]]'s
    * determinism contract term for term (same literal constants, same
    * association, IEEE doubles both sides). */
  val bm25Sql: String = bm25SqlFor(Seq("dup", "merge", "stream", "window"))

  /** The BM25 oracle, parametrized by probe terms — shared by the
    * four-path family (batch / indexed / incremental / top-k): ONE
    * full-scoring SQL per probe, so every engine path gates against
    * unpruned, whole-corpus scoring. */
  def bm25SqlFor(terms: Seq[String]): String =
    raw"""WITH q AS (
      |  SELECT * FROM (VALUES ${terms.map(t => s"('$t')").mkString(", ")}) AS t(w)
      |), tk AS (
      |  SELECT doc_id, source,
      |         CAST(len(string_split_regex(lower(trim(text)), '[ \t\n\x0B\f\r]+')) AS BIGINT) AS dl,
      |         unnest(string_split_regex(lower(trim(text)), '[ \t\n\x0B\f\r]+')) AS w
      |  FROM documents WHERE length(trim(text)) > 0
      |), tf AS (
      |  SELECT doc_id, source, dl, w, count(*) AS tf
      |  FROM tk JOIN q USING (w) GROUP BY 1, 2, 3, 4
      |), stats AS (
      |  SELECT count(*) AS n,
      |         CAST(sum(CAST(len(string_split_regex(lower(trim(text)), '[ \t\n\x0B\f\r]+')) AS BIGINT)) AS BIGINT) AS tot
      |  FROM documents WHERE length(trim(text)) > 0
      |), df AS (
      |  SELECT w, count(*) AS df FROM tf GROUP BY 1
      |), idf AS (
      |  SELECT w,
      |         CAST(round(ln((CAST(n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
      |                       / (CAST(df AS DOUBLE) + 0.5) + 1.0), 6)
      |              AS DECIMAL(18,6)) AS idf
      |  FROM df, stats
      |), scored AS (
      |  SELECT doc_id, source,
      |         CAST(round(CAST(idf AS DOUBLE)
      |                    * (CAST(tf AS DOUBLE) * (1.2 + 1.0))
      |                    / (CAST(tf AS DOUBLE)
      |                       + 1.2 * ((1.0 - 0.75)
      |                                + 0.75 * (CAST(dl AS DOUBLE)
      |                                          / (CAST(tot AS DOUBLE) / n)))), 6)
      |              AS DECIMAL(18,6)) AS c
      |  FROM tf JOIN idf USING (w), stats
      |), ds AS (
      |  SELECT doc_id, source, count(*) AS n_terms,
      |         CAST(sum(c) AS DOUBLE) AS score
      |  FROM scored GROUP BY 1, 2
      |)
      |SELECT * FROM (
      |  SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
      |         doc_id, source, n_terms, score
      |  FROM ds
      |) WHERE rank <= 15 ORDER BY rank""".stripMargin

  /** SemDeDup (r11, [[graft.ops.SemDeDup]]): semantic near-dup removal
    * over the embedding table — per-cell curation card. θ = 0.42 here:
    * the synthetic embeddings top out near cosine 0.51, so a
    * production θ (0.95) would exercise nothing — the threshold is on
    * raw (un-rounded) cosine, and both engines compute the identical
    * double fold, so the θ-set matches exactly at any value. */
  def semDedup(s: SparkSession, dir: String): DataFrame =
    // k is PINNED to the oracle's LIMIT 8 anchor draw (ADVICE r12: the
    // auto-k formula resolves to 8 only while the fixture stays ≤2000
    // vectors — fixture growth would flip k far from the cause, and the
    // auto path pays an extra corpus count() per invocation). The scale
    // sweep exercises auto-k via [[semDedupAutoK]].
    semDedupCard(s, dir, k = 8)

  /** The sweep's entry point: auto-k (k grows with the corpus — the r12
    * scale contract), NOT oracle-gated. */
  def semDedupAutoK(s: SparkSession, dir: String): DataFrame =
    semDedupCard(s, dir, k = 0)

  private def semDedupCard(s: SparkSession, dir: String, k: Int): DataFrame =
    SemDeDup.semDedup(Tables.embeddings(s, dir), k = k, theta = 0.42)
      .groupBy("cell")
      .agg(count(lit(1)).as("n_vecs"),
        count(when(col("kept"), 1)).as("kept"),
        count(when(!col("kept"), 1)).as("dropped"))
      .orderBy("cell")

  val semDedupSql: String = {
    def cosRaw(x: String, y: String) =
      s"${dotFold(x, y)} / (sqrt(${dotFold(x, x)}) * sqrt(${dotFold(y, y)}))"
    s"""WITH ranked AS (
       |  SELECT vec_id, embedding
       |  FROM embeddings
       |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8
       |), anchors AS (
       |  SELECT vec_id AS a_vec, embedding AS a_emb,
       |         row_number() OVER (
       |           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS anum
       |  FROM ranked
       |), scored AS (
       |  SELECT e.vec_id, a.anum, ${cosRaw("e.embedding", "a.a_emb")} AS c
       |  FROM embeddings e CROSS JOIN anchors a
       |), assign AS (
       |  SELECT vec_id, anum AS cell FROM (
       |    SELECT vec_id, anum,
       |           row_number() OVER (PARTITION BY vec_id
       |                              ORDER BY c DESC, anum ASC) AS rn
       |    FROM scored) WHERE rn = 1
       |), dropped AS (
       |  SELECT DISTINCT b.vec_id
       |  FROM assign a JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  JOIN embeddings ea ON ea.vec_id = a.vec_id
       |  JOIN embeddings eb ON eb.vec_id = b.vec_id
       |  WHERE ${cosRaw("ea.embedding", "eb.embedding")} >= 0.42
       |)
       |SELECT cell, count(*) AS n_vecs,
       |       count(CASE WHEN d.vec_id IS NULL THEN 1 END) AS kept,
       |       count(d.vec_id) AS dropped
       |FROM assign LEFT JOIN dropped d USING (vec_id)
       |GROUP BY cell ORDER BY cell""".stripMargin
  }

  /** Corpus cluster-mixture card: distributed Lloyd k-means (k=6,
    * 3 iterations) over the embeddings, then per-cluster size, exact-
    * decimal inertia, and dominant label + purity. The whole loop is
    * partitioning-invariant (decimal-sum means) and replayed by the
    * oracle as 3 unrolled CTE iterations — the hash gate proves a
    * multi-round DISTRIBUTED fixpoint is bit-reproducible
    * cross-engine, init through final card. */
  def kmeansCard(s: SparkSession, dir: String): DataFrame =
    KMeans.card(Tables.embeddings(s, dir), k = 6, iters = 3, dim = 64)
      .orderBy("cluster")

  lazy val kmeansCardSql: String = {
    // the engine's exact left-to-right Σ(v_i − c_i)² fold
    def d2(v: String, c: String) =
      s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
        s"list_transform(list_zip($v, $c), pr -> " +
        s"(CAST(pr[1] AS DOUBLE) - CAST(pr[2] AS DOUBLE)) * " +
        s"(CAST(pr[1] AS DOUBLE) - CAST(pr[2] AS DOUBLE)))), " +
        s"(acc, x) -> acc + x)"
    val iters = (1 to 3).map { i =>
      s"""a$i AS (
         |  SELECT vec_id, embedding, cl FROM (
         |    SELECT e.vec_id, e.embedding, c.cl,
         |           row_number() OVER (PARTITION BY e.vec_id
         |             ORDER BY ${d2("e.embedding", "c.c")} ASC, c.cl ASC) AS rn
         |    FROM embeddings e CROSS JOIN c${i - 1} c) t WHERE rn = 1
         |), u$i AS (
         |  SELECT cl, j,
         |         CAST(sum(CAST(CAST(embedding[j] AS DOUBLE) AS DECIMAL(27,12))) AS DOUBLE)
         |           / count(*) AS m
         |  FROM a$i CROSS JOIN js GROUP BY cl, j
         |), n$i AS (
         |  SELECT cl, list(m ORDER BY j) AS c FROM u$i GROUP BY cl
         |), c$i AS (
         |  SELECT p.cl, coalesce(n.c, p.c) AS c
         |  FROM c${i - 1} p LEFT JOIN n$i n USING (cl)
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH c0 AS (
       |  SELECT row_number() OVER (
       |           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cl,
       |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS c
       |  FROM (SELECT vec_id, embedding FROM embeddings
       |        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 6) seed
       |), js AS (
       |  SELECT unnest(range(1, 65)) AS j
       |), $iters, af AS (
       |  SELECT vec_id, label, cl, d2 FROM (
       |    SELECT e.vec_id, e.label, c.cl,
       |           ${d2("e.embedding", "c.c")} AS d2,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${d2("e.embedding", "c.c")} ASC, c.cl ASC) AS rn
       |    FROM embeddings e CROSS JOIN c3 c) t WHERE rn = 1
       |), sz AS (
       |  SELECT cl AS cluster, count(*) AS size,
       |         round(CAST(sum(CAST(d2 AS DECIMAL(27,6))) AS DOUBLE), 6) AS inertia
       |  FROM af GROUP BY 1
       |), lb AS (
       |  SELECT cluster, label AS top_label, c AS topc FROM (
       |    SELECT cl AS cluster, label, count(*) AS c,
       |           row_number() OVER (PARTITION BY cl
       |             ORDER BY count(*) DESC, label ASC) AS rn
       |    FROM af GROUP BY cl, label) t WHERE rn = 1
       |)
       |SELECT CAST(s.cluster AS INT) AS cluster, s.size, s.inertia,
       |       l.top_label, round(CAST(l.topc AS DOUBLE) / s.size, 6) AS purity
       |FROM sz s JOIN lb l USING (cluster) ORDER BY cluster""".stripMargin
  }

  /** Winnowing (rolling-hash) fingerprint dedup: docs sharing
    * fingerprints are near-dup candidates, ranked by overlap count
    * (fully oracled — winnowDedupSql recomputes the polynomial hash in
    * DuckDB; the winnowing guarantee is additionally spec-tested).
    *
    * Skew guard (the 100 TB make-or-break of this operator): a
    * fingerprint shared by m documents produces m² join rows, and at
    * web scale one boilerplate fragment (license header) can sit in
    * 10⁶ docs → 10¹² pairs. Fingerprints with document-frequency above
    * `maxDocFreq` carry no near-dup signal — they're corpus-wide
    * boilerplate, not evidence two specific docs match — so they are
    * dropped before the self-join, mirroring MinHashLSH's
    * `maxBucketSize`. df<2 fingerprints can't produce a pair and are
    * pruned by the same census. */
  def winnowDedup(s: SparkSession, dir: String, maxDocFreq: Int = 64): DataFrame = {
    val prints = Persists.cache(Tables.documents(s, dir)
      .select(col("doc_id"),
        explode(graft.functions.WinnowingFingerprints(col("text"))).as("fp")))
    // fingerprint census: map-side-combinable aggregate, then an
    // equi-join filter — never a window over the exploded table. No
    // (fp, doc_id) distinct: WinnowingFingerprints already emits a
    // distinct set per doc, so that distinct was a full shuffle of the
    // exploded table for nothing (removed r5 with the decontam twin)
    val okFp = prints
      .groupBy("fp").count()
      .filter(col("count") >= 2 && col("count") <= maxDocFreq)
      .select("fp")
    val slim = Persists.cache(prints.join(okFp, "fp"))
    val a = slim.select(col("fp"), col("doc_id").as("a_id"))
    val b = slim.select(col("fp"), col("doc_id").as("b_id"))
    a.join(b, "fp").filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("shared_prints"))
      .orderBy(desc("shared_prints"), asc("a_id"), asc("b_id"))
      .limit(20)
  }

  /** DuckDB re-expression of winnowDedup. The engine's rolling hash is
    * its OWN polynomial hash mod 2^61 (WinnowingFingerprints.compute:
    * `& Mask` with Mask=2^61-1 keeps the low 61 bits), and a rolling
    * update is algebraically identical to the direct per-gram
    * polynomial fold under the same modulus — so each k-gram hash is
    * re-derivable in SQL as `sum(c_i * B^(k-1-i)) mod 2^61` with the
    * powers B^7..B^0 mod 2^61 precomputed as literals. HUGEINT keeps
    * the 255·2^61-scale partial products exact; fixture text is ASCII
    * (FixtureSpec guard) so ord(char) == byte. Window minima only ever
    * select a VALUE (the tie rule picks an index), so winnowing is
    * `list_min` over each 16-slice, deduped. Cross-checked against a
    * bit-exact Python port of compute() on all sf0.001 docs. */
  val winnowDedupSql: String =
    """WITH codes AS (
      |  SELECT doc_id,
      |         list_transform(range(1, length(text)+1), i -> CAST(ord(substr(text, i, 1)) AS HUGEINT)) AS cs,
      |         length(text) AS n
      |  FROM documents WHERE length(text) >= 8
      |), grams AS (
      |  SELECT doc_id,
      |    list_transform(range(1, n - 8 + 2), i ->
      |      CAST((cs[i]*2097721027717068535 + cs[i+1]*1423083718267137937
      |          + cs[i+2]*314910867472446375 + cs[i+3]*2173964608407773537
      |          + cs[i+4]*234043264273350487 + cs[i+5]*1000000014000000049
      |          + cs[i+6]*1000000007 + cs[i+7]) % 2305843009213693952 AS BIGINT)) AS gs
      |  FROM codes
      |), fps AS (
      |  SELECT doc_id,
      |         CASE WHEN len(gs) <= 16 THEN [list_min(gs)]
      |              ELSE list_distinct(list_transform(range(1, len(gs) - 16 + 2),
      |                     w -> list_min(gs[w : w + 15]))) END AS fp_set
      |  FROM grams
      |), prints AS (
      |  SELECT doc_id, unnest(fp_set) AS fp FROM fps
      |), census AS (
      |  SELECT fp FROM prints GROUP BY fp HAVING count(*) BETWEEN 2 AND 64
      |), slim AS (
      |  SELECT p.doc_id, p.fp FROM prints p JOIN census USING (fp)
      |)
      |SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS shared_prints
      |FROM slim a JOIN slim b USING (fp)
      |WHERE a.doc_id < b.doc_id
      |GROUP BY a.doc_id, b.doc_id
      |ORDER BY shared_prints DESC, a_id, b_id
      |LIMIT 20""".stripMargin

  /** Duplicate-cluster resolution: transitively merge docs linked by
    * shared structural keys (first-3-words, last-3-words) into
    * connected components; each doc gets its cluster's canonical id
    * (min doc_id — the survivor a dedup stage keeps) + cluster size.
    * Oracled: DuckDB computes the same fixpoint with a recursive CTE
    * (min reachable label over the symmetric edge set). */
  private val stagedClusters = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The cluster graph's structural keys: first-3-words and
    * last-3-words of each document (shared by the batch and the
    * incremental cluster queries — key identity is (column, value)).
    * Column-level variant so a STREAMING microbatch can derive its
    * keys in-batch (r10). */
  private[graft] def clusterKeyedOf(df: DataFrame): DataFrame = {
    val words = split(col("text"), " ")
    df.select(col("doc_id"),
      array_join(slice(words, 1, 3), " ").as("k1"),
      array_join(slice(reverse(words), 1, 3), " ").as("k2"))
  }

  private[graft] def clusterKeyed(s: SparkSession, dir: String): DataFrame =
    clusterKeyedOf(Tables.documents(s, dir))

  /** Cluster labels staged once per (JVM, dir) — the minhash-pairs
    * staging pattern: q_dedup_clusters' FIRST run pays the full
    * connected-components compute + staging (the honest pipeline
    * number; it is in Bench's singleRun set), and q_dedup_manifest —
    * the downstream canonicalization step — replays the parquet
    * instead of re-running the fixpoint. */
  private def clusterLabels(s: SparkSession, dir: String): DataFrame = {
    val path = stagedTempDir(stagedClusters, dir, "graft_dedup_clusters") { p =>
      val tcc0 = System.nanoTime()
      val keyed = clusterKeyed(s, dir)
      val edges = ConnectedComponents.keyEdges(keyed, "doc_id", Seq("k1", "k2"))
      // checkEvery=1: keyEdges graphs are hub-shaped and hub-min init
      // already pre-pays the first propagation round, so the bulk
      // window needs ONE full round before the cheap frontier tail
      // takes over (r8; 2 full rounds re-materialized labels that only
      // 24 of 50k rows were still moving)
      val comp = ConnectedComponents.run(
        keyed.select(col("doc_id").as("id")), edges, checkEvery = 1)
      // one shuffle total: repartition by component both CLUSTERS each
      // component's rows for the manifest's downstream window AND lets
      // the same partitioning serve the cluster_size window count — no
      // separate groupBy stage, no broadcast build (r8; was
      // groupBy + broadcast join, ~0.4 s slower and a driver collect)
      val wComp = org.apache.spark.sql.expressions.Window.partitionBy("component")
      comp.repartition(col("component"))
        .select(col("id").as("doc_id"), col("component"),
          count(lit(1)).over(wComp).as("cluster_size"))
        .write.mode("overwrite").parquet(p)
      // the CC compute + staging write is the honest q_dedup_clusters
      // cost; sweep repeats replay the parquet (see q_dedup_minhash)
      stageTimings("q_dedup_clusters") = Seq(
        "cc_label" -> (System.nanoTime() - tcc0) / 1e9)
    }
    s.read.parquet(path)
  }

  def dedupClusters(s: SparkSession, dir: String): DataFrame =
    clusterLabels(s, dir).orderBy("doc_id")

  /** Exact-substring duplicate spans ([[graft.ops.DupSpans]], the Lee
    * et al. 2022 ExactSubstr operation at 8-token-gram granularity):
    * the maximal duplicated regions INSIDE each document — what a
    * pipeline clips (boilerplate, licenses, quoted blocks) from docs
    * it otherwise keeps. */
  def dupSpans(s: SparkSession, dir: String): DataFrame =
    graft.ops.DupSpans.duplicateSpans(Tables.documents(s, dir), n = 8)
      .orderBy("doc_id", "span_start")

  val dupSpansSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(trim(text), '[ \t\n\x0B\f\r]+') AS tk
      |  FROM documents
      |), grams AS (
      |  SELECT doc_id, CAST(i AS BIGINT) AS pos,
      |         array_to_string(tk[i + 1:i + 8], ' ') AS g
      |  FROM toks, unnest(range(len(tk) - 7)) AS t(i)
      |  WHERE len(tk) >= 8
      |), gdf AS (
      |  SELECT g, count(DISTINCT doc_id) AS c FROM grams
      |  GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
      |), hits AS (
      |  SELECT gr.doc_id, gr.pos, d.c FROM grams gr JOIN gdf d USING (g)
      |), islands AS (
      |  SELECT doc_id, pos, c,
      |         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS island
      |  FROM hits
      |)
      |SELECT doc_id, min(pos) AS span_start, max(pos) + 8 AS span_end,
      |       max(c) AS n_docs_max
      |FROM islands GROUP BY doc_id, island
      |ORDER BY doc_id, span_start""".stripMargin

  private val stagedIncSpans = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Incremental span maintenance end-to-end ([[graft.ops
    * .IncrementalSpans]]): docs with `doc_id % 10 = 7` play the
    * freshly-arrived batch, the rest the already-indexed corpus. The
    * state builds once, the delta FOLDS in (affected docs only), and
    * the query replays the maintained span store — the oracle is the
    * BATCH span SQL over the full corpus, so the hash gate IS the
    * fold==rebuild contract. */
  def dupSpansIncremental(s: SparkSession, dir: String): DataFrame = {
    val path = stagedTempDir(stagedIncSpans, dir, "graft_inc_spans") { p =>
      val docs = Tables.documents(s, dir)
      val t0 = System.nanoTime()
      graft.ops.IncrementalSpans.writeState(
        docs.filter(col("doc_id") % 10 =!= 7), p)
      val t1 = System.nanoTime()
      graft.ops.IncrementalSpans.applyDelta(
        s, p, docs.filter(col("doc_id") % 10 === 7))
      stageTimings("q_dup_spans_incremental") = Seq(
        "write_state" -> (t1 - t0) / 1e9,
        "fold" -> (System.nanoTime() - t1) / 1e9)
    }
    graft.ops.IncrementalSpans.readSpans(s, path).orderBy("doc_id", "span_start")
  }

  /** Span-coverage corpus card: per source, how much token mass sits
    * inside exact-substring duplicate spans — the "what fraction of
    * this feed is boilerplate" number next to the doc-level funnel.
    * Islands closer than one gram width overlap as TOKEN intervals
    * (starts 0 and 3 at n=8 → [0,8) and [3,11)), so spans are
    * interval-UNIONED per doc (classic merge via the running-max-end
    * window) before the mass sums — double counting would overstate
    * coverage exactly on the heavily-duplicated docs that matter. */
  def spanCoverage(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val spans = graft.ops.DupSpans.duplicateSpans(docs, n = 8)
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("span_start")
    val prevMax = max("span_end").over(byDoc.rowsBetween(Long.MinValue, -1))
    val merged = spans
      .withColumn("new_grp",
        when(prevMax.isNull || col("span_start") > prevMax, 1L).otherwise(0L))
      .withColumn("grp", sum("new_grp").over(byDoc.rowsBetween(Long.MinValue, 0)))
      .groupBy("doc_id", "grp")
      .agg(min("span_start").as("s"), max("span_end").as("e"))
      .groupBy("doc_id")
      .agg(sum(col("e") - col("s")).as("dup_tokens"))
    docs
      .select(col("doc_id"), col("source"),
        size(graft.ops.TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
      .join(merged, Seq("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("docs"),
        count(col("dup_tokens")).as("docs_with_spans"),
        sum(coalesce(col("dup_tokens"), lit(0L))).as("dup_tokens"),
        sum("n_tokens").as("total_tokens"))
      .withColumn("dup_token_frac",
        round(col("dup_tokens").cast("double") / col("total_tokens"), 6))
      .orderBy("source")
  }

  val spanCoverageSql: String =
    dupSpansSql.replace(
      """SELECT doc_id, min(pos) AS span_start, max(pos) + 8 AS span_end,
        |       max(c) AS n_docs_max
        |FROM islands GROUP BY doc_id, island
        |ORDER BY doc_id, span_start""".stripMargin,
      """, spans AS (
        |  SELECT doc_id, min(pos) AS span_start, max(pos) + 8 AS span_end
        |  FROM islands GROUP BY doc_id, island
        |), marked AS (
        |  SELECT doc_id, span_start, span_end,
        |         CASE WHEN span_start > max(span_end) OVER (
        |                PARTITION BY doc_id ORDER BY span_start
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |              OR max(span_end) OVER (
        |                PARTITION BY doc_id ORDER BY span_start
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |         THEN 1 ELSE 0 END AS new_grp
        |  FROM spans
        |), grouped AS (
        |  SELECT doc_id, span_start, span_end,
        |         sum(new_grp) OVER (
        |           PARTITION BY doc_id ORDER BY span_start
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        |  FROM marked
        |), mrg AS (
        |  SELECT doc_id, min(span_start) AS s, max(span_end) AS e
        |  FROM grouped GROUP BY doc_id, grp
        |), per_doc AS (
        |  SELECT doc_id, sum(e - s) AS dup_tokens FROM mrg GROUP BY 1
        |), base AS (
        |  SELECT d.source, d.doc_id,
        |         CAST(len(string_split_regex(trim(d.text), '[ \t\n\x0B\f\r]+')) AS BIGINT) AS n_tokens,
        |         p.dup_tokens
        |  FROM documents d LEFT JOIN per_doc p USING (doc_id)
        |)
        |SELECT source, count(*) AS docs,
        |       count(dup_tokens) AS docs_with_spans,
        |       CAST(sum(coalesce(dup_tokens, 0)) AS BIGINT) AS dup_tokens,
        |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |       round(CAST(sum(coalesce(dup_tokens, 0)) AS DOUBLE)
        |             / sum(n_tokens), 6) AS dup_token_frac
        |FROM base GROUP BY source ORDER BY source""".stripMargin)

  /** Cross-source duplicate-overlap matrix: for every unordered source
    * pair, how many duplicate clusters span both — the corpus-curation
    * dashboard number that tells you which ingest feeds are copying
    * each other (and how much a new source REALLY adds). Derived
    * entirely from the staged cluster labels at (component, source)
    * grain — cluster-scale, never corpus-scale: the distinct collapse
    * happens before the self-join, so the pair expansion is over at
    * most |components| x |sources| rows. */
  def dedupOverlap(s: SparkSession, dir: String): DataFrame = {
    val lab = clusterLabels(s, dir)
    val src = graft.model.Tables.documents(s, dir).select("doc_id", "source")
    // cached: both sides of the pair self-join read cs, and aliased
    // subplans are not deduped — without the cache the labels⋈docs
    // join would run twice. Cluster-grain rows, tiny.
    val cs = graft.ops.Persists.cache(
      lab.join(src, "doc_id").select("component", "source").distinct())
    val a = cs.alias("a"); val b = cs.alias("b")
    a.join(b, col("a.component") === col("b.component") &&
        col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("shared_clusters"))
      .orderBy("source_a", "source_b")
  }

  private val stagedIncClusters = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Incremental cluster maintenance end-to-end (r9): docs with
    * `doc_id % 10 = 7` play the freshly-arrived delta (the
    * [[dedupIncremental]] split), the rest the already-labeled corpus.
    * The offline job ([[IncrementalClusters.writeState]]) batch-labels
    * the corpus once; the delta then folds in via
    * [[IncrementalClusters.applyDelta]] — O(delta + touched clusters),
    * never a corpus CC recompute. Staged once per (JVM, dir) like the
    * batch variant; repeat runs replay the label parquet.
    *
    * Oracled with the SAME recursive-CTE fixpoint as q_dedup_clusters:
    * the equivalence contract IS that writeState(corpus) ∘
    * applyDelta(delta) equals batch CC over corpus ∪ delta = all
    * documents, so the hash gate proves incremental == batch. */
  private def incClusterLabels(s: SparkSession, dir: String): DataFrame = {
    val path = stagedTempDir(stagedIncClusters, dir, "graft_inc_clusters") { p =>
      // quality rides INTO the store (computed once per doc at ingest,
      // r9) so canonicalization is a view over the slim store — the
      // incremental manifest below never re-touches document text
      val quality = TextOps.textStats(Tables.documents(s, dir))
        .select(col("doc_id"), col("quality_score"))
      val keyed = clusterKeyed(s, dir).join(quality, "doc_id")
      val t0 = System.nanoTime()
      IncrementalClusters.writeState(
        keyed.filter(col("doc_id") % 10 =!= 7), "doc_id", Seq("k1", "k2"),
        p, carryCols = Seq("quality_score"))
      val t1 = System.nanoTime()
      IncrementalClusters.applyDelta(s, p,
        keyed.filter(col("doc_id") % 10 === 7), "doc_id", Seq("k1", "k2"))
      // stage split for the bench artifact: the one-time offline batch
      // CC + bucketed write vs the recurring per-delta fold
      stageTimings("q_dedup_clusters_incremental") = Seq(
        "write_state" -> (t1 - t0) / 1e9,
        "fold" -> (System.nanoTime() - t1) / 1e9)
    }
    IncrementalClusters.readLabels(s, path)
  }

  def dedupClustersIncremental(s: SparkSession, dir: String): DataFrame = {
    val wComp = org.apache.spark.sql.expressions.Window.partitionBy("component")
    incClusterLabels(s, dir)
      .repartition(col("component"))
      .select(col("doc_id"), col("component"),
        count(lit(1)).over(wComp).as("cluster_size"))
      .orderBy("doc_id")
  }

  /** Canonicalization over the INCREMENTALLY-maintained store (r9):
    * the label store carries each doc's ingest-time quality score, so
    * choosing the per-cluster survivor is one window over slim stored
    * columns — no text re-scan, no quality recompute, composing with
    * applyDelta into a fully O(delta) continuous pipeline. Oracled by
    * the SAME batch-manifest SQL: incremental labels == batch CC
    * (proven by q_dedup_clusters_incremental) and quality is a pure
    * per-doc function, so the manifests must be identical. */
  def dedupManifestIncremental(s: SparkSession, dir: String): DataFrame =
    manifestFrom(incClusterLabels(s, dir)
      .select("doc_id", "component", "quality_score"))

  /** End-to-end curation pass (r9; repetition + PII stages r10) — the
    * composed query a training-data pipeline actually runs nightly:
    * keep a doc iff it is its duplicate-cluster's canonical (quality
    * argmax), clears a quality floor, is not repetition-degenerate
    * (the Gopher-style q_repetition flag), is English, is below the
    * PII-density cap (≥2 of email/phone/IP drops it — over the same
    * deterministically injected synthetic PII as q_pii, since the
    * fixture corpus contains none), and is untouched by benchmark
    * decontamination. One summary row per source; each dropped doc is
    * charged to its FIRST failing stage in pipeline order (duplicate →
    * quality → repetition → lang → pii → contamination), so the counts
    * read as a funnel. Every stage is an already-oracled operator
    * (manifest, textStats, repetitionStats, langId, Pii, decontam) —
    * this query hash-gates the COMPOSITION: the oracle concatenates
    * the same CTE blocks. Lang + PII ride the one narrow corpus pass;
    * repetition joins its per-doc (id, word) aggregate — the shape
    * q_repetition already owns (top-word share needs the shuffle;
    * a per-row HOF recount would be the O(len²) anti-pattern).
    * Benchmark docs (doc_id%50=0, the decontam eval set) are out of
    * scope, as in q_decontam. */
  def curation(s: SparkSession, dir: String): DataFrame =
    curationFunnel(s, dir, dedupManifest(s, dir)
      .select(col("doc_id"), col("quality_score"), col("is_canonical")))

  /** The funnel body, shared by [[curation]] (batch-staged labels) and
    * [[streamCuration]] (stream-maintained labels): the two must stage
    * identically for the shared oracle, so a threshold change applied
    * to one cannot silently break the other. `manifest` supplies
    * (doc_id, quality_score, is_canonical). */
  private def curationFunnel(s: SparkSession, dir: String,
      manifest: DataFrame): DataFrame = {
    def n(st: String) = sum(when(col("stage") === st, 1L).otherwise(0L)).as(s"n_$st")
    curationStaged(s, dir, manifest)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), n("kept"), n("duplicate"),
        n("quality"), n("repetition"), n("lang"), n("pii"), n("contam"))
      .orderBy("source")
  }

  /** Per-doc staging decision (doc_id, source, stage) — the shared
    * core under [[curationFunnel]] (aggregated funnel) and
    * [[trainExport]] (the kept set feeding the shard manifest). */
  private def curationStaged(s: SparkSession, dir: String,
      manifest: DataFrame): DataFrame = {
    val docs = Tables.documents(s, dir)
    val contam = decontam(s, dir).select(col("doc_id"), col("contaminated"))
    val rep = TextOps.repetitionStats(docs)
      .select(col("doc_id"), col("flagged").as("rep_flagged"))
    // the q_pii injection recipe, verbatim — PII density is then a
    // per-row regex count inside the same narrow pass as langId
    val injected = concat_ws(" ",
      when(col("doc_id") % 10 === 0,
        concat(lit("contact user"), col("doc_id").cast("string"), lit("@example.com now"))),
      when(col("doc_id") % 7 === 0, lit("call 555-123-4567")),
      when(col("doc_id") % 13 === 0, lit("from 10.0.0.1")),
      col("text"))
    val stage = when(!col("is_canonical"), "duplicate")
      .when(col("quality_score") < 0.25, "quality")
      .when(col("rep_flagged"), "repetition")
      .when(col("lang_pred") =!= "en", "lang")
      .when(col("pii_hits") >= 2, "pii")
      .when(col("contaminated"), "contam")
      .otherwise("kept")
    docs.filter(col("doc_id") % 50 =!= 0)
      .select(col("doc_id"), col("source"),
        TextOps.langId(col("text")).as("lang_pred"),
        (graft.ops.Pii.emailCount(injected) + graft.ops.Pii.phoneCount(injected) +
          graft.ops.Pii.ipCount(injected)).as("pii_hits"))
      .join(manifest, "doc_id")
      .join(contam, "doc_id")
      .join(rep, "doc_id")
      .withColumn("stage", stage)
      .select("doc_id", "source", "stage")
  }

  private val stagedStreamCur = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The FULL ingest daemon end-to-end (r12 — this query used to drive
    * only the dedup+clusters families; it now drains
    * [[graft.streaming.ContinuousIngest]] with ALL EIGHT): docs with
    * `doc_id % 4 = 0` are the offline-built corpus state — band index,
    * cluster label store (quality carried), drift profile, span state,
    * segment keepers, BM25 inverted index, DSIR model, and the corpus
    * metric-view rollup — and the REST arrive as a stream of three
    * document batches (a file source with `maxFilesPerTrigger=1`) that
    * fold into every family per microbatch, sharing ONE persisted
    * token frame (VERDICT r11 task 3). The output is the curation
    * funnel over the stream-maintained label store, hash-oracled by
    * the SAME batch curation SQL; the other families' fold==rebuild
    * contracts are gated by ContinuousIngestSpec and their own oracle
    * queries. Stage split: offline builds (index_state_feed) vs the
    * 3-batch drain (stream_fold), plus per-family clocks. */
  // private[graft] (r18): DaemonStatusContentSpec re-reads the staged
  // daemon's ledger files independently to field-gate q_daemon_status
  private[graft] def streamCurState(s: SparkSession, dir: String): String =
    stagedTempDir(stagedStreamCur, dir, "graft_stream_cur") { p =>
      val docs = Tables.documents(s, dir)
      val keyedOf = (df: DataFrame) => clusterKeyedOf(df)
        .join(TextOps.textStats(df).select(col("doc_id"), col("quality_score")), "doc_id")
      val t0 = System.nanoTime()
      val corpus = docs.filter(col("doc_id") % 4 === 0)
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
      // ninth family (r13): fingerprint state for the leakage/diff cards
      graft.ops.FingerprintStore.writeState(
        corpus.select("doc_id", "source", "text"), s"$p/fps")
      // metrics family: the corpus view's rollup, seeded offline
      val cat = new graft.api.MetricViewCatalog(s,
        { case "documents" => docs; case n => sys.error(s"no source $n") },
        Some(s"$p/metrics"))
      val mv = cat.createOrReplace("mv_corpus", graft.spec.Specs.corpusMetrics)
      val im = cat.incremental.get
      im.foldBatch(mv, corpus, foldId = Some("seed"))
      SparkEntry.catalog(s, dir).bind() // restore the session's DDL target
      // the stream feed: one file per arrival batch, raw document rows
      (1 to 3).foreach(i => docs.filter(col("doc_id") % 4 === i)
        .coalesce(1).write.parquet(s"$p/feed/b$i"))
      val t1 = System.nanoTime()
      val stream = s.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$p/feed/b*")
      graft.streaming.Folds.FamilyClock.enabled = true
      val nBatches =
        try graft.streaming.ContinuousIngest.run(stream,
          s"$p/index", s"$p/state", s"$p/pairs", s"$p/drift", s"$p/spans",
          keyedOf, metrics = Some((mv, im)),
          segmentsRoot = Some(s"$p/segs"), bm25Root = Some(s"$p/bm25"),
          dsir = Some((s"$p/dsir", dsirPred)),
          fingerprints = Some(s"$p/fps"))
        finally graft.streaming.Folds.FamilyClock.enabled = false
      require(nBatches >= 3, s"expected >=3 microbatches, got $nBatches")
      stageTimings("q_stream_curation") = Seq(
        "index_state_feed" -> (t1 - t0) / 1e9,
        "stream_fold" -> (System.nanoTime() - t1) / 1e9) ++
        graft.streaming.Folds.FamilyClock.drain() // per-family split
    }

  def streamCuration(s: SparkSession, dir: String): DataFrame = {
    val path = streamCurState(s, dir)
    curationFunnel(s, dir,
      manifestFrom(IncrementalClusters.readLabels(s, s"$path/state")
        .select("doc_id", "component", "quality_score"))
        .select(col("doc_id"), col("quality_score"), col("is_canonical")))
  }

  /** Daemon introspection ([[graft.streaming.ContinuousIngest.status]],
    * r12 — VERDICT r11 missing-3): one row per state family of the
    * drained daemon above, with its applied-fold ledger depth and last
    * (content-derived, deterministic) fold id — the "has every family
    * caught up to batch X" dashboard. Ledger truth, not clocks; the
    * per-family wall clocks stay a bench surface (stage split). No SQL
    * oracle: the ledgers are commit-protocol text files, not tables —
    * the driver's rows-check + DaemonStatusSpec gate it. */
  def daemonStatus(s: SparkSession, dir: String): DataFrame = {
    val p = streamCurState(s, dir)
    graft.streaming.ContinuousIngest.status(s, Map(
      "dedup_index" -> s"$p/index",
      "clusters" -> s"$p/state/labels",
      "drift" -> s"$p/drift",
      "spans" -> s"$p/spans",
      "segments" -> s"$p/segs",
      "bm25" -> s"$p/bm25",
      "dsir" -> s"$p/dsir",
      "fingerprints" -> s"$p/fps"))
  }

  /** The same ledger dashboard through the SQL TVF surface (r13 —
    * VERDICT r12 task 7: the one rows-only query gets the SQL-parity
    * story every other surface has): `graft_daemon_status(rootsCsv)`
    * over the drained daemon's state roots. Rows-only like its
    * DataFrame twin; SqlDaemonStatusSpec gates SQL == DataFrame. */
  def sqlDaemonStatus(s: SparkSession, dir: String): DataFrame = {
    val p = streamCurState(s, dir)
    s.sql(
      s"""SELECT family, applied_folds, last_fold_id
         |FROM graft_daemon_status('dedup_index=$p/index,clusters=$p/state/labels,drift=$p/drift,spans=$p/spans,segments=$p/segs,bm25=$p/bm25,dsir=$p/dsir,fingerprints=$p/fps')
         |ORDER BY family""".stripMargin)
  }

  private val stagedLiveMetrics = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Catalog hosting the corpus metric view over a staged feed dir;
    * cheap to reconstruct — build state (markBuilt + rollup versions +
    * stream checkpoint) lives on disk under `$p/work`. Re-binds the
    * main catalog afterwards so SQL DDL keeps targeting it. */
  private def liveCatalog(s: SparkSession, p: String, dir: String) = {
    val schema = s.read.parquet(s"$p/feed/b0").schema
    val cat = new graft.api.MetricViewCatalog(s,
      {
        case "documents" => s.read.parquet(s"$p/feed/b*")
        case n => sys.error(s"corpus catalog has no source '$n'")
      },
      Some(s"$p/work"),
      streamSource = {
        case "documents" => Some(s.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$p/feed/b*"))
        case _ => None
      })
    cat.createOrReplace("mv_corpus", graft.spec.Specs.corpusMetrics)
    SparkEntry.catalog(s, dir).bind()
    cat
  }

  /** Live corpus metrics (r11): the daemon's metrics family end to
    * end — documents arrive as a 3-file stream, each microbatch FOLDS
    * into the corpus view's (source, lang) rollup
    * (IncrementalMaterializer partial-merge + versioned flip), and the
    * MEASURE() query routes to the stream-maintained partials: counts
    * and char mass re-sum, the size percentile re-merges histogram
    * partials. The oracle computes the same numbers from the raw
    * corpus — fold == rebuild composed with routing, hash-gated. */
  def liveMetrics(s: SparkSession, dir: String): DataFrame = {
    val path = stagedTempDir(stagedLiveMetrics, dir, "graft_live_metrics") { p =>
      val docs = Tables.documents(s, dir)
      (0 to 2).foreach(i => docs.filter(col("doc_id") % 3 === i)
        .coalesce(1).write.parquet(s"$p/feed/b$i"))
      val t0 = System.nanoTime()
      liveCatalog(s, p, dir).refresh("mv_corpus") // drains 3 microbatch folds
      stageTimings("q_live_metrics") = Seq(
        "stream_fold" -> (System.nanoTime() - t0) / 1e9)
    }
    liveCatalog(s, path, dir).get("mv_corpus")
      .query(Seq("source"), Seq("doc_count", "char_sum", "char_p90"))
      .orderBy("source")
  }

  val liveMetricsSql: String =
    s"""WITH hb AS (
       |  SELECT source,
       |         ${Queries.binSql("CAST(n_chars AS DOUBLE)", "0.0", "1024.0", 256)} AS bin
       |  FROM documents
       |), """.stripMargin +
      Queries.quantileCtes(Seq("source"),
        "(SELECT source, bin, count(*) AS c FROM hb GROUP BY 1, 2)",
        Seq("e90" -> "0.9"), "0.0", "1024.0", 256) +
      s"""
         |SELECT g.source, g.doc_count, g.char_sum, e90.v AS char_p90
         |FROM (SELECT source, count(*) AS doc_count,
         |             CAST(sum(n_chars) AS BIGINT) AS char_sum
         |      FROM documents GROUP BY 1) g
         |JOIN e90 USING (source)
         |ORDER BY g.source""".stripMargin

  /** Canonicalization manifest — the terminal dedup step a training
    * pipeline materializes: per duplicate cluster keep the
    * highest-quality member (6dp-rounded quality score, min doc_id on
    * ties — rounding makes the cross-engine argmax deterministic), and
    * emit for every doc its cluster, the kept id and whether it IS the
    * kept doc. Composes the staged cluster labels with the quality
    * scorer; one tiny window over (component). */
  def dedupManifest(s: SparkSession, dir: String): DataFrame = {
    val quality = TextOps.textStats(Tables.documents(s, dir))
      .select(col("doc_id"), col("quality_score"))
    manifestFrom(clusterLabels(s, dir).join(quality, "doc_id"))
  }

  /** Shared canonicalization: rank each component's members by
    * (quality desc, doc_id asc), keep the argmax, emit the manifest
    * row shape. Input needs (doc_id, component, quality_score). Both
    * manifest queries share this block — a tie-break change applied to
    * one would otherwise silently break the other's shared oracle. */
  private def manifestFrom(labeled: DataFrame): DataFrame = {
    val ranked = labeled
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("component")
          .orderBy(desc("quality_score"), asc("doc_id"))))
    val keep = ranked.filter(col("rk") === 1)
      .select(col("component"), col("doc_id").as("keep_id"))
    ranked.join(keep, "component")
      .select(col("doc_id"), col("component"), col("quality_score"),
        col("keep_id"), (col("doc_id") === col("keep_id")).as("is_canonical"))
      .orderBy("doc_id")
  }

  /** Shared recursive-CTE fixpoint for the cluster oracles. */
  private val clusterCtes: String =
    """WITH RECURSIVE k AS (
      |  SELECT doc_id,
      |         array_to_string((string_split(text, ' '))[1:3], ' ') AS k1,
      |         array_to_string(list_reverse(string_split(text, ' '))[1:3], ' ') AS k2
      |  FROM documents
      |), e1 AS (
      |  SELECT min(doc_id) OVER (PARTITION BY k1) AS src, doc_id AS dst FROM k
      |), e2 AS (
      |  SELECT min(doc_id) OVER (PARTITION BY k2) AS src, doc_id AS dst FROM k
      |), edges AS (
      |  SELECT src, dst FROM e1 WHERE src <> dst
      |  UNION SELECT src, dst FROM e2 WHERE src <> dst
      |), sym AS (
      |  SELECT src, dst FROM edges UNION SELECT dst AS src, src AS dst FROM edges
      |), reach AS (
      |  SELECT doc_id AS id, doc_id AS label FROM k
      |  UNION
      |  SELECT s.dst AS id, r.label FROM reach r JOIN sym s ON s.src = r.id
      |), comp AS (
      |  SELECT id AS doc_id, min(label) AS component FROM reach GROUP BY 1
      |)""".stripMargin

  val dedupClustersSql: String = clusterCtes +
    """
      |SELECT doc_id, component,
      |       count(*) OVER (PARTITION BY component) AS cluster_size
      |FROM comp ORDER BY doc_id""".stripMargin

  val dedupOverlapSql: String = clusterCtes +
    """, cs AS (
      |  SELECT DISTINCT c.component, d.source
      |  FROM comp c JOIN documents d USING (doc_id)
      |)
      |SELECT a.source AS source_a, b.source AS source_b,
      |       count(*) AS shared_clusters
      |FROM cs a JOIN cs b ON a.component = b.component AND a.source < b.source
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Cluster fixpoint + quality + per-cluster argmax CTEs — shared by
    * the manifest oracles and the curation oracle. */
  private val manifestCtes: String = clusterCtes +
    """, qstats AS (
      |  SELECT doc_id,
      |         len(tk) AS token_count,
      |         round(CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) / length(text), 6) AS punct_ratio,
      |         round(CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / length(text), 6) AS digit_ratio,
      |         round(CAST(len(list_filter(tk, w -> list_contains(['the','a','an','of','and','or','is','are','in','on','to','it','this','that','with','for','as','at','by','be'], w))) AS DOUBLE) / len(tk), 6) AS stopword_ratio
      |  FROM (SELECT doc_id, text,
      |          string_split_regex(trim(text), '[ \t\n\x0B\f\r]+') AS tk
      |        FROM documents)
      |), qual AS (
      |  SELECT doc_id, round(least(1.0, greatest(0.0,
      |           0.15 * ln(1.0 + token_count)
      |           - 2.0 * punct_ratio - 2.0 * digit_ratio
      |           - abs(stopword_ratio - 0.35))), 6) AS quality_score
      |  FROM qstats
      |), ranked AS (
      |  SELECT c.doc_id, c.component, q.quality_score,
      |         row_number() OVER (PARTITION BY c.component
      |                            ORDER BY q.quality_score DESC, c.doc_id ASC) AS rk
      |  FROM comp c JOIN qual q USING (doc_id)
      |), keep AS (
      |  SELECT component, doc_id AS keep_id FROM ranked WHERE rk = 1
      |)""".stripMargin

  val dedupManifestSql: String = manifestCtes +
    """
      |SELECT r.doc_id, r.component, r.quality_score, k2.keep_id,
      |       (r.doc_id = k2.keep_id) AS is_canonical
      |FROM ranked r JOIN keep k2 USING (component)
      |ORDER BY r.doc_id""".stripMargin

  /** The curation oracle composes the SAME blocks as the standalone
    * operators: manifest CTEs (dup canonical + quality), the langId
    * marker argmax, and the decontam gram join — then charges each doc
    * to its first failing stage. Shared through the per-doc `staged`
    * CTE by [[curationSql]] (per-source funnel) and
    * [[trainExportSql]] (kept-set shard manifest). */
  private val curationStageCtes: String = manifestCtes +
    """, lt AS (
      |  SELECT doc_id,
      |         string_split_regex(trim(lower(text)), '[ \t\n\x0B\f\r]+') AS tk,
      |         length(regexp_replace(text, '[^\x{4e00}-\x{9fff}]', '', 'g')) AS cjk,
      |         greatest(length(text), 1) AS tlen
      |  FROM documents
      |), ls AS (
      |  SELECT doc_id,
      |    CAST(len(list_filter(tk, w -> list_contains(['the','a','of','and','is','to','in','that','it','for'], w))) AS DOUBLE) / (len(tk)+1) AS s_en,
      |    CAST(len(list_filter(tk, w -> list_contains(['der','die','das','und','ist','nicht','mit','ein','zu','den'], w))) AS DOUBLE) / (len(tk)+1) AS s_de,
      |    CAST(len(list_filter(tk, w -> list_contains(['le','la','les','et','est','un','une','des','que','pour'], w))) AS DOUBLE) / (len(tk)+1) AS s_fr,
      |    CAST(len(list_filter(tk, w -> list_contains(['el','la','los','las','y','es','un','una','que','por'], w))) AS DOUBLE) / (len(tk)+1) AS s_es,
      |    CAST(cjk AS DOUBLE) / tlen * 10.0 AS s_zh
      |  FROM lt
      |), lp AS (
      |  SELECT doc_id,
      |    CASE WHEN greatest(s_en, s_de, s_fr, s_es, s_zh) <= 0.005 THEN 'und'
      |         WHEN s_en = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'en'
      |         WHEN s_de = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'de'
      |         WHEN s_fr = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'fr'
      |         WHEN s_es = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'es'
      |         ELSE 'zh' END AS lang_pred
      |  FROM ls
      |), dw AS (
      |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
      |), dg AS (
      |  SELECT DISTINCT doc_id, array_to_string(ws[i:i+3], ' ') AS gram
      |  FROM dw, LATERAL (SELECT unnest(range(1, greatest(len(ws) - 2, 1))) AS i) t
      |), dbench AS (
      |  SELECT DISTINCT gram FROM dg WHERE doc_id % 50 = 0
      |), dhits AS (
      |  SELECT dg.doc_id, count(*) AS n_hit
      |  FROM dg JOIN dbench USING (gram)
      |  WHERE dg.doc_id % 50 <> 0
      |  GROUP BY 1
      |), rw AS (
      |  SELECT doc_id, string_split_regex(trim(text), '[ \t\n\x0B\f\r]+') AS ws FROM documents
      |), rb AS (
      |  SELECT doc_id, len(ws) AS n_words,
      |         round(1.0 - CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws), 6) AS dup_word_ratio
      |  FROM rw
      |), rc AS (
      |  SELECT doc_id, max(cnt) AS top FROM (
      |    SELECT doc_id, word, count(*) AS cnt
      |    FROM (SELECT doc_id, unnest(ws) AS word FROM rw) GROUP BY doc_id, word
      |  ) GROUP BY doc_id
      |), rep AS (
      |  SELECT rb.doc_id,
      |         (rb.dup_word_ratio > 0.8
      |          OR round(CAST(rc.top AS DOUBLE) / rb.n_words, 6) > 0.2) AS rep_flagged
      |  FROM rb JOIN rc USING (doc_id)
      |), pin AS (
      |  SELECT doc_id, concat_ws(' ',
      |    CASE WHEN doc_id % 10 = 0 THEN 'contact user' || CAST(doc_id AS VARCHAR) || '@example.com now' END,
      |    CASE WHEN doc_id % 7 = 0 THEN 'call 555-123-4567' END,
      |    CASE WHEN doc_id % 13 = 0 THEN 'from 10.0.0.1' END,
      |    text) AS itext
      |  FROM documents
      |), ppi AS (
      |  SELECT doc_id,
      |         len(regexp_extract_all(itext, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
      |         + len(regexp_extract_all(itext, '\b\d{3}[-.]\d{3}[-.]\d{4}\b'))
      |         + len(regexp_extract_all(itext, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS pii_hits
      |  FROM pin
      |), staged AS (
      |  SELECT d.doc_id, d.source,
      |         CASE WHEN r.doc_id <> kp.keep_id THEN 'duplicate'
      |              WHEN r.quality_score < 0.25 THEN 'quality'
      |              WHEN rp.rep_flagged THEN 'repetition'
      |              WHEN lp.lang_pred <> 'en' THEN 'lang'
      |              WHEN pp.pii_hits >= 2 THEN 'pii'
      |              WHEN coalesce(h.n_hit, 0) > 0 THEN 'contam'
      |              ELSE 'kept' END AS stage
      |  FROM documents d
      |  JOIN ranked r ON r.doc_id = d.doc_id
      |  JOIN keep kp ON kp.component = r.component
      |  JOIN lp ON lp.doc_id = d.doc_id
      |  JOIN rep rp ON rp.doc_id = d.doc_id
      |  JOIN ppi pp ON pp.doc_id = d.doc_id
      |  LEFT JOIN dhits h ON h.doc_id = d.doc_id
      |  WHERE d.doc_id % 50 <> 0
      |)""".stripMargin

  val curationSql: String = curationStageCtes +
    """
      |SELECT source, count(*) AS n_docs,
      |       CAST(sum(CASE WHEN stage = 'kept' THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |       CAST(sum(CASE WHEN stage = 'duplicate' THEN 1 ELSE 0 END) AS BIGINT) AS n_duplicate,
      |       CAST(sum(CASE WHEN stage = 'quality' THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
      |       CAST(sum(CASE WHEN stage = 'repetition' THEN 1 ELSE 0 END) AS BIGINT) AS n_repetition,
      |       CAST(sum(CASE WHEN stage = 'lang' THEN 1 ELSE 0 END) AS BIGINT) AS n_lang,
      |       CAST(sum(CASE WHEN stage = 'pii' THEN 1 ELSE 0 END) AS BIGINT) AS n_pii,
      |       CAST(sum(CASE WHEN stage = 'contam' THEN 1 ELSE 0 END) AS BIGINT) AS n_contam
      |FROM staged GROUP BY source ORDER BY source""".stripMargin

  /** End-to-end training-data delivery manifest (r10): the curation
    * funnel's KEPT set feeds the deterministic shard assignment
    * ([[graft.ops.ShardExport]]) and a 512-token concat-and-chunk
    * sequence estimate per shard — raw corpus to training shards as
    * ONE oracled composition (staging, shuffle key, token count, and
    * sequence arithmetic all re-derived by DuckDB). */
  def trainExport(s: SparkSession, dir: String): DataFrame = {
    val kept = curationStaged(s, dir, dedupManifest(s, dir)
        .select(col("doc_id"), col("quality_score"), col("is_canonical")))
      .filter(col("stage") === "kept")
      .select("doc_id")
    val docs = Tables.documents(s, dir).join(kept, "doc_id")
    graft.ops.ShardExport.assign(docs, nShards = 8, salt = 7L)
      .withColumn("n_tokens", graft.ops.Packing.tokenCount(col("text")))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").cast("long").as("total_tokens"),
        ceil(sum("n_tokens") / 512.0).cast("long").as("n_seqs"))
      .orderBy("shard")
  }

  val trainExportSql: String = curationStageCtes + {
    val key = graft.ops.ShardExport.shuffleKeySql("s.doc_id", 7L)
    s"""
      |SELECT CAST(($key) % 8 AS INT) AS shard, count(*) AS n_docs,
      |       CAST(sum(rb.n_words) AS BIGINT) AS total_tokens,
      |       CAST(ceil(sum(rb.n_words) / 512.0) AS BIGINT) AS n_seqs
      |FROM staged s JOIN rb ON rb.doc_id = s.doc_id
      |WHERE s.stage = 'kept'
      |GROUP BY shard ORDER BY shard""".stripMargin
  }

  /** IVF ANN (data-adaptive cells; rows-only — recall spec-tested). */
  def annIvf(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val model = IvfIndex.train(emb)
    IvfIndex.topK(emb, emb.filter(col("vec_id") < 10), k = 5, model)
      .orderBy("query_id", "rank")
  }

  /** The PERSISTED-index lifecycle under the same oracle as [[annIvf]]
    * (r8, VERDICT r7 residual #3): train offline → IndexStore.saveIvf →
    * loadIvf (bit-identical doubles) → cell-partitioned layout
    * (writeIndexed) → partition-pruned probe (topKIndexed). Exact
    * equality with the in-session probe is the CONTRACT — a loaded
    * model or a precomputed cell column that drifted by one bit would
    * probe different directories and hash-mismatch [[annIvfSql]]. */
  def annIvfIndexed(s: SparkSession, dir: String): DataFrame = {
    val staged = stageIvfIndex(s, dir)
    val model = IndexStore.loadIvf(staged)
    IvfIndex.topKIndexed(s, s"$staged/layout",
      Tables.embeddings(s, dir).filter(col("vec_id") < 10), k = 5, model)
      .orderBy("query_id", "rank")
  }

  private val stagedIvf = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Idempotently train + persist the IVF index artifacts for `dir`'s
    * embeddings table (the "offline index job"): model text file +
    * cell-partitioned parquet layout, keyed by (dir, mtime) like
    * [[stageEvents]], atomic-rename so concurrent stagings agree. */
  private[graft] def stageIvfIndex(s: SparkSession, dir: String): String =
    stagedIvf.computeIfAbsent(dir, { d =>
      import java.nio.file.{Files, Paths, StandardCopyOption}
      val mtime = Files.getLastModifiedTime(Paths.get(s"$d/embeddings.parquet")).toMillis
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(s"ivf:$d:$mtime".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val target = Paths.get(System.getProperty("java.io.tmpdir"), s"graft_stage_ivf_$key")
      if (!Files.exists(target.resolve("ivf_centroids.txt"))) {
        val tmp = Files.createTempDirectory("graft_stage_ivf_tmp")
        val emb = Tables.embeddings(s, d)
        val model = IvfIndex.train(emb)
        IndexStore.saveIvf(model, tmp.toString)
        IvfIndex.writeIndexed(emb, s"$tmp/layout", model)
        try Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
        catch {
          case _: java.nio.file.FileAlreadyExistsException
             | _: java.nio.file.DirectoryNotEmptyException
             | _: java.nio.file.AccessDeniedException =>
            org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)
        }
      }
      target.toString
    })

  private val stagedIvfInc = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Incremental ANN index maintenance end-to-end (r10, VERDICT r9
    * task 1): embeddings with `vec_id % 10 = 7` play the freshly-
    * arrived delta (the dedup-split convention). The offline job
    * trains centroids on the CORPUS and writes its cell-partitioned
    * layout; the delta then folds in via [[IvfIndex.appendIndexed]] —
    * O(delta) per-row assignment, file adds in touched cells only, no
    * retrain, no corpus rewrite — and the probe runs over the folded
    * layout with the same persisted model.
    *
    * Oracled by the full SQL pipeline with corpus-restricted TRAINING
    * but all-rows assignment/probing ([[annIvfIncrementalSql]]) —
    * which is precisely what a same-model full REBUILD of
    * corpus ∪ delta serves, so the hash gate proves fold == rebuild
    * (the IncrementalClusters equivalence posture for the ANN
    * pillar). Staged once per (JVM, dir); the train/fold stage split
    * is recorded for the bench artifact. */
  def annIvfIncremental(s: SparkSession, dir: String): DataFrame = {
    val staged = stagedTempDir(stagedIvfInc, dir, "graft_ivf_inc") { p =>
      val emb = Tables.embeddings(s, dir)
      val corpus = emb.filter(col("vec_id") % 10 =!= 7)
      val t0 = System.nanoTime()
      val model = IvfIndex.train(corpus)
      IndexStore.saveIvf(model, p)
      IvfIndex.writeIndexed(corpus, s"$p/layout", model)
      val t1 = System.nanoTime()
      IvfIndex.appendIndexed(emb.filter(col("vec_id") % 10 === 7), s"$p/layout", model)
      stageTimings("q_ann_ivf_incremental") = Seq(
        "train_index" -> (t1 - t0) / 1e9,
        "fold" -> (System.nanoTime() - t1) / 1e9)
    }
    val model = IndexStore.loadIvf(staged)
    IvfIndex.topKIndexed(s, s"$staged/layout",
      Tables.embeddings(s, dir).filter(col("vec_id") < 10), k = 5, model)
      .orderBy("query_id", "rank")
  }

  /** Training corpus at the sf0.01 gate: 500 embeddings minus the 50
    * delta rows (vec_id ≡ 7 mod 10) — the n the init draws embed. */
  val annIvfIncrementalSql: String =
    ivfPipelineSql(n = 450, trainPred = Some("vec_id % 10 <> 7"))

  /** DuckDB re-expression of [[annIvf]] — the full IVF pipeline
    * INCLUDING k-means training (fully oracled since r7; the last
    * algorithmic rows-only query). Every stage is re-derived with
    * bit-identical arithmetic:
    *
    *  - the training sample is the md5-rank order (row_number over
    *    md5(id), id — the engine's TakeOrderedAndProject draw);
    *  - the 16 init centroids are the sample rows at the positions a
    *    spec-fixed java.util.Random(42) draws — driver-side constants,
    *    embedded as literals (the hyperplane precedent);
    *  - Lloyd's 8 iterations are UNROLLED as 8 generated CTE blocks:
    *    assignment = first-index argmin of the exact left-fold squared
    *    distance; new centroid = per-dimension left-fold sum in sample
    *    order / count (the engine folds in sample order too), empty
    *    cells keep the old centroid;
    *  - cell assignment / nprobe probing / cosine ranking mirror
    *    IvfIndex.cellExpr, probeCellsExpr and topK, including the
    *    first-index array_position tie semantics.
    *
    * The init draws depend on the sample size, so the oracle guards
    * count(*) == 500 (sf0.01, the correctness gate's scale) with a
    * loud error() — the embedNearDup bits-guard pattern. */
  val annIvfSql: String = ivfPipelineSql(n = 500, trainPred = None)

  /** The IVF-oracle generator, parameterized (r10) so the INCREMENTAL
    * variant can train on a corpus subset: `trainPred` filters the
    * k-means sample (the engine trains on the pre-delta corpus), while
    * cell assignment and probing still run over ALL embeddings — which
    * is exactly what a fold-then-probe over the incremental layout
    * computes, and what a same-model full rebuild computes (the
    * equivalence the oracle therefore hash-gates). `n` must be the
    * TRAINING corpus row count at the gate's scale: the Random(42)
    * init draws depend on it, so it is error()-guarded in SQL. */
  private def ivfPipelineSql(n: Int, trainPred: Option[String]): String = {
    val k = 16
    val dim = 64
    val iters = 8
    val nprobe = 6
    val trainWhere = trainPred.map(p => s"WHERE $p").getOrElse("")
    val trainAnd = trainPred.map(p => s" AND $p").getOrElse("")
    val rnd = new java.util.Random(42L)
    // engine: Array.fill(k)(sample(rnd.nextInt(sample.length))) — 0-based
    // positions into the md5-rank-ordered sample; SQL ranks are 1-based
    val initRanks = Array.fill(k)(rnd.nextInt(n) + 1).mkString("[", ",", "]")
    // exact left-fold Σ (v[d]-c[d])² — the engine's `nearest`/distExpr
    def sqDist(v: String, c: String) =
      s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
        s"list_transform(list_zip($v, $c), pr -> (pr[1] - pr[2]) * (pr[1] - pr[2]))), " +
        s"(acc, x) -> acc + x)"
    def distsOver(v: String, cents: String) =
      s"list_transform(range(1, ${k + 1}), c -> ${sqDist(v, s"$cents[c]")})"
    // per-dim mean of a rank-ordered vector list: left-fold sum / count
    def meanOf(vs: String) =
      s"list_transform(range(1, ${dim + 1}), dd -> " +
        s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
        s"list_transform($vs, vv -> vv[dd])), (acc, x) -> acc + x) / len($vs))"
    val iterations = (1 to iters).map { i =>
      val prev = if (i == 1) "it0" else s"it${i - 1}"
      s"""a$i AS (
         |  SELECT rank, v, list_position(d, list_min(d)) AS cell
         |  FROM (SELECT s.rank, s.v, ${distsOver("s.v", "t.cents")} AS d
         |        FROM samp s CROSS JOIN $prev t)
         |), g$i AS (
         |  SELECT map_from_entries(list({'k': cell, 'v': vs})) AS m
         |  FROM (SELECT cell, list(v ORDER BY rank) AS vs FROM a$i GROUP BY cell)
         |), it$i AS (
         |  SELECT list_transform(range(1, ${k + 1}), c ->
         |           CASE WHEN len(g.m[c]) = 0 THEN t.cents[c]
         |                ELSE ${meanOf("g.m[c][1]")} END) AS cents
         |  FROM $prev t CROSS JOIN g$i g
         |)""".stripMargin
    }.mkString(",\n")
    val cos = s"${dotFold("q.embedding", "c.embedding")} / " +
      s"(sqrt(${dotFold("q.embedding", "q.embedding")}) * sqrt(${dotFold("c.embedding", "c.embedding")}))"
    s"""WITH nchk AS (
       |  SELECT CASE WHEN count(*) <> $n
       |              THEN CAST(error('annIvf oracle embeds Random(42) draws over a $n-row sample; corpus has '
       |                   || count(*) || ' rows') AS INT)
       |              ELSE $n END AS n
       |  FROM embeddings $trainWhere
       |), samp AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |         row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rank
       |  FROM embeddings CROSS JOIN nchk WHERE nchk.n = $n$trainAnd
       |), rmap AS (
       |  SELECT map_from_entries(list({'k': rank, 'v': v})) AS m FROM samp
       |), it0 AS (
       |  SELECT list_transform($initRanks::BIGINT[], rr -> m[rr][1]) AS cents FROM rmap
       |),
       |$iterations,
       |cb AS (
       |  SELECT e.vec_id, list_position(d, list_min(d)) AS cell
       |  FROM (SELECT e.vec_id, ${distsOver("CAST(e.embedding AS DOUBLE[])", "t.cents")} AS d
       |        FROM embeddings e CROSS JOIN it$iters t) e
       |), qp AS (
       |  SELECT vec_id, unnest(probe) AS cell
       |  FROM (SELECT e.vec_id,
       |          list_transform(list_sort(d)[1:$nprobe], x -> list_position(d, x)) AS probe
       |        FROM (SELECT e.vec_id, ${distsOver("CAST(e.embedding AS DOUBLE[])", "t.cents")} AS d
       |              FROM embeddings e CROSS JOIN it$iters t
       |              WHERE e.vec_id < 10) e) p
       |), cand AS (
       |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
       |  FROM qp q JOIN cb c USING (cell)
       |  WHERE q.vec_id <> c.vec_id
       |), scored AS (
       |  SELECT cand.query_id, cand.neighbor_id, $cos AS cos_raw
       |  FROM cand JOIN embeddings q ON q.vec_id = cand.query_id
       |            JOIN embeddings c ON c.vec_id = cand.neighbor_id
       |), ranked AS (
       |  SELECT query_id, neighbor_id, cos_raw,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY cos_raw DESC, neighbor_id ASC) AS rank
       |  FROM scored
       |)
       |SELECT query_id, rank, neighbor_id, round(cos_raw, 6) AS cosine
       |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  /** CUBE rollup (SURVEY §2.4 'free from Spark' tier, exposed +
    * oracle-checked): revenue over all subsets of (segment, status). */
  def cubeRevenue(s: SparkSession, dir: String): DataFrame =
    graft.model.Models.fctOrders(s, dir)
      .cube(col("market_segment"), col("order_status"))
      .agg(sum("total_price").cast("double").as("total_revenue"),
        count(lit(1)).as("n"),
        grouping_id().as("gid"))
      .orderBy(asc_nulls_first("market_segment"), asc_nulls_first("order_status"), asc("gid"))

  val cubeRevenueSql: String =
    Queries.modelCtes +
      """SELECT market_segment, order_status,
        |       CAST(sum(total_price) AS DOUBLE) AS total_revenue,
        |       count(*) AS n,
        |       GROUPING(market_segment) * 2 + GROUPING(order_status) AS gid
        |FROM fct_orders
        |GROUP BY CUBE (market_segment, order_status)
        |ORDER BY market_segment ASC NULLS FIRST, order_status ASC NULLS FIRST, gid ASC""".stripMargin

  /** Multimodal plumbing: blob → decode → typed metadata/features.
    * The stub codec is a documented deterministic function of the
    * payload bytes (Java `Arrays.hashCode` fold), so even this query is
    * oracled: DuckDB recomputes the same 32-bit fold over the UTF-8
    * bytes (fixture text is ASCII, so code points == bytes). */
  /** Real header-parse path (r9, +wav/mp4 r10): the blobs carry
    * synthesized VALID PNG/JPEG/WAV/MP4 files (id-derived dims/rates/
    * timescales), decode reads width/height/channels/format/sample_rate
    * from the actual IHDR/SOF/RIFF-fmt/moov-box bytes, and the oracle
    * re-derives the same metadata from the synthesis recipe — hash
    * equality proves parse ∘ synth = id across every row and all four
    * formats. */
  def multimodalDecode(s: SparkSession, dir: String): DataFrame = {
    val blobs = Multimodal.synthMediaBlobs(Tables.documents(s, dir))
    Multimodal.decode(blobs).toDF()
      .select(col("media_id"), col("meta.width"), col("meta.height"),
        col("meta.channels"), col("meta.format"), col("meta.sample_rate"),
        size(col("features")).as("feature_dim"))
      .orderBy("media_id")
  }

  /** The synthesis recipe in SQL (Multimodal.synthDims/synthAudio/
    * synthVideo/synthPng/synthJpeg/synthWav/synthMp4): ids ≡ 2 (mod 6)
    * WAV with rate standard-set-indexed by (id//6) mod 6 and
    * 1+(id//6)%2 channels; ids ≡ 5 (mod 6) MP4 with synthDims dims and
    * timescale standard-set-indexed by (id//6) mod 4 in the
    * sample_rate slot; of the rest, even ids PNG with color type
    * cycling {gray, truecolor, truecolor+alpha} → channels {1,3,4};
    * odd ids JPEG with 1 component when id≡1 (mod 4), else 3.
    * doc_id ≥ 0, so `%` is floorMod. */
  val multimodalDecodeSql: String =
    """SELECT doc_id AS media_id,
      |       CAST(CASE WHEN doc_id % 6 = 2 THEN 0
      |            ELSE 16 + (doc_id * 31) % 1000 END AS INT) AS width,
      |       CAST(CASE WHEN doc_id % 6 = 2 THEN 0
      |            ELSE 16 + (doc_id * 17) % 1000 END AS INT) AS height,
      |       CAST(CASE WHEN doc_id % 6 = 2 THEN 1 + (doc_id // 6) % 2
      |            WHEN doc_id % 6 = 5 THEN 0
      |            WHEN doc_id % 2 = 0 THEN
      |              CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END
      |            ELSE CASE WHEN doc_id % 4 = 1 THEN 1 ELSE 3 END
      |       END AS INT) AS channels,
      |       CASE WHEN doc_id % 6 = 2 THEN 'wav'
      |            WHEN doc_id % 6 = 5 THEN 'mp4'
      |            WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
      |       CAST(CASE WHEN doc_id % 6 = 2 THEN
      |              CASE (doc_id // 6) % 6 WHEN 0 THEN 8000 WHEN 1 THEN 11025
      |                   WHEN 2 THEN 16000 WHEN 3 THEN 22050
      |                   WHEN 4 THEN 44100 ELSE 48000 END
      |            WHEN doc_id % 6 = 5 THEN
      |              CASE (doc_id // 6) % 4 WHEN 0 THEN 600 WHEN 1 THEN 1000
      |                   WHEN 2 THEN 90000 ELSE 30000 END
      |            ELSE 0 END AS INT) AS sample_rate,
      |       8 AS feature_dim
      |FROM documents ORDER BY media_id""".stripMargin

  /** Deterministic shuffle + shard export manifest (r10): every doc
    * lands in one of 16 shards by a salted two-round MINSTD key, with
    * intra-shard order by the same key — cluster-width-independent and
    * re-derivable by ANY engine ([[graft.ops.ShardExport]]). The
    * oracle recomputes assignment, token mass, and the first/last
    * order witnesses with the identical arithmetic. */
  def shardExport(s: SparkSession, dir: String): DataFrame =
    graft.ops.ShardExport.summary(Tables.documents(s, dir),
        nShards = 16, salt = 7L)
      .orderBy("shard")

  val shardExportSql: String = {
    val key = graft.ops.ShardExport.shuffleKeySql("doc_id", 7L)
    s"""WITH k AS (
      |  SELECT doc_id, ($key) AS sort_key,
      |         len(string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+')) AS n_tokens
      |  FROM documents
      |)
      |SELECT CAST(sort_key % 16 AS INT) AS shard, count(*) AS n_docs,
      |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
      |       CAST(min(sort_key) AS BIGINT) AS first_key,
      |       CAST(max(sort_key) AS BIGINT) AS last_key
      |FROM k GROUP BY shard ORDER BY shard""".stripMargin
  }

  /** Sequence packing manifest: docs packed into 512-token training
    * sequences per source shard (concat-and-chunk assignment — see
    * [[graft.ops.Packing]]). One window pass per shard; oracled with
    * the identical running-sum arithmetic in DuckDB. */
  def packSequences(s: SparkSession, dir: String): DataFrame =
    graft.ops.Packing.summary(Tables.documents(s, dir), seqTokens = 512)
      .orderBy("source", "seq_id")

  val packSequencesSql: String =
    """WITH t AS (
      |  SELECT doc_id, source,
      |         len(string_split_regex(trim(text), '[ \t\n\x0B\f\r]+')) AS n_tokens
      |  FROM documents
      |), c AS (
      |  SELECT source, n_tokens,
      |         sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      |           ROWS UNBOUNDED PRECEDING) - n_tokens AS cum_before
      |  FROM t
      |)
      |SELECT source, CAST(floor(cum_before / 512.0) AS BIGINT) AS seq_id,
      |       count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens
      |FROM c GROUP BY source, seq_id ORDER BY source, seq_id""".stripMargin

  /** PII scrub over documents with deterministically INJECTED
    * synthetic PII (the fixture corpus contains none — zero counts
    * would make the cross-engine regex-parity check vacuous): every
    * 10th doc gains an email, every 7th a phone, every 13th an IP,
    * derived from doc_id. Counts + redacted length per doc; both
    * engines run the same literal RE2-compatible patterns in the same
    * order, so a dialect difference breaks the hash. */
  def piiScrub(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val injected = d.select(col("doc_id"), concat_ws(" ",
      when(col("doc_id") % 10 === 0,
        concat(lit("contact user"), col("doc_id").cast("string"), lit("@example.com now"))),
      when(col("doc_id") % 7 === 0, lit("call 555-123-4567")),
      when(col("doc_id") % 13 === 0, lit("from 10.0.0.1")),
      col("text")).as("text"))
    // sort-then-project (r18): see textStats — the four regex passes
    // used to run twice under the terminal orderBy's range sampling
    injected.orderBy("doc_id")
      .select(col("doc_id"),
        graft.ops.Pii.emailCount(col("text")).as("n_emails"),
        graft.ops.Pii.phoneCount(col("text")).as("n_phones"),
        graft.ops.Pii.ipCount(col("text")).as("n_ips"),
        length(graft.ops.Pii.redact(col("text"))).as("redacted_chars"))
  }

  val piiScrubSql: String =
    """WITH inj AS (
      |  SELECT doc_id, concat_ws(' ',
      |    CASE WHEN doc_id % 10 = 0 THEN 'contact user' || CAST(doc_id AS VARCHAR) || '@example.com now' END,
      |    CASE WHEN doc_id % 7 = 0 THEN 'call 555-123-4567' END,
      |    CASE WHEN doc_id % 13 = 0 THEN 'from 10.0.0.1' END,
      |    text) AS text
      |  FROM documents
      |)
      |SELECT doc_id,
      |       len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
      |       len(regexp_extract_all(text, '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS n_phones,
      |       len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ips,
      |       length(regexp_replace(regexp_replace(regexp_replace(text,
      |         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
      |         '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '[PHONE]', 'g'),
      |         '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g')) AS redacted_chars
      |FROM inj ORDER BY doc_id""".stripMargin

  // ------------------------------------------------- sampling / selection

  /** Token-budget mixture assembly (r11): per source, keep documents
    * in md5-rank order while the running token total stays within the
    * source's budget ([[graft.ops.Sampling.tokenBudgetSample]] — the
    * bucketed two-phase prefix sum; the oracle runs the naive global
    * cumsum the bucketed plan must equal bit-for-bit). Budgets vary
    * per source (800 + 137·(src# mod 7)) so the cut exercises
    * different prefixes. */
  def budgetSample(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .withColumn("tokens", size(TextOps.tokens(col("text"))).cast("long"))
    val budgets = d.select(col("source")).distinct()
      .select(col("source").as("b_source"),
        (lit(800) + lit(137) *
          (expr("CAST(substring(source, 4, 10) AS INT)") % 7)).cast("long")
          .as("token_budget"))
    Sampling.tokenBudgetSample(d, col("source"), col("tokens"),
        col("doc_id"), budgets)
      .groupBy("source")
      .agg(count(lit(1)).as("docs_kept"), sum("tokens").as("tokens_kept"))
      .withColumn("token_budget",
        (lit(800) + lit(137) *
          (expr("CAST(substring(source, 4, 10) AS INT)") % 7)).cast("long"))
      .orderBy("source")
  }

  val budgetSampleSql: String =
    """WITH d AS (
      |  SELECT doc_id, source,
      |         CAST(len(string_split_regex(trim(text), '[ \t\n\x0B\f\r]+')) AS BIGINT) AS tokens
      |  FROM documents
      |), ranked AS (
      |  SELECT doc_id, source, tokens,
      |         sum(tokens) OVER (
      |           PARTITION BY source
      |           ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM d
      |), kept AS (
      |  SELECT * FROM ranked
      |  WHERE cum <= 800 + 137 * (CAST(substr(source, 4, 10) AS INT) % 7)
      |)
      |SELECT source, count(*) AS docs_kept,
      |       CAST(sum(tokens) AS BIGINT) AS tokens_kept,
      |       CAST(800 + 137 * (CAST(substr(source, 4, 10) AS INT) % 7) AS BIGINT)
      |         AS token_budget
      |FROM kept GROUP BY source ORDER BY source""".stripMargin

  /** Deterministic train/val/test split over documents (md5-mod
    * assignment — stable under corpus growth) with exact per-split
    * stats. Per-row codegen, one tiny aggregate; oracled bit-for-bit
    * because both engines share md5. */
  def splitStats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("split", Sampling.splitAssign(col("doc_id")))
      .withColumn("token_count", size(TextOps.tokens(col("text"))).cast("long"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"), sum("token_count").as("n_tokens"),
        min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
      .orderBy("split")

  val splitStatsSql: String =
    """WITH b AS (
      |  SELECT doc_id, len(string_split_regex(trim(text), '[ \t\n\x0B\f\r]+')) AS token_count,
      |         ((instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)),1,1))-1) * 4096
      |        + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)),2,1))-1) * 256
      |        + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)),3,1))-1) * 16
      |        + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)),4,1))-1)) % 100 AS pct
      |  FROM documents
      |)
      |SELECT CASE WHEN pct < 80 THEN 'train' WHEN pct < 90 THEN 'val' ELSE 'test' END AS split,
      |       count(*) AS n_docs, CAST(sum(token_count) AS BIGINT) AS n_tokens,
      |       min(doc_id) AS min_doc, max(doc_id) AS max_doc
      |FROM b GROUP BY 1 ORDER BY 1""".stripMargin

  /** Deterministic stratified sample: 3 docs per source, drawn by
    * md5-hash rank — reproducible subsampling with zero RNG
    * coordination. Oracled (md5 is shared with DuckDB). */
  def stratifiedSample(s: SparkSession, dir: String): DataFrame =
    Sampling.stratifiedSample(
        Tables.documents(s, dir).select("doc_id", "source"),
        col("source"), col("doc_id"), k = 3)
      .select("source", "rk", "doc_id")
      .orderBy("source", "rk")

  val stratifiedSampleSql: String =
    """WITH ranked AS (
      |  SELECT source, doc_id,
      |         CAST(row_number() OVER (PARTITION BY source
      |           ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS INT) AS rk
      |  FROM documents
      |)
      |SELECT source, rk, doc_id FROM ranked
      |WHERE rk <= 3 ORDER BY source, rk""".stripMargin

  /** Quality selection: top-5 documents per predicted language by
    * quality score (the "keep the best k per group" pipeline stage).
    * One shuffle on the group key; deterministic tiebreak by doc_id. */
  /** Mixture-allocation sample (r8): 200 docs with per-language
    * quotas proportional to quality-weighted mass — Hamilton
    * largest-remainder quotas over integer micro-units, md5-rank draw
    * within stratum (Sampling.mixtureSample). Every quota decision is
    * integer arithmetic, so the whole allocation hash-oracles exactly
    * (a pow/ln-keyed weighted draw could not — last-ulp quotient flips
    * floors across engines). */
  def mixtureSample(s: SparkSession, dir: String): DataFrame = {
    val scored = TextOps.textStats(Tables.documents(s, dir))
      .select("doc_id", "quality_score")
    val docs = Tables.documents(s, dir).select("doc_id", "lang")
      .join(scored, "doc_id")
    Sampling.mixtureSample(docs, col("lang"), col("quality_score"),
        col("doc_id"), n = 200L)
      .select(col("lang"), col("quota"), col("rk"), col("doc_id"))
      .orderBy("lang", "rk")
  }

  val mixtureSampleSql: String =
    """WITH toks AS (
      |  SELECT doc_id, text, string_split_regex(trim(text), '[ \t\n\x0B\f\r]+') AS tk
      |  FROM documents
      |), stats AS (
      |  SELECT doc_id, len(tk) AS token_count,
      |         round(CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) / length(text), 6) AS punct_ratio,
      |         round(CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / length(text), 6) AS digit_ratio,
      |         round(CAST(len(list_filter(tk, w -> list_contains(['the','a','an','of','and','or','is','are','in','on','to','it','this','that','with','for','as','at','by','be'], w))) AS DOUBLE) / len(tk), 6) AS stopword_ratio
      |  FROM toks
      |), scored AS (
      |  SELECT doc_id,
      |         round(least(1.0, greatest(0.0,
      |           0.15 * ln(1.0 + token_count)
      |           - 2.0 * punct_ratio - 2.0 * digit_ratio
      |           - abs(stopword_ratio - 0.35))), 6) AS quality_score
      |  FROM stats
      |), w AS (
      |  SELECT d.doc_id, d.lang,
      |         CAST(round(s.quality_score * 1000000) AS HUGEINT) AS micro
      |  FROM documents d JOIN scored s USING (doc_id)
      |), strata AS (
      |  SELECT lang, sum(micro) AS ws FROM w GROUP BY lang
      |), quotas AS (
      |  SELECT lang,
      |         (200 * ws) // (sum(ws) OVER ()) AS base,
      |         (200 * ws) % (sum(ws) OVER ()) AS rem
      |  FROM strata
      |), q2 AS (
      |  SELECT lang, base,
      |         row_number() OVER (ORDER BY rem DESC, lang ASC) AS lr,
      |         200 - sum(base) OVER () AS spare
      |  FROM quotas
      |), final AS (
      |  SELECT lang,
      |         CAST(base + CASE WHEN lr <= spare THEN 1 ELSE 0 END AS BIGINT) AS quota
      |  FROM q2
      |), ranked AS (
      |  SELECT lang, doc_id,
      |         CAST(row_number() OVER (PARTITION BY lang
      |           ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS INT) AS rk
      |  FROM documents
      |)
      |SELECT r.lang, f.quota, r.rk, r.doc_id
      |FROM ranked r JOIN final f USING (lang)
      |WHERE r.rk <= f.quota
      |ORDER BY lang, rk""".stripMargin

  def qualityTopK(s: SparkSession, dir: String): DataFrame = {
    val scored = TextOps.textStats(Tables.documents(s, dir))
      .withColumn("lang_pred", TextOps.langId(col("text")))
      .select("doc_id", "lang_pred", "quality_score")
    Sampling.topKPerGroup(scored, col("lang_pred"), col("quality_score"),
        col("doc_id"), k = 5)
      .select("lang_pred", "rk", "doc_id", "quality_score")
      .orderBy("lang_pred", "rk")
  }

  val qualityTopKSql: String =
    """WITH toks AS (
      |  SELECT doc_id, text, string_split_regex(trim(text), '[ \t\n\x0B\f\r]+') AS tk
      |  FROM documents
      |), stats AS (
      |  SELECT doc_id, text, len(tk) AS token_count,
      |         round(CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) / length(text), 6) AS punct_ratio,
      |         round(CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / length(text), 6) AS digit_ratio,
      |         round(CAST(len(list_filter(tk, w -> list_contains(['the','a','an','of','and','or','is','are','in','on','to','it','this','that','with','for','as','at','by','be'], w))) AS DOUBLE) / len(tk), 6) AS stopword_ratio
      |  FROM toks
      |), scored AS (
      |  SELECT doc_id,
      |         round(least(1.0, greatest(0.0,
      |           0.15 * ln(1.0 + token_count)
      |           - 2.0 * punct_ratio - 2.0 * digit_ratio
      |           - abs(stopword_ratio - 0.35))), 6) AS quality_score,
      |         string_split_regex(trim(lower(text)), '[ \t\n\x0B\f\r]+') AS ltk,
      |         length(regexp_replace(text, '[^\x{4e00}-\x{9fff}]', '', 'g')) AS cjk,
      |         greatest(length(text), 1) AS tlen
      |  FROM stats
      |), langs AS (
      |  SELECT doc_id, quality_score,
      |    CAST(len(list_filter(ltk, w -> list_contains(['the','a','of','and','is','to','in','that','it','for'], w))) AS DOUBLE) / (len(ltk)+1) AS s_en,
      |    CAST(len(list_filter(ltk, w -> list_contains(['der','die','das','und','ist','nicht','mit','ein','zu','den'], w))) AS DOUBLE) / (len(ltk)+1) AS s_de,
      |    CAST(len(list_filter(ltk, w -> list_contains(['le','la','les','et','est','un','une','des','que','pour'], w))) AS DOUBLE) / (len(ltk)+1) AS s_fr,
      |    CAST(len(list_filter(ltk, w -> list_contains(['el','la','los','las','y','es','un','una','que','por'], w))) AS DOUBLE) / (len(ltk)+1) AS s_es,
      |    CAST(cjk AS DOUBLE) / tlen * 10.0 AS s_zh
      |  FROM scored
      |), pred AS (
      |  SELECT doc_id, quality_score,
      |    CASE WHEN greatest(s_en, s_de, s_fr, s_es, s_zh) <= 0.005 THEN 'und'
      |         WHEN s_en = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'en'
      |         WHEN s_de = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'de'
      |         WHEN s_fr = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'fr'
      |         WHEN s_es = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'es'
      |         ELSE 'zh' END AS lang_pred
      |  FROM langs
      |), ranked AS (
      |  SELECT lang_pred, doc_id, quality_score,
      |         CAST(row_number() OVER (PARTITION BY lang_pred
      |           ORDER BY quality_score DESC, doc_id ASC) AS INT) AS rk
      |  FROM pred
      |)
      |SELECT lang_pred, rk, doc_id, quality_score
      |FROM ranked WHERE rk <= 5 ORDER BY lang_pred, rk""".stripMargin

  /** Exact length quantiles per predicted language (corpus profiling).
    * Exact `percentile` matches DuckDB's `quantile_cont` bit-for-bit at
    * binary-exact fractions (.25/.5/.75) over integer inputs. At
    * 100 TB this becomes `approx_percentile` (sketch-mergeable, one
    * pass) — exact percentile is used here because it is
    * cross-engine-checkable. */
  def lengthQuantiles(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("lang_pred", TextOps.langId(col("text")))
      .withColumn("char_count", length(col("text")))
      .groupBy("lang_pred")
      .agg(count(lit(1)).as("n"),
        expr("percentile(char_count, 0.25)").as("p25"),
        expr("percentile(char_count, 0.5)").as("p50"),
        expr("percentile(char_count, 0.75)").as("p75"))
      .orderBy("lang_pred")

  val lengthQuantilesSql: String =
    """WITH t AS (
      |  SELECT doc_id, length(text) AS char_count,
      |         string_split_regex(trim(lower(text)), '[ \t\n\x0B\f\r]+') AS ltk,
      |         length(regexp_replace(text, '[^\x{4e00}-\x{9fff}]', '', 'g')) AS cjk,
      |         greatest(length(text), 1) AS tlen
      |  FROM documents
      |), langs AS (
      |  SELECT doc_id, char_count,
      |    CAST(len(list_filter(ltk, w -> list_contains(['the','a','of','and','is','to','in','that','it','for'], w))) AS DOUBLE) / (len(ltk)+1) AS s_en,
      |    CAST(len(list_filter(ltk, w -> list_contains(['der','die','das','und','ist','nicht','mit','ein','zu','den'], w))) AS DOUBLE) / (len(ltk)+1) AS s_de,
      |    CAST(len(list_filter(ltk, w -> list_contains(['le','la','les','et','est','un','une','des','que','pour'], w))) AS DOUBLE) / (len(ltk)+1) AS s_fr,
      |    CAST(len(list_filter(ltk, w -> list_contains(['el','la','los','las','y','es','un','una','que','por'], w))) AS DOUBLE) / (len(ltk)+1) AS s_es,
      |    CAST(cjk AS DOUBLE) / tlen * 10.0 AS s_zh
      |  FROM t
      |), pred AS (
      |  SELECT char_count,
      |    CASE WHEN greatest(s_en, s_de, s_fr, s_es, s_zh) <= 0.005 THEN 'und'
      |         WHEN s_en = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'en'
      |         WHEN s_de = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'de'
      |         WHEN s_fr = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'fr'
      |         WHEN s_es = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'es'
      |         ELSE 'zh' END AS lang_pred
      |  FROM langs
      |)
      |SELECT lang_pred, count(*) AS n,
      |       quantile_cont(char_count, 0.25) AS p25,
      |       quantile_cont(char_count, 0.5) AS p50,
      |       quantile_cont(char_count, 0.75) AS p75
      |FROM pred GROUP BY lang_pred ORDER BY lang_pred""".stripMargin

  // ---------------------------------------------------------------- registry

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_text_stats"        -> (textStats _),
    "q_dedup_exact"       -> (dedupExact _),
    "q_passage_dedup"     -> (passageDedup _),
    "q_passage_dedup_incremental" -> (passageDedupIncremental _),
    "q_budget_sample"     -> (budgetSample _),
    "q_semdedup"          -> (semDedup _),
    "q_live_metrics"      -> (liveMetrics _),
    "q_unigram_quality"   -> (unigramQuality _),
    "q_dsir"              -> (dsirSelect _),
    "q_dsir_incremental"  -> (dsirIncremental _),
    "q_chunks"            -> (chunksExport _),
    "q_corpus_diff"       -> (corpusDiff _),
    "q_corpus_diff_incremental" -> (corpusDiffIncremental _),
    "q_split_leakage"     -> (splitLeakage _),
    "q_split_leakage_incremental" -> (splitLeakageIncremental _),
    "q_novelty"           -> (noveltyCard _),
    "q_novelty_incremental" -> (noveltyIncremental _),
    "q_bigram_quality"    -> (bigramQuality _),
    "q_bm25"              -> (bm25 _),
    "q_bm25_indexed"      -> (bm25Indexed _),
    "q_bm25_incremental"  -> (bm25Incremental _),
    "q_bm25_topk"         -> (bm25TopK _),
    "q_phrase_search"     -> (phraseSearch _),
    "q_phrase_search_incremental" -> (phraseSearchIncremental _),
    "q_lang_id"           -> (langId _),
    "q_sessionize"        -> (sessionize _),
    "q_interval_join"     -> (intervalJoin _),
    "q_sql_interval"      -> (sqlIntervalJoin _),
    "q_sql_interval_overlap" -> (sqlIntervalOverlap _),
    "q_sql_bm25"          -> (sqlBm25 _),
    "q_sql_phrase"        -> (sqlPhrase _),
    "q_sql_chunks"        -> (sqlChunks _),
    "q_sql_tfidf"         -> (sqlTfidf _),
    "q_daemon_status"     -> (daemonStatus _),
    "q_sql_daemon_status" -> (sqlDaemonStatus _),
    "q_interval_left"     -> (intervalJoinLeft _),
    "q_interval_overlap"  -> (intervalOverlapQ _),
    "q_pricing_summary"   -> (pricingSummary _),
    "q_revenue_by_nation" -> (revenueByNation _),
    "q_top_parts"         -> (topParts _),
    "q_dedup_minhash"     -> (dedupMinhash _),
    "q_dedup_incremental" -> (dedupIncremental _),
    "q_dedup_simhash"     -> (simhashFingerprints _),
    "q_ngram_jaccard"     -> (ngramJaccard _),
    "q_ann_brute"         -> (annBruteForce _),
    "q_ann_lsh"           -> (annLsh _),
    "q_embed_neardup"     -> (embedNearDup _),
    "q_multimodal_decode" -> (multimodalDecode _),
    "q_ann_ivf"           -> (annIvf _),
    "q_ann_ivf_indexed"   -> (annIvfIndexed _),
    "q_ann_ivf_incremental" -> (annIvfIncremental _),
    "q_cube_revenue"      -> (cubeRevenue _),
    "q_dedup_winnow"      -> ((s: SparkSession, d: String) => winnowDedup(s, d)),
    "q_dedup_clusters"    -> (dedupClusters _),
    "q_dedup_overlap"     -> (dedupOverlap _),
    "q_dup_spans"         -> (dupSpans _),
    "q_span_coverage"     -> (spanCoverage _),
    "q_dup_spans_incremental" -> (dupSpansIncremental _),
    "q_dedup_clusters_incremental" -> (dedupClustersIncremental _),
    "q_dedup_manifest_incremental" -> (dedupManifestIncremental _),
    "q_curation"          -> (curation _),
    "q_train_export"      -> (trainExport _),
    "q_stream_curation"   -> (streamCuration _),
    "q_dedup_manifest"    -> (dedupManifest _),
    "q_asof_join"         -> (asofJoin _),
    "q_decontam"          -> (decontam _),
    "q_decontam_bloom"    -> (decontamBloom _),
    "q_decontam_semantic" -> (decontamSemantic _),
    "q_kmeans"            -> (kmeansCard _),
    "q_repetition"        -> (repetition _),
    "q_tfidf_terms"       -> (tfidfTopTerms _),
    "q_tfidf_incremental" -> (tfidfIncremental _),
    "q_stream_window"     -> (streamWindow _),
    "q_stream_percentile" -> (streamPercentile _),
    "q_stream_topk"       -> (streamTopK _),
    "q_stream_dedup"      -> (streamDedup _),
    "q_stream_join"       -> (streamJoin _),
    "q_pack"              -> (packSequences _),
    "q_shard_export"      -> (shardExport _),
    "q_pii"               -> (piiScrub _),
    "q_split_stats"       -> (splitStats _),
    "q_stratified"        -> (stratifiedSample _),
    "q_mixture_sample"    -> (mixtureSample _),
    "q_quality_topk"      -> (qualityTopK _),
    "q_length_quantiles"  -> (lengthQuantiles _),
    "q_drift"             -> (drift _),
    "q_drift_incremental" -> (driftIncremental _),
    "q_profile"           -> (profile _),
    "q_outliers"          -> (outliers _))

  val oracles: Map[String, String] = Map(
    "q_text_stats"        -> textStatsSql,
    "q_dedup_exact"       -> dedupExactSql,
    "q_passage_dedup"     -> passageDedupSql,
    "q_passage_dedup_incremental" -> passageDedupSql,
    "q_budget_sample"     -> budgetSampleSql,
    "q_semdedup"          -> semDedupSql,
    "q_live_metrics"      -> liveMetricsSql,
    "q_unigram_quality"   -> unigramQualitySql,
    "q_dsir"              -> dsirSelectSql,
    // the incremental entry runs the BATCH SQL: the hash gate IS the
    // fold==rebuild contract for the persisted model counts
    "q_dsir_incremental"  -> dsirSelectSql,
    "q_chunks"            -> chunksExportSql,
    "q_corpus_diff"       -> corpusDiffSql,
    // maintained-state == batch-recompute gates (r12): the incremental
    // variants run the SAME SQL as their batch twins
    "q_corpus_diff_incremental" -> corpusDiffSql,
    "q_split_leakage"     -> splitLeakageSql,
    "q_split_leakage_incremental" -> splitLeakageSql,
    "q_novelty"           -> noveltyCardSql,
    // batch derivation restricted to the delta docs: the gate proves
    // the maintained gram-df store == a whole-corpus re-gram
    "q_novelty_incremental" -> noveltyIncrementalSql,
    "q_bigram_quality"    -> bigramQualitySql,
    "q_bm25"              -> bm25Sql,
    // the persisted-index probe and the incrementally-folded index must
    // reproduce the batch scores exactly — same oracle, so the hash
    // gates ARE the indexed == batch and fold == rebuild contracts
    "q_bm25_indexed"      -> bm25Sql,
    "q_bm25_incremental"  -> bm25Sql,
    // the oracle derives phrase hits from RAW TEXT; the engine serves
    // them from posting lists — the hash gate proves the positional
    // index reproduces the text scan
    // UNPRUNED full scoring: the gate proves MaxScore pruning is exact
    "q_bm25_topk"         -> bm25TopKSql,
    "q_phrase_search"     -> phraseSearchSql,
    // same raw-text oracle: the gate proves the positional postings
    // survive the incremental fold path occurrence-for-occurrence
    "q_phrase_search_incremental" -> phraseSearchSql,
    "q_lang_id"           -> langIdSql,
    "q_sessionize"        -> sessionizeSql,
    // both oracles are the NAIVE quadratic range joins the binned
    // equi-join plan replaces — the hash gates prove plan equivalence
    "q_interval_join"     -> intervalJoinSql,
    // SQL-TVF twins (r12/r13): same oracles as their DataFrame paths
    "q_sql_interval"      -> intervalJoinSql,
    "q_sql_interval_overlap" -> intervalOverlapSql,
    "q_sql_bm25"          -> bm25Sql,
    "q_sql_phrase"        -> phraseSearchSql,
    "q_sql_chunks"        -> chunksExportSql,
    "q_sql_tfidf"         -> tfidfIncrementalSql,
    "q_interval_left"     -> intervalJoinLeftSql,
    "q_interval_overlap"  -> intervalOverlapSql,
    "q_pricing_summary"   -> pricingSummarySql,
    "q_revenue_by_nation" -> revenueByNationSql,
    "q_top_parts"         -> topPartsSql,
    "q_ann_brute"         -> annBruteForceSql,
    "q_cube_revenue"      -> cubeRevenueSql,
    "q_multimodal_decode" -> multimodalDecodeSql,
    "q_split_stats"       -> splitStatsSql,
    "q_stratified"        -> stratifiedSampleSql,
    "q_mixture_sample"    -> mixtureSampleSql,
    "q_quality_topk"      -> qualityTopKSql,
    "q_length_quantiles"  -> lengthQuantilesSql,
    "q_drift"             -> driftSql,
    "q_drift_incremental" -> driftSql,
    "q_profile"           -> profileSql,
    "q_outliers"          -> outliersSql,
    "q_stream_window"     -> streamWindowSql,
    "q_stream_percentile" -> streamPercentileSql,
    "q_stream_topk"       -> streamTopKSql,
    "q_stream_dedup"      -> streamDedupSql,
    "q_stream_join"       -> streamJoinSql,
    "q_pack"              -> packSequencesSql,
    "q_shard_export"      -> shardExportSql,
    "q_pii"               -> piiScrubSql,
    "q_dedup_clusters"    -> dedupClustersSql,
    "q_dedup_overlap"     -> dedupOverlapSql,
    "q_dup_spans"         -> dupSpansSql,
    "q_span_coverage"     -> spanCoverageSql,
    "q_dup_spans_incremental" -> dupSpansSql,
    // incremental fold must reproduce the batch fixpoint exactly —
    // same oracle, so the hash gate proves the equivalence contract
    "q_dedup_clusters_incremental" -> dedupClustersSql,
    // store-carried quality must reproduce the batch manifest exactly
    "q_dedup_manifest_incremental" -> dedupManifestSql,
    "q_curation"          -> curationSql,
    "q_train_export"      -> trainExportSql,
    // the stream-maintained store must serve the SAME funnel as the
    // batch pipeline (per-fold equivalence composes across
    // microbatches) — same oracle, so continuous == batch is
    // hash-gated end to end
    "q_stream_curation"   -> curationSql,
    "q_dedup_manifest"    -> dedupManifestSql,
    "q_dedup_minhash"     -> dedupMinhashSql,
    "q_dedup_incremental" -> dedupIncrementalSql,
    "q_ngram_jaccard"     -> ngramJaccardSql,
    "q_asof_join"         -> asofJoinSql,
    "q_decontam"          -> decontamSql,
    "q_decontam_bloom"    -> decontamSql,
    "q_decontam_semantic" -> decontamSemanticSql,
    "q_kmeans"            -> kmeansCardSql,
    "q_dedup_winnow"      -> winnowDedupSql,
    "q_repetition"        -> repetitionSql,
    "q_dedup_simhash"     -> simhashSql,
    "q_ann_lsh"           -> annLshSql,
    "q_embed_neardup"     -> embedNearDupSql,
    "q_ann_ivf"           -> annIvfSql,
    // the persisted-index probe must produce EXACTLY the in-session
    // probe's rows (bit-identical model round-trip + precomputed cells)
    // — same oracle, so the offline lifecycle is hash-gated too
    "q_ann_ivf_indexed"   -> annIvfSql,
    // corpus-trained model, delta folded into the cell layout: the
    // oracle trains on the corpus subset but assigns/probes ALL rows —
    // identical to a same-model full rebuild, so fold == rebuild is
    // hash-gated
    "q_ann_ivf_incremental" -> annIvfIncrementalSql,
    "q_tfidf_terms"       -> tfidfTopTermsSql,
    "q_tfidf_incremental" -> tfidfIncrementalSql)

  /** rows-only: EMPTY since r7 — every query is fully DuckDB-oracled.
    * The escape route, applied r5-r7: make the engine's randomness
    * re-derivable. Winnowing (r5) and minhash/ngram (r6) via the
    * engine-owned PolyHash61; simhash, the LSH hyperplanes, the IVF
    * k-means and finally the HLL sketch (r7) via PolyHash61 /
    * literal-embedded java.util.Random driver constants / unrolled
    * Lloyd iterations / an engine-owned register layout
    * (functions/GraftHll replacing DataSketches). Where a SIGN or an
    * argmin decides an output (LSH bucket bits, k-means cells), the
    * oracle uses the exact list_reduce fold — list_sum's summation
    * order is unspecified. */
  /** Queries deliberately WITHOUT a DuckDB oracle (the driver records
    * a rows-only check): q_daemon_status (and its r13 SQL-TVF twin)
    * reads the daemon's applied-fold ledgers — commit-protocol text
    * files, not tables — so there is nothing a SQL engine could
    * replay; determinism is gated instead by ContinuousIngestSpec's
    * exact-id assertions and SqlDaemonStatusSpec's SQL == DataFrame. */
  val rowsOnly: Set[String] = Set("q_daemon_status", "q_sql_daemon_status")
}
