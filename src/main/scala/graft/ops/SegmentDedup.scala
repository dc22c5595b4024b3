package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sub-document (segment-level) exact deduplication — the
  * paragraph/passage dedup stage of web-corpus curation (CCNet §4.1 /
  * RefinedWeb / Gopher line-dedup): instead of dropping whole
  * near-duplicate documents, drop every repeated SEGMENT after its
  * corpus-first occurrence and rebuild each document from its surviving
  * segments. Boilerplate (headers, footers, license blocks, copied
  * passages) disappears corpus-wide while unique prose survives.
  *
  * Segmenters are plain codegen'd Column expressions (array<string>):
  *  - [[paragraphs]]: split on blank lines — the web-text unit;
  *  - [[tokenWindows]]: fixed n-token windows — a delimiter-free
  *    fallback (and the unit the synthetic fixture exercises).
  *
  * Scale shape (the part that must survive 100 TB):
  *  - the keeper of each distinct segment is `min(struct(doc_id, pos))`
  *    — a PARTIAL-AGGREGATABLE min, so a segment repeated 10⁸ times
  *    (empty boilerplate, cookie banners) combines map-side and never
  *    concentrates on one task; a `row_number() OVER (PARTITION BY
  *    fingerprint)` would sort the hottest key in a single partition,
  *    exactly the skew this formulation designs out.
  *  - the keep decision is a fingerprint-keyed join of segments against
  *    the (distinct-fingerprint-sized) keeper table; hot fingerprints
  *    fan out across tasks and AQE skew-split covers the tail.
  *  - rebuild is a per-doc collect_list bounded by document size.
  * Everything is built-in functions — one codegen scan, two shuffles
  * (fingerprint, then doc) — no UDFs, no windows over data-scale keys.
  */
object SegmentDedup {

  /** Paragraph segmenter: blank-line-separated blocks. */
  def paragraphs(text: Column): Column = split(text, "\n{2,}")

  /** Fixed n-token window segmenter (space-rejoined), for corpora
    * without paragraph structure. Last window may be short. */
  def tokenWindows(text: Column, n: Int): Column =
    tokenWindowsFromTokens(TextOps.tokens(text), n)

  /** The window stage over an already-materialized token array — the
    * shared-per-batch-token seam ([[TextOps.withSharedTokens]]). */
  def tokenWindowsFromTokens(tk: Column, n: Int): Column =
    transform(
      sequence(lit(0), (size(tk) + lit(n - 1)).divide(lit(n)).cast("int") - lit(1)),
      i => array_join(slice(tk, i * n + 1, lit(n)), " "))

  /** Segment rows (id, pos, seg, fp): position-exploded segments with
    * the house fingerprint (md5 of whitespace-collapsed lowercase —
    * TextOps.exactDedup's normalization at segment grain). Whitespace-
    * only documents contribute no rows. */
  private[ops] def segmentRows(docs: DataFrame, segments: Column, idCol: String,
      textCol: String): DataFrame =
    docs
      .filter(length(trim(col(textCol))) > 0)
      .select(col(idCol), posexplode(segments).as(Seq("pos", "seg")))
      .filter(length(trim(col("seg"))) > 0)
      .withColumn("fp", md5(regexp_replace(lower(trim(col("seg"))),
        TextOps.WhitespaceRe, " ")))

  /** Per-document result: `n_segments`, `kept_segments`, and the text
    * rebuilt from surviving segments in original order (`new_text`,
    * segments re-joined with `sep`). Documents whose every segment was
    * seen earlier come back with `kept_segments = 0` and empty text —
    * the caller decides whether to drop them. */
  def dedup(docs: DataFrame, segments: Column, idCol: String = "doc_id",
      textCol: String = "text", sep: String = "\n\n"): DataFrame = {
    val segs = Persists.cacheFor(
      segmentRows(docs, segments, idCol, textCol), 3)
    // corpus-first occurrence per distinct segment: skew-immune
    // partial-agg min, then a fingerprint join (see object doc)
    val keeper = segs.groupBy("fp")
      .agg(min(struct(col(idCol), col("pos"))).as("k"))
    val kept = segs.join(keeper, "fp")
      .filter(col(idCol) === col(s"k.$idCol") && col("pos") === col("k.pos"))
    val perDoc = kept.groupBy(idCol).agg(
      count(lit(1)).as("kept_segments"),
      concat_ws(sep, transform(
        array_sort(collect_list(struct(col("pos"), col("seg")))),
        s => s.getField("seg"))).as("new_text"))
    val counts = segs.groupBy(idCol).agg(count(lit(1)).as("n_segments"))
    docs
      .join(counts, Seq(idCol), "left")
      .join(perDoc, Seq(idCol), "left")
      .withColumn("n_segments", coalesce(col("n_segments"), lit(0L)))
      .withColumn("kept_segments", coalesce(col("kept_segments"), lit(0L)))
      .withColumn("new_text", coalesce(col("new_text"), lit("")))
  }
}
