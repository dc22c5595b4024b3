package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-substring duplicate spans (Lee et al. 2022, "Deduplicating
  * Training Data Makes Language Models Better" — the ExactSubstr
  * operation, at token-gram granularity): find the maximal token spans
  * of each document whose every n-gram also occurs elsewhere in the
  * corpus. Complements the doc-level family (MinHash/SimHash/winnowing
  * dedup whole near-duplicate DOCUMENTS); this marks the duplicated
  * REGIONS — boilerplate headers, licenses, quoted blocks — inside
  * documents that are otherwise unique, the spans a training pipeline
  * clips rather than dropping the doc.
  *
  * Pipeline (all relational, no UDFs):
  *  1. tokenize (whitespace) and slide an n-token gram window per doc
  *     (codegen HOFs: `transform` over `sequence` + `slice`);
  *  2. corpus-wide gram document-frequency (ONE shuffle on the gram,
  *     map-side combined; df counts DISTINCT docs so internal repeats
  *     don't mark a span);
  *  3. positions whose gram has df ≥ minDf join back (shuffle on gram,
  *     matching grams only);
  *  4. per-doc island detection — consecutive hit positions merge into
  *     maximal `[span_start, span_end)` token intervals via the
  *     pos − row_number() grouping trick (one shuffle on doc_id).
  *
  * At 100 TB the gram strings would be hashed to fixed width before
  * the shuffle (PolyHash61, the winnowing precedent) and the df table
  * bloom-prefiltered like decontamination; the plan shape — explode,
  * count, semi-join back, island windows — is unchanged. Spans are
  * token-indexed (start inclusive, end exclusive, end − start ≥ n),
  * deterministic, and fully re-derivable in ANSI SQL (the DuckDB
  * oracle replays the same four stages on raw gram strings).
  */
object DupSpans {

  /** Duplicate spans of `docs(idCol, textCol)`: one row per maximal
    * duplicated interval — (doc_id, span_start, span_end, n_docs_max)
    * where n_docs_max is the largest df among the span's grams (how
    * widely its most-copied gram spreads). */
  def duplicateSpans(
      docs: DataFrame,
      n: Int = 16,
      minDf: Int = 2,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(n >= 2, s"gram width must be >= 2, got $n")
    require(minDf >= 2, s"minDf < 2 would mark every position, got $minDf")
    val grams = gramRows(docs, n, idCol, textCol)
    // distinct-doc frequency per gram: a gram repeated WITHIN one doc
    // is self-similarity, not corpus duplication. r18 (guide §2.3
    // aggregate before you shuffle): df comes from [[docGramSets]] —
    // the within-doc dedupe happens NARROW (array_distinct per row),
    // so the shuffle carries map-side-combined (g, count) partials
    // instead of countDistinct's full (g, doc) pair expansion (one
    // Exchange instead of two; the incremental fold has always counted
    // df this way, so fold==rebuild already proves the equivalence).
    val df = docGramSets(docs, n, idCol, textCol).groupBy("g")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
    spansFrom(grams, df, n, idCol)
  }

  /** The gram stage, shared with [[IncrementalSpans]] (the fold's
    * fold==rebuild contract requires the two pipelines to gram
    * IDENTICALLY — one definition, no divergence risk):
    * (idCol, pos, g) sliding n-token windows; positions 0 .. size−n;
    * docs shorter than one gram emit nothing. */
  private[ops] def gramRows(docs: DataFrame, n: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // the engine-wide whitespace class; reuses a shared per-batch token
    // column when the caller attached one (TextOps.withSharedTokens)
    val tk = TextOps.tokensOf(docs, textCol)
    docs
      .select(col(idCol), tk.as("tk"))
      .filter(size(col("tk")) >= n)
      .select(col(idCol), explode(expr(
        s"transform(sequence(0, size(tk) - $n), " +
          s"i -> struct(i AS pos, array_join(slice(tk, i + 1, $n), ' ') AS g))"))
        .as("pg"))
      .select(col(idCol), col("pg.pos").cast("long").as("pos"), col("pg.g").as("g"))
  }

  /** Per-doc DISTINCT gram stream (idCol, g) — NO shuffle: the dedupe
    * happens inside each row via `array_distinct` (the decontamination
    * lesson — a corpus-wide (doc, gram) `.distinct()` is a corpus-wide
    * shuffle, the narrow per-row distinct is free). Emits exactly the
    * distinct (g, doc) pair set of [[gramRows]], which is what df
    * accounting needs: each row is one document's vote for one gram. */
  private[ops] def docGramSets(docs: DataFrame, n: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tk = TextOps.tokensOf(docs, textCol)
    docs
      .select(col(idCol), tk.as("tk"))
      .filter(size(col("tk")) >= n)
      .select(col(idCol), explode(array_distinct(expr(
        s"transform(sequence(0, size(tk) - $n), i -> array_join(slice(tk, i + 1, $n), ' '))")))
        .as("g"))
  }

  /** The island stage, shared with [[IncrementalSpans]]: join gram
    * positions against an (already minDf-filtered) (g, df) frame and
    * merge consecutive hit positions into maximal spans — consecutive
    * positions share (pos − row_number). */
  private[ops] def spansFrom(grams: DataFrame, dupDf: DataFrame, n: Int,
      idCol: String = "doc_id"): DataFrame = {
    val hits = grams.join(dupDf, "g").select(col(idCol), col("pos"), col("df"))
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    hits
      .withColumn("island", col("pos") - row_number().over(byDoc))
      .groupBy(col(idCol), col("island"))
      .agg(min("pos").as("span_start"),
        (max("pos") + lit(n)).as("span_end"),
        max("df").as("n_docs_max"))
      .select(col(idCol), col("span_start"), col("span_end"), col("n_docs_max"))
  }
}
