package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff between two corpus versions: which documents were
  * added, removed, changed, or left untouched — the regression check a
  * curation pipeline runs when a crawl re-delivers ("did the refresh
  * really only touch what it claims?") and the input to incremental
  * re-processing (changed docs re-enter the pipeline as a delta).
  *
  * Scale shape: both sides collapse to (id, md5 fingerprint, carry)
  * BEFORE the join — fixed-width rows through the one id-keyed shuffle,
  * never document text (the [[MinHashLSH]] pair-join rule). The join is
  * full-outer on the id; status falls out of null-ness + fingerprint
  * equality. With both snapshots bucketed on the id
  * ([[Bucketing.writeBucketed]]) the shuffle disappears entirely.
  *
  * The fingerprint is md5 per content column, concatenated — fixed
  * 32-hex segments, so multi-column content never aliases across a
  * boundary the way a separator join could — and any engine re-derives
  * the same statuses (q_corpus_diff hash-gates the card against
  * DuckDB). A NULL column marks with a sentinel distinct from the
  * empty string. */
object CorpusDiff {

  /** The content fingerprint — shared with [[FingerprintStore]], whose
    * persisted rows must stay definitionally identical so a
    * state-served diff equals a raw-text diff. */
  private[ops] def fpOf(contentCols: Seq[String]): Column =
    concat(contentCols.map(c =>
      md5(coalesce(col(c).cast("string"), lit("<NULL>")))): _*)

  /** Per-document status: (idCol, carry..., status) with status one of
    * added | removed | changed | unchanged. `carry` columns come from
    * the NEW snapshot where present, else the old (removed docs). */
  def diff(oldDf: DataFrame, newDf: DataFrame, idCol: String = "doc_id",
      contentCols: Seq[String] = Seq("text"),
      carry: Seq[String] = Seq("source")): DataFrame = {
    require(contentCols.nonEmpty, "need at least one content column")
    diffFps(oldDf.select(col(idCol) +: (fpOf(contentCols).as("__fp_o") +:
        carry.map(c => col(c).as(s"__o_$c"))): _*),
      newDf, idCol, contentCols, carry)
  }

  /** The diff tail over an ALREADY-fingerprinted old side (idCol,
    * __fp_o, __o_<carry>...) — the seam [[FingerprintStore.diffAgainst]]
    * serves stored fingerprints through, so only the new snapshot's
    * text is ever hashed. */
  private[ops] def diffFps(oldFps: DataFrame, newDf: DataFrame,
      idCol: String, contentCols: Seq[String],
      carry: Seq[String]): DataFrame = {
    require(contentCols.nonEmpty, "need at least one content column")
    val newFps = newDf.select(col(idCol) +: (fpOf(contentCols).as("__fp_n") +:
      carry.map(c => col(c).as(s"__n_$c"))): _*)
    val joined = oldFps.join(newFps, Seq(idCol), "full_outer")
    val status = when(col("__fp_o").isNull, "added")
      .when(col("__fp_n").isNull, "removed")
      .when(col("__fp_o") =!= col("__fp_n"), "changed")
      .otherwise("unchanged")
    joined.select(col(idCol) +:
      (carry.map(c => coalesce(col(s"__n_$c"), col(s"__o_$c")).as(c)) :+
        status.as("status")): _*)
  }
}
