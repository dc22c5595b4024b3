package graft

/** SINGLE SOURCE OF TRUTH for every measured-performance budget the
  * bench artifacts self-evaluate (VERDICT r17 task 4: the five stage
  * limits used to exist twice — Bench's checks Seq and SCALE.md's
  * table — so a drift between artifact and doc would have been
  * silent). The mains both ENFORCE and PRINT these values into their
  * artifacts (`bands` maps carry [reading, limit, pass] triples), so
  * the artifact is canonical; SCALE.md references the artifacts
  * rather than restating numbers.
  *
  * Gate statistics these limits apply to (SCALE.md r17 band rule):
  *  - bench stage bands gate on `stages_min` — the per-stage MIN over
  *    the dedicated fresh-rebuild reps (burst-robust on a host whose
  *    contention bursts run minutes INSIDE reps; a real regression
  *    elevates every rep including the quietest);
  *  - scale-sweep bands gate on the min-of-runs ratio scaled/base at
  *    the R=100 fixture;
  *  - daemonfloor gates on min(drain) vs the r14/r15 quiet-host
  *    anchors, because the intercept is a DIFFERENCE of two arms and
  *    min-composing it biases either way.
  */
object BandBudgets {

  /** One bench stage band: `stages_min(query)(stage) <= limit`. */
  final case class StageBand(name: String, query: String, stage: String,
      limit: Double)

  /** Dedicated-stage-pass budgets at sf0.1 (pinned r11–r16; history in
    * SCALE.md — stream_fold's 19–22 window is descriptive of the quiet
    * cost, the GATE is the <=22 upper edge). */
  val stageBands: Seq[StageBand] = Seq(
    StageBand("spans_fold", "q_dup_spans_incremental", "fold", 6.0),
    StageBand("clusters_fold", "q_dedup_clusters_incremental", "fold", 4.0),
    StageBand("bm25_write", "q_bm25_incremental", "write_state", 15.0),
    StageBand("bm25_fold", "q_bm25_incremental", "fold", 10.0),
    StageBand("stream_fold", "q_stream_curation", "stream_fold", 22.0))

  /** The bm25 fold band is only a valid reading at ZERO bucket
    * compactions (SCALE.md r14: a compaction rep rewrites corpus
    * buckets inside the fold clock — at sf0.1's quartile-fold geometry
    * no bucket crosses compactAt, so any nonzero count is itself a
    * regression). ADVICE r17: this condition rides `all_pass`, not
    * just prose. */
  val bm25CompactionQuery = "q_bm25_incremental"
  val bm25CompactionCounter = "fold_compacted_buckets"

  /** Scale-sweep ratio ceilings (scaled/base at R=100, min-of-runs
    * both sides — VERDICT r17 task 1). Classes and their measured
    * r13–r17 artifact history:
    *  - flat class (fold reads only the delta + a metadata-scale or
    *    slim guarded store): measured 0.74–1.18 across five rounds;
    *    ceiling 1.4 = worst flat reading + one host-band notch on a
    *    min-of-2 statistic.
    *  - slim-stream class (fold streams ONE corpus-proportional slim
    *    store): measured maxima dedup 1.59/1.62, clusters_small 1.69,
    *    segments 1.74; ceiling 1.9 = class max + one notch (the
    *    documented 1.4–1.8 band is the quiet-host shape; the gate must
    *    not false-fail on the band's own host spread).
    *  - spans: its own documented 1.65–2.26 host band (r11-measured,
    *    post-r13 readings 1.17–1.76); ceiling 2.3.
    *  - topk_tokens: stable 5.0–5.7 eviction-regime band since r11;
    *    ceiling 5.7. */
  val sweepBands: Seq[(String, Double)] = Seq(
    "dedup" -> 1.9, "dedup_small" -> 1.9,
    "clusters" -> 1.4, "clusters_small" -> 1.9,
    "ann" -> 1.4, "drift" -> 1.4, "bm25" -> 1.4, "dsir" -> 1.4,
    "segments" -> 1.9, "spans" -> 2.3, "topk" -> 5.7)

  /** CC fixpoint-depth flatness: pointer-jumping rounds at 100x may
    * exceed the base depth by at most one (lineage-truncated O(log d);
    * measured flat at 5/5 in every sweep since r13). */
  val ccDepthSlack = 1

  /** Daemonfloor quiet-host anchors (r14/r15) and the gate tolerance:
    * min(drain) within 10% ABOVE the anchor passes — a lower reading
    * is a faster host, not a failure (SCALE.md r17 gate). */
  val drain1Anchor = 9.52
  val drain3Anchor = 21.00
  val drainTolerance = 0.10

  /** The per-batch fixed-cost floor (r15 quiet-host reading) and the
    * quiet-session detector that re-confirms it (VERDICT r17 task 2):
    * two CONSECUTIVE reps whose drains agree within 15% and sit at
    * anchor level (within 15% of the anchors) constitute a quiet
    * window; the intercept read there is a valid floor measurement. */
  val interceptFloor = 5.5
  val quietTolerance = 0.15
}
