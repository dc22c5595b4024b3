package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalable interval (range) joins: point-in-interval and
  * interval-overlap, via bin bucketing.
  *
  * Spark has no native range-join operator: a bare
  * `p.ts BETWEEN i.lo AND i.hi` join plans as
  * BroadcastNestedLoopJoin (fine only while one side broadcasts) or a
  * cartesian product — O(|points|·|intervals|), the classic 100 TB
  * scale-killer. The standard fix (the same binning Databricks' range
  * -join hint and the genomics engines apply) turns the inequality
  * into an EQUI-join on a derived bin key:
  *
  *  - every point lands in exactly one bin `floor(t / w)`;
  *  - every interval explodes to the bins it covers
  *    (`sequence(floor(lo/w), floor(hi/w))` — codegen, no UDF);
  *  - the bin equi-join (plus any user key columns) shuffles both
  *    sides ONCE on (keys, bin) — SortMergeJoin/ShuffledHashJoin, AQE
  *    skew-split eligible — and the exact predicate filters the
  *    candidates inside the join's own stage.
  *
  * Monotonicity of `floor` guarantees no missed match: lo ≤ p ≤ hi ⇒
  * floor(lo/w) ≤ floor(p/w) ≤ floor(hi/w), so the point's bin is
  * always among the interval's bins. A point pairs with an interval in
  * at most ONE bin (its own), so point-in-interval needs no dedup; the
  * overlap join keeps each candidate pair only in one canonical shared
  * bin (the bin of `max(loL, loR)` — the low end of the intersection,
  * covered by both sides iff they overlap), so it emits exact pairs
  * without a distinct.
  *
  * Cost model: output-proportional + O((|L| + Σ bins-per-interval)
  * shuffle). `binWidth` trades replication (wide intervals / narrow
  * bins → more exploded rows) against candidate pressure (narrow
  * intervals / wide bins → more false candidates filtered post-join).
  * Pick w ≈ the typical interval length; the per-interval explosion is
  * hard-capped by `maxBinsPerInterval` (a row over the cap fails the
  * job with a clear message instead of silently exploding 10⁶ rows —
  * raise the cap or widen the bins deliberately).
  *
  * Time columns may be TimestampType (binned on exact integer
  * microseconds), DateType (days), or any integral type; `binWidth`
  * is in those units. `floor(t / w)` runs in double arithmetic, which
  * is provably exact for |units| < 2⁵³ (proof sketch: for a = qw − r,
  * 1 ≤ r < w, the quotient's distance to the next integer is r/w ≥
  * a·2⁻⁵³/w·… > ulp/2, so it never rounds up) — that covers µs
  * timestamps until year ~2250 and every day-number; only raw integral
  * keys beyond 2⁵³ would need an exact-decimal bin, which no time
  * domain produces. Closed-interval semantics
  * ([lo, hi], SQL BETWEEN) on both variants; NULL endpoints and
  * inverted intervals (hi < lo) match nothing, like their SQL
  * predicates. Intervals at or beyond corpus scale stay fully
  * distributed — nothing here collects, broadcasts, or assumes either
  * side is small. */
object IntervalJoin {

  /** Exact integer units for binning: µs for timestamps, days for
    * dates, the value itself for integrals. Doubles are refused —
    * FP binning would make bin membership platform-dependent. */
  private def units(df: DataFrame, name: String): Column =
    df.schema(name).dataType match {
      case TimestampType   => unix_micros(col(name))
      case DateType        => unix_date(col(name))
      case ByteType | ShortType | IntegerType | LongType => col(name).cast("long")
      case dt => throw new IllegalArgumentException(
        s"interval join column '$name' must be timestamp/date/integral, got $dt")
    }

  private def binsOf(df: DataFrame, lo: String, hi: String, w: Long,
      maxBins: Long): Column = {
    val loB = floor(units(df, lo) / w)
    val hiB = floor(units(df, hi) / w)
    // the cap rides inside the sequence bound so column pruning can
    // never drop the guard: an over-wide interval fails the job here
    val guarded = when(hiB - loB < maxBins, hiB).otherwise(raise_error(concat(
      lit(s"interval [$lo, $hi] spans >= $maxBins bins of width $w ("),
      (hiB - loB + 1).cast("string"),
      lit(s"); raise maxBinsPerInterval or widen binWidth"))).cast("long"))
    sequence(loB, guarded)
  }

  /** Pick a bin width from the data: the median interval length
    * (approx, one aggregate over the intervals side — run it once and
    * reuse; this is the offline tuning step, not part of the join
    * plan). The median balances the two failure modes the width knob
    * trades: much-wider bins → every interval lands in ~1 bin but
    * points drag in many false candidates; much-narrower bins → tight
    * candidates but wide intervals explode to many rows. Zero-length
    * medians clamp to 1. */
  def suggestBinWidth(intervals: DataFrame, loCol: String,
      hiCol: String): Long = {
    val len = units(intervals, hiCol) - units(intervals, loCol)
    val row = intervals.filter(len >= 0).select(len.as("__len"))
      .agg(expr("approx_percentile(__len, 0.5)")).head()
    if (row.isNullAt(0)) 1L else math.max(1L, row.getLong(0))
  }

  /** Attach every `intervals` row containing each `points` row:
    * `points.pointCol ∈ [loCol, hiCol]` (+ equality on `keys`). Inner
    * join; output = point columns ++ interval columns (keys once).
    * Non-key column names must be disjoint — rename before joining. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String, binWidth: Long,
      keys: Seq[String] = Nil, maxBinsPerInterval: Long = 4096L): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val clash = (points.columns.toSet - pointCol) intersect
      (intervals.columns.toSet -- keys)
    require(clash.isEmpty, s"rename clashing non-key columns: $clash")
    val p = points.withColumn("__bin", floor(units(points, pointCol) / binWidth))
    val i = intervals
      .filter(col(loCol).isNotNull && col(hiCol).isNotNull)
      .withColumn("__bin",
        explode(binsOf(intervals, loCol, hiCol, binWidth, maxBinsPerInterval)))
    p.join(i, keys :+ "__bin")
      .filter(units(points, pointCol).between(units(intervals, loCol),
        units(intervals, hiCol)))
      .drop("__bin")
  }

  /** Left-outer point-in-interval: every `points` row appears at least
    * once; interval columns are null where nothing contained it — the
    * "enrich events with an optional context window" shape. Composed
    * as the inner bin join plus an anti-join add-back keyed on
    * `pointIdCols` (a unique key of the points side — required
    * because a bare anti-join on all columns would collapse duplicate
    * point rows). Same cost shape as the inner join plus one
    * broadcast-able anti-join on the matched keys. */
  def pointInIntervalLeft(points: DataFrame, intervals: DataFrame,
      pointIdCols: Seq[String], pointCol: String, loCol: String,
      hiCol: String, binWidth: Long, keys: Seq[String] = Nil,
      maxBinsPerInterval: Long = 4096L): DataFrame = {
    require(pointIdCols.nonEmpty, "pointIdCols must name a unique point key")
    val inner = pointInInterval(points, intervals, pointCol, loCol, hiCol,
      binWidth, keys, maxBinsPerInterval)
    val unmatched = points
      .join(inner.select(pointIdCols.map(col): _*).distinct(),
        pointIdCols, "left_anti")
    val ivalCols = inner.columns.filterNot(points.columns.contains)
    val padded = ivalCols.foldLeft(unmatched) { (df, c) =>
      df.withColumn(c, lit(null).cast(inner.schema(c).dataType)) }
    inner.unionByName(padded.select(inner.columns.map(col): _*))
  }

  /** All overlapping pairs: `[loL, hiL] ∩ [loR, hiR] ≠ ∅` (closed;
    * touching endpoints overlap) with equality on `keys`. Each pair
    * emitted exactly once — candidates dedup to the canonical shared
    * bin, never through a distinct over the output. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      loL: String, hiL: String, loR: String, hiR: String, binWidth: Long,
      keys: Seq[String] = Nil, maxBinsPerInterval: Long = 4096L): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val clash = (left.columns.toSet -- keys) intersect
      (right.columns.toSet -- keys)
    require(clash.isEmpty, s"rename clashing non-key columns: $clash")
    val l = left.filter(col(loL).isNotNull && col(hiL).isNotNull)
      .withColumn("__bin",
        explode(binsOf(left, loL, hiL, binWidth, maxBinsPerInterval)))
    val r = right.filter(col(loR).isNotNull && col(hiR).isNotNull)
      .withColumn("__bin",
        explode(binsOf(right, loR, hiR, binWidth, maxBinsPerInterval)))
    l.join(r, keys :+ "__bin")
      .filter(units(left, loL) <= units(right, hiR) &&
        units(right, loR) <= units(left, hiL))
      .filter(col("__bin") ===
        floor(greatest(units(left, loL), units(right, loR)) / binWidth))
      .drop("__bin")
  }
}
