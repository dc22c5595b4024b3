package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-order (Morton-curve) data layout: sort a table by the bit
  * interleave of several bucketized columns before writing, so the
  * min/max statistics parquet keeps per file and row group stay TIGHT
  * on EVERY interleaved dimension at once — and a selective predicate
  * on any of them lets the scan skip most of the data. The standard
  * lakehouse answer (Delta/Iceberg `OPTIMIZE ZORDER BY`) to "we filter
  * this table by user AND by time, but a sort can only cluster one".
  *
  * Mechanics: each z-column maps to a `bits`-wide integer bucket by
  * min/max range scaling (bounds from one driver-side aggregate — the
  * offline layout job's own scan), the buckets' bits interleave into
  * one long (bit j of bucket i lands at position j·n+i — a fixed
  * shift/or expression tree, whole-stage codegen), and the table
  * range-partitions + sorts on that z-value. Locality of the Morton
  * curve bounds every file's extent in every dimension by
  * ~(1/files)^(1/n) of the domain instead of the full domain an
  * unrelated sort leaves; Spark's parquet reader then prunes row
  * groups from footer stats for predicates on any z-column
  * (`spark.sql.parquet.filterPushdown`), and file-level stats serve
  * formats that index them.
  *
  * This is a write-time cost (one range shuffle — exactly
  * [[Bucketing.writeBucketed]]'s amortization argument) paid once per
  * layout, not per query. Content is untouched: the z-value is a
  * transient sort key, dropped before the write. */
object ZOrder {

  /** Bit-interleave `n` bucket columns (each already in [0, 2^bits))
    * into one long. n·bits must fit a long's positive range. */
  private[ops] def interleave(buckets: Seq[Column], bits: Int): Column = {
    require(buckets.nonEmpty && bits > 0 && buckets.size * bits <= 62,
      s"${buckets.size} columns x $bits bits must be <= 62")
    val n = buckets.size
    val terms = for {
      b <- 0 until bits
      (c, i) <- buckets.zipWithIndex
    } yield shiftleft(shiftright(c, b).bitwiseAND(lit(1L)), b * n + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** Exact integer units for a z-column (the [[IntervalJoin]] rule:
    * timestamps → µs, dates → days, integrals → themselves). */
  private def units(df: DataFrame, name: String): Column =
    df.schema(name).dataType match {
      case TimestampType => unix_micros(col(name))
      case DateType      => unix_date(col(name))
      case ByteType | ShortType | IntegerType | LongType =>
        col(name).cast("long")
      case dt => throw new IllegalArgumentException(
        s"z-order column '$name' must be timestamp/date/integral, got $dt")
    }

  /** Write `df` to `path` z-ordered on `zCols`. `files` sizes the
    * range partitioning (≈ output file count); `bits` the per-column
    * bucket resolution (16 ⇒ 65536 buckets — far finer than any
    * realistic file count needs). NULLs in z-columns sort to bucket 0
    * (still one contiguous z-range — they cluster, not scatter). */
  def writeZOrdered(df: DataFrame, path: String, zCols: Seq[String],
      files: Int = 32, bits: Int = 16): Unit = {
    require(zCols.nonEmpty, "need at least one z-order column")
    val aggs = zCols.flatMap(c => Seq(min(units(df, c)), max(units(df, c))))
    val bounds = df.agg(aggs.head, aggs.tail: _*).head()
    val buckets = zCols.zipWithIndex.map { case (c, i) =>
      val (lo, hi) =
        (if (bounds.isNullAt(2 * i)) 0L else bounds.getLong(2 * i),
         if (bounds.isNullAt(2 * i + 1)) 0L else bounds.getLong(2 * i + 1))
      val span = math.max(1L, hi - lo)
      // double scaling is fine here: the bucket only PLACES a row on
      // the curve; correctness never depends on the exact bucket
      val scaled = floor((units(df, c) - lit(lo)).cast("double")
        / span * ((1L << bits) - 1)).cast("long")
      coalesce(greatest(least(scaled, lit((1L << bits) - 1)), lit(0L)), lit(0L))
    }
    df.withColumn("__z", interleave(buckets, bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
