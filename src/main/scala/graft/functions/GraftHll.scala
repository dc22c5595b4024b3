package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{BinaryType, ByteType, DataType, IntegerType, LongType, ShortType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Engine-owned HyperLogLog (Flajolet et al. 2007) with the
  * [[PolyHash61]] hash — the approx-distinct sketch whose registers,
  * merges and estimate are all RE-DERIVABLE in the DuckDB oracle,
  * unlike the DataSketches binary it replaces (the last rows-only
  * query; the minhash/simhash/LSH precedent applied to sketches).
  *
  * Layout: p=12 → m=4096 byte registers. For a value v:
  * `h = PolyHash61(str(PolyHash61(str(v))))` — the DOUBLE fold: one
  * polynomial pass over short sequential decimal keys leaves its
  * geometric-tail bits correlated (measured −4.6% estimate bias on
  * 20k sequential ids); re-folding the first hash's decimal digits
  * decorrelates them. `bucket = h mod m` (low 12 bits),
  * `w = h >> 12` (49 bits), `rho = trailing-zeros(w) + 1` (w=0 → 50)
  * — trailing, not leading, zeros: measured UNBIASED on sequential
  * keys (mean 1.003 over 20 disjoint 20k ranges) where the
  * leading-zero variant kept a −1.3% residual. All exact integer ops,
  * so the oracle recomputes registers with `bin(w & -w)` lengths, no
  * floating log. Estimate: `alpha_m·m²/Σ 2^−M_j` with the standard
  * small-range correction `m·ln(m/V)`, folded over registers IN
  * BUCKET ORDER on both engines (bit-identical up to libm's `ln`,
  * which only feeds a final half-up round).
  *
  * Registers are storable, mergeable partials (merge = element-wise
  * max, exact over unions of inputs), so approx-distinct measures
  * ROUTE through rollups and fold incrementally — the 100 TB answer to
  * distinct counts (AggDecompose: partial `graft_hll_agg`, re-agg
  * `graft_hll_merge`, combiner `graft_hll_estimate`).
  *
  * Accuracy: measured σ ≈ 2.5% on sequential integer keys (the ideal
  * 1.04/√m is 1.6%; the polynomial hash pays ~1.5× variance vs a
  * cryptographic mix — the price of oracle-ability, property-gated in
  * GraftHllSpec). The value-to-string hash contract matches SQL CAST
  * for integer/string keys (the supported key types).
  */
object GraftHll {

  val P = 12
  val M: Int = 1 << P

  private[functions] def hashOf(v: Any): Long = {
    val h1 = v match {
      case s: UTF8String => PolyHash61.compute(s.getBytes)
      case other => PolyHash61.compute(String.valueOf(other).getBytes("UTF-8"))
    }
    PolyHash61.compute(java.lang.Long.toString(h1).getBytes("UTF-8"))
  }

  private[functions] def add(regs: Array[Byte], h: Long): Unit = {
    val bucket = (h & (M - 1)).toInt
    val w = h >>> P // 49 significant bits
    // rho = trailing-zero count + 1 (see scaladoc); exact integer math
    val rho = if (w == 0L) 50 else java.lang.Long.numberOfTrailingZeros(w) + 1
    if (rho > regs(bucket)) regs(bucket) = rho.toByte
  }

  private[functions] def mergeInto(into: Array[Byte], from: Array[Byte]): Array[Byte] = {
    var j = 0
    while (j < M) { if (from(j) > into(j)) into(j) = from(j); j += 1 }
    into
  }

  /** Shared by interpreted eval and generated code (bucket-order fold —
    * the order the oracle's list_reduce replicates). */
  def estimate(regs: Array[Byte]): Long = {
    var sum = 0.0
    var zeros = 0
    var j = 0
    while (j < M) {
      val r = regs(j)
      sum += 1.0 / (1L << r)
      if (r == 0) zeros += 1
      j += 1
    }
    val alpha = 0.7213 / (1.0 + 1.079 / M)
    var e = alpha * M.toDouble * M.toDouble / sum
    if (e <= 2.5 * M && zeros > 0) e = M.toDouble * math.log(M.toDouble / zeros)
    math.round(e)
  }

  def agg(c: Column): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    GraftBridge.column(
      GraftHllAgg(GraftBridge.expression(spark, c)).toAggregateExpression())
  }

  def merge(c: Column): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    GraftBridge.column(
      GraftHllMerge(GraftBridge.expression(spark, c)).toAggregateExpression())
  }

  def estimateCol(c: Column): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    GraftBridge.column(GraftHllEstimate(GraftBridge.expression(spark, c)))
  }
}

/** Aggregate a column of values into an HLL register array (binary). */
case class GraftHllAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  // The value→string hash contract (hashOf) matches SQL CAST only for
  // integral and string keys; anything else (double/decimal/date/
  // timestamp) would render via String.valueOf and silently diverge
  // from the DuckDB oracle, so those keys fail at ANALYSIS time
  // (ADVICE r7). Cast a date/decimal key to string explicitly if its
  // rendered form is really the intended identity. (Direct
  // checkInputDataTypes override — TypeCollection is private[sql].)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | ByteType | ShortType | IntegerType | LongType =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_hll_agg supports string and integral keys, got ${dt.simpleString}; " +
        "cast the key to string if its rendered form is the intended identity")
  }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](GraftHll.M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) GraftHll.add(buf, GraftHll.hashOf(v))
    buf
  }

  override def merge(b: Array[Byte], o: Array[Byte]): Array[Byte] =
    GraftHll.mergeInto(b, o)

  override def eval(b: Array[Byte]): Any = b
  override def serialize(b: Array[Byte]): Array[Byte] = b
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_hll_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): GraftHllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GraftHllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): GraftHllAgg =
    copy(child = newChild)
}

/** Re-aggregate stored register arrays: element-wise max — exact over
  * unions of the inputs that built them (rollup routing + incremental
  * fold both rely on exactly this). */
case class GraftHllMerge(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression]
    with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)
  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](GraftHll.M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) GraftHll.mergeInto(buf, v.asInstanceOf[Array[Byte]])
    buf
  }

  override def merge(b: Array[Byte], o: Array[Byte]): Array[Byte] =
    GraftHll.mergeInto(b, o)

  override def eval(b: Array[Byte]): Any = b
  override def serialize(b: Array[Byte]): Array[Byte] = b
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_hll_merge"

  override def withNewMutableAggBufferOffset(newOffset: Int): GraftHllMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GraftHllMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): GraftHllMerge =
    copy(child = newChild)
}

/** Scalar: register array → cardinality estimate (long). */
case class GraftHllEstimate(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_hll_estimate"

  override def nullSafeEval(input: Any): Any =
    GraftHll.estimate(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = GraftHll.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = $cls.estimate($input);")
  }

  override protected def withNewChildInternal(newChild: Expression): GraftHllEstimate =
    copy(child = newChild)
}
