package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Per-row w-shingle base hashes for the minhash pipeline, in one JIT'd
  * loop: for each window of `w` consecutive tokens, the PolyHash61 fold
  * of the space-joined shingle string — WITHOUT ever building that
  * string. The polynomial hash of a concatenation is the continued
  * fold over the parts' bytes with the 0x20 separator byte folded in
  * between, so each shingle hash streams straight from the token bytes.
  * The result is folded into the signature family's 2^31-1 field
  * (`pmod`), exactly like [[graft.ops.MinHashLSH.baseHashes]].
  *
  * Why it exists (r7 profiling): the HOF chain
  * `transform(sequence(...), concat_ws(...))` → `array_distinct` →
  * `transform(_, pmod(PolyHash61(_), p))` runs interpreted per element
  * — ~2.5M lambda invocations and string allocations per 5000-doc
  * evaluation, measured ~8s of q_dedup_minhash's 10.5s at sf0.1. This
  * expression replaces all of it inside whole-stage codegen.
  *
  * Contract differences vs the HOF chain, both harmless to every
  * consumer: duplicates are KEPT (array_distinct'ing changes nothing
  * downstream — the k-min signature takes a MIN per hash family, which
  * is duplicate-insensitive) and the vacuous `length > 0` filter is
  * dropped (a w≥2 shingle always contains separators). Equivalence
  * min-signature-wise is asserted in ShinglePolyHashesSpec; the DuckDB
  * oracle (ExtQueries.minhashPairsCtes) is untouched because it
  * derives the same signatures from the same distinct shingle set.
  *
  * `saltState` (r8, the adversarial-corpus mitigation made code —
  * VERDICT r7 residual #1): a non-zero initial Horner state folds a
  * per-run secret PREFIX into every shingle hash. Because the
  * polynomial hash of a concatenation is the continued fold,
  * `compute(toks, w, PolyHash61.compute((salt+" ").getBytes))` equals
  * hashing the string `salt + " " + shingle` — asserted against that
  * exact HOF form in ShinglePolyHashesSpec. Collision construction
  * against PolyHash61 needs the fold's start state; a secret salt
  * denies it. saltState = 0 is the unsalted (oracle-able) contract.
  */
case class ShinglePolyHashes(child: Expression, w: Int, saltState: Long = 0L)
    extends UnaryExpression with ExpectsInputTypes {

  require(w >= 2, "shingle width must be >= 2")

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "shingle_poly_hashes"

  override def nullSafeEval(input: Any): Any =
    ShinglePolyHashes.compute(input.asInstanceOf[ArrayData], w, saltState)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = ShinglePolyHashes.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = $cls.compute($input, $w, ${saltState}L);")
  }

  override protected def withNewChildInternal(newChild: Expression): ShinglePolyHashes =
    copy(child = newChild)
}

object ShinglePolyHashes {

  private val B = PolyHash61.B
  private val Mask = PolyHash61.Modulus - 1
  private val Prime = 2147483647L // the signature family's field

  /** Shared by interpreted eval and generated code. */
  def compute(toks: ArrayData, w: Int, saltState: Long = 0L): GenericArrayData = {
    val n = toks.numElements()
    if (n < w) return new GenericArrayData(Array.emptyLongArray)
    // token bytes fetched once each, not once per covering shingle
    val bytes = new Array[Array[Byte]](n)
    var t = 0
    while (t < n) { bytes(t) = toks.getUTF8String(t).getBytes; t += 1 }
    val out = new Array[Long](n - w + 1)
    var i = 0
    while (i <= n - w) {
      var h = saltState
      var j = 0
      while (j < w) {
        if (j > 0) h = (h * B + 0x20L) & Mask // the concat_ws " " byte
        val b = bytes(i + j)
        var bi = 0
        while (bi < b.length) {
          h = (h * B + (b(bi) & 0xff)) & Mask
          bi += 1
        }
        j += 1
      }
      out(i) = h % Prime // pmod: h is non-negative
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(toks: Column, w: Int): Column = apply(toks, w, 0L)

  def apply(toks: Column, w: Int, saltState: Long): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    GraftBridge.column(ShinglePolyHashes(GraftBridge.expression(spark, toks), w, saltState))
  }
}
