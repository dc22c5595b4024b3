package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Document fingerprinting via Rabin-Karp rolling hash + winnowing
  * (Schleimer/Wilkerson/Aiken's MOSS algorithm, a public classic):
  *
  *  1. hash every k-gram of the text with a polynomial rolling hash
  *     (O(1) per shift: h' = (h - c_out·B^(k-1))·B + c_in);
  *  2. slide a window of `w` consecutive k-gram hashes and keep each
  *     window's minimum (rightmost on ties) — the winnowed fingerprint
  *     set, guaranteeing any match of length ≥ w+k-1 shares a print.
  *
  * Emitted as a sorted distinct `array<long>` per document; documents
  * sharing prints are near-dup candidates (same bucket-join shape as
  * minhash). Native expression with doGenCode: per-char interpreted
  * HOFs would be quadratic-ish and interpreter-bound.
  */
// saltState deliberately has NO default: the case-class apply would
// otherwise clash with the defaulted Column apply overloads below
case class WinnowingFingerprints(child: Expression, k: Int, window: Int,
    saltState: Long)
    extends UnaryExpression with ExpectsInputTypes {

  require(k >= 2 && window >= 1)

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "winnowing_fingerprints"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    new GenericArrayData(WinnowingFingerprints.compute(bytes, k, window, saltState))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = WinnowingFingerprints.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, input => {
      s"""
         |${ev.value} = new ${classOf[GenericArrayData].getName}(
         |  $cls.compute($input.getBytes(), $k, $window, ${saltState}L));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowingFingerprints =
    copy(child = newChild)
}

object WinnowingFingerprints {

  private val B = 1000000007L
  private val Mask = (1L << 61) - 1 // work mod 2^61-1-ish via masking

  /** Rolling k-gram hashes + winnowing; shared by interpreted eval and
    * generated code (the kernel is branchy enough that a single JIT'd
    * static method beats inlined codegen anyway). */
  def compute(bytes: Array[Byte], k: Int, window: Int): Array[Long] =
    compute(bytes, k, window, 0L)

  /** `saltState` (r9): the salted-fold contract — each salted gram hash
    * equals the Horner fold of the gram bytes STARTED from `saltState`,
    * i.e. hashing `salt + " " + gram` (the [[ShinglePolyHashes]]
    * contract, WinnowingFingerprintsSpec-asserted). The fold is affine
    * in its start state over Z/2^61 (wraparound multiplication is exact
    * there — the [[PolyHash61]] modulus argument), so
    * `fold(s0, gram) = s0·B^k + fold(0, gram)`: the rolling recurrence
    * stays UNSALTED and one constant add re-keys each gram. Salting
    * re-keys which grams win the window minima — exactly the point:
    * a closed-form collision/minima construction against the unseeded
    * hash needs the fold's start state, and a per-run secret denies it.
    * Recall is unaffected (identical gram bytes hash identically under
    * the same salt, and winnowing's shared-print guarantee holds for
    * ANY hash). 0 = the unsalted, oracle-able default. */
  def compute(bytes: Array[Byte], k: Int, window: Int, saltState: Long): Array[Long] = {
    val n = bytes.length
    if (n < k) return Array.empty[Long]
    val m = n - k + 1
    val grams = new Array[Long](m)
    // B^(k-1) within the mask domain
    var bk = 1L
    var i = 0
    while (i < k - 1) { bk = (bk * B) & Mask; i += 1 }
    // saltState·B^k — the constant that shifts fold(0, ·) to fold(s0, ·)
    val saltShift = if (saltState == 0L) 0L else (saltState * ((bk * B) & Mask)) & Mask
    var h = 0L
    i = 0
    while (i < k) { h = (h * B + (bytes(i) & 0xff)) & Mask; i += 1 }
    grams(0) = (h + saltShift) & Mask
    i = 1
    while (i < m) {
      h = ((h - ((bytes(i - 1) & 0xff) * bk & Mask) + (Mask + 1)) & Mask)
      h = (h * B + (bytes(i + k - 1) & 0xff)) & Mask
      grams(i) = (h + saltShift) & Mask
      i += 1
    }
    if (m <= window) {
      // document shorter than one window: keep the global min
      var min = grams(0); i = 1
      while (i < m) { if (grams(i) <= min) min = grams(i); i += 1 }
      return Array(min)
    }
    val out = new java.util.TreeSet[java.lang.Long]()
    var w = 0
    while (w <= m - window) {
      var min = grams(w)
      var idx = w
      var j = w + 1
      while (j < w + window) {
        if (grams(j) <= min) { min = grams(j); idx = j } // rightmost min
        j += 1
      }
      out.add(min)
      w += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var o = 0
    while (it.hasNext) { arr(o) = it.next(); o += 1 }
    arr
  }

  def apply(text: Column, k: Int = 8, window: Int = 16): Column =
    apply(text, k, window, 0L)

  def apply(text: Column, k: Int, window: Int, saltState: Long): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    GraftBridge.column(
      WinnowingFingerprints(GraftBridge.expression(spark, text), k, window, saltState))
  }
}
