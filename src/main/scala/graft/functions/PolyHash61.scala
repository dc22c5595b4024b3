package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Engine-owned 61-bit polynomial string hash:
  * `h = fold(bytes, 0, (h, b) -> (h·B + b) mod 2^61)` with
  * B = 1000000007 — the same base/modulus family as
  * [[WinnowingFingerprints]], chosen because a power-of-two modulus
  * makes Java's wraparound multiplication exact (`2^61 | 2^64`, so
  * `(h*B) & Mask == (h*B) mod 2^61` even when the 64-bit product
  * overflows) and because DuckDB can recompute it exactly with a
  * HUGEINT `list_reduce` fold — which is what lets every consumer
  * (MinHash base hashes, LSH band buckets) be fully hash-oracled
  * instead of rows-only (xxhash64, the previous base hash, has no
  * DuckDB equivalent; VERDICT r5 ask #3).
  *
  * Not a cryptographic hash and ~2× slower than xxhash64's
  * multiply-rotate core, but the hot paths consume it over short
  * strings (shingles, bucket keys) where the cost is noise next to
  * the surrounding shuffle — and cross-engine verifiability is worth
  * far more here than nanoseconds.
  */
case class PolyHash61(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "poly_hash61"

  override def nullSafeEval(input: Any): Any =
    PolyHash61.compute(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = PolyHash61.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = $cls.compute($input.getBytes());")
  }

  override protected def withNewChildInternal(newChild: Expression): PolyHash61 =
    copy(child = newChild)
}

object PolyHash61 {

  val B = 1000000007L
  val Modulus = 1L << 61
  private val Mask = Modulus - 1

  /** Shared by interpreted eval and generated code. */
  def compute(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * B + (bytes(i) & 0xff)) & Mask
      i += 1
    }
    h
  }

  def apply(text: Column): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    GraftBridge.column(PolyHash61(GraftBridge.expression(spark, text)))
  }
}
