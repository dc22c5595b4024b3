package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native left-to-right double dot product of two `array<float>`
  * columns — the hot kernel of every cosine verify stage (ANN brute
  * force, LSH/IVF candidate verify, embedding near-dup).
  *
  * Semantics are EXACTLY the HOF formulation it replaces
  * (`aggregate(zip_with(x, y, (p,q) => p.cast(double)*q.cast(double)),
  * 0.0, _+_)`, Similarity.dotHof) and therefore bit-identical to the
  * DuckDB oracle's `list_sum(list_transform(list_zip(...)))` fold:
  * each float is widened to double BEFORE the multiply, products are
  * added strictly left-to-right, a length mismatch or a null element
  * yields NULL (zip_with pads with nulls and null poisons the fold).
  * The HOF chain runs interpreted (ArrayAggregate/ZipWith have no
  * codegen) and allocates a zipped struct array per row — the r5 100×
  * sweep's jstack showed it as the single hottest kernel. This
  * expression does one fused primitive loop, shared by interpreted
  * eval and generated code.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "array_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    ArrayDotProduct.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = ArrayDotProduct.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("dotResult")
      s"""
         |Object $boxed = $cls.compute($a, $b);
         |if ($boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ((java.lang.Double) $boxed).doubleValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

object ArrayDotProduct {

  /** Shared by interpreted eval and generated code (one JIT'd method
    * beats inlined codegen for a branchy primitive loop — same pattern
    * as WinnowingFingerprints.compute). Returns null on length
    * mismatch or any null element, matching zip_with + null-poisoned
    * fold semantics. */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  def apply(x: Column, y: Column): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    GraftBridge.column(ArrayDotProduct(
      GraftBridge.expression(spark, x), GraftBridge.expression(spark, y)))
  }
}
