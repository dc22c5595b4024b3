package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Nearest-centroid assignment of a float vector against a k×dim
  * double centroid tensor shipped as a literal: returns
  * `struct(cluster int, d2 double)` — the argmin cluster index
  * (0-based; strict `<` comparison keeps the LOWEST index on exact
  * distance ties) and its squared-L2 distance.
  *
  * The hot kernel of every Lloyd iteration (and of any fixed-centroid
  * cell assignment): one fused primitive loop over k·dim instead of k
  * interpreted `aggregate(zip_with(...))` folds (ArrayDotProduct's
  * motivation; the HOF formulation stays in [[graft.ops.KMeans
  * .assignHof]] as the executable semantic spec, asserted equal in
  * KMeansSpec). Distance arithmetic is the exact left-to-right fold of
  * `(v_i − c_i)²` with each float widened to double BEFORE the
  * subtract — bit-identical to the DuckDB oracle's `list_reduce` over
  * the same doubles, so assignments (and their ties) are
  * cross-engine-reproducible. Null element or length mismatch → null
  * (zip_with's null-poisoned-fold semantics).
  */
case class CentroidAssign(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("cluster", IntegerType, nullable = false),
    StructField("d2", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "centroid_assign"

  override protected def nullSafeEval(v: Any): Any =
    CentroidAssign.compute(v.asInstanceOf[ArrayData], centroids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = CentroidAssign.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val tensor = ctx.addReferenceObj("centroids", centroids,
      "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val boxed = ctx.freshName("assignResult")
      s"""
         |org.apache.spark.sql.catalyst.InternalRow $boxed = $cls.compute($v, $tensor);
         |if ($boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $boxed;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidAssign =
    copy(child = newChild)
}

object CentroidAssign {

  /** Shared by interpreted eval and generated code. Returns null on a
    * dim mismatch or null element — a malformed vector must not be
    * silently assigned to an arbitrary cluster. */
  def compute(v: ArrayData, cs: Array[Array[Double]]): InternalRow = {
    val dim = v.numElements()
    var best = -1
    var bestD = 0.0
    var c = 0
    while (c < cs.length) {
      val cent = cs(c)
      if (cent.length != dim) return null
      var d = 0.0
      var i = 0
      while (i < dim) {
        if (v.isNullAt(i)) return null
        val t = v.getFloat(i).toDouble - cent(i)
        d += t * t
        i += 1
      }
      if (best < 0 || d < bestD) { best = c; bestD = d }
      c += 1
    }
    if (best < 0) null
    else InternalRow(best, bestD)
  }

  def apply(vec: Column, centroids: Array[Array[Double]]): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    GraftBridge.column(CentroidAssign(
      GraftBridge.expression(spark, vec), centroids))
  }
}
