package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native Catalyst expression: all L hyperplane-LSH bucket keys of an
  * `array<float>` vector in one pass.
  *
  * bucket[t] = Σ_b (sign(Σ_d v[d] · planes[t][b][d]) << b)
  *
  * Replaces per-(table,bit) interpreted `aggregate(zip_with(...))`
  * folds (L·bits separate array traversals with boxing) with one flat
  * primitive loop in whole-stage codegen. Planes are trained/derived
  * driver-side and shipped via addReferenceObj as a flattened
  * `[t*bits*dim + b*dim + d]` double array.
  */
case class HyperplaneBuckets(
    child: Expression,
    planesFlat: Array[Double],
    tables: Int,
    bits: Int,
    dim: Int) extends UnaryExpression {

  require(planesFlat.length == tables * bits * dim)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "hyperplane_buckets"

  override def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val n = math.min(vec.numElements(), dim)
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var b = 0
      while (b < bits) {
        val base = (t * bits + b) * dim
        var proj = 0.0
        var d = 0
        while (d < n) { proj += vec.getFloat(d) * planesFlat(base + d); d += 1 }
        if (proj > 0) bucket |= (1L << b)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planes = ctx.addReferenceObj("planesFlat", planesFlat, "double[]")
    val out = ctx.freshName("out")
    val t = ctx.freshName("t")
    val b = ctx.freshName("b")
    val d = ctx.freshName("d")
    val n = ctx.freshName("n")
    val base = ctx.freshName("base")
    val proj = ctx.freshName("proj")
    val bucket = ctx.freshName("bucket")
    nullSafeCodeGen(ctx, ev, input => {
      s"""
         |int $n = java.lang.Math.min($input.numElements(), $dim);
         |long[] $out = new long[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $bucket = 0L;
         |  for (int $b = 0; $b < $bits; $b++) {
         |    int $base = ($t * $bits + $b) * $dim;
         |    double $proj = 0.0;
         |    for (int $d = 0; $d < $n; $d++) {
         |      $proj += $input.getFloat($d) * $planes[$base + $d];
         |    }
         |    if ($proj > 0) $bucket |= (1L << $b);
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} = new ${classOf[GenericArrayData].getName}($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
}

object HyperplaneBuckets {
  def apply(vec: Column, planes: Array[Array[Array[Double]]]): Column = {
    val tables = planes.length
    val bits = planes.head.length
    val dim = planes.head.head.length
    val flat = planes.flatten.flatten
    val spark = org.apache.spark.sql.SparkSession.active
    GraftBridge.column(
      HyperplaneBuckets(GraftBridge.expression(spark, vec), flat, tables, bits, dim))
  }
}
