package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: 64-bit SimHash (Charikar) from an
  * `array<long>` of element hashes. Each input hash votes ±1 on each of
  * the 64 bits; the sign of the total becomes the output bit.
  *
  * Replaces an `aggregate(zip_with(...))` HOF fold that allocated a
  * 64-slot array per input element and ran interpreted; this is a flat
  * primitive loop inside whole-stage codegen (semantic spec asserted
  * equal in SimHash64Spec).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var j = 0
    while (j < hs.numElements()) {
      val h = hs.getLong(j)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val votes = ctx.freshName("votes")
    val h = ctx.freshName("h")
    val j = ctx.freshName("j")
    val b = ctx.freshName("b")
    val out = ctx.freshName("out")
    nullSafeCodeGen(ctx, ev, input => {
      s"""
         |int[] $votes = new int[64];
         |for (int $j = 0; $j < $input.numElements(); $j++) {
         |  long $h = $input.getLong($j);
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ((($h >>> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($votes[$b] > 0) $out |= (1L << $b);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  def apply(hashes: Column): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    GraftBridge.column(SimHash64(GraftBridge.expression(spark, hashes)))
  }
}
