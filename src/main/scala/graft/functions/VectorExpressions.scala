package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** `dot_product_long(a, b)`: exact integer dot product of two
  * `array<bigint>` columns as one whole-stage-codegen'd loop.
  *
  * Replaces the `aggregate(zip_with(a, b, ...), ...)` composition in the
  * ANN hot path: zip_with materializes an intermediate array per row and
  * aggregate walks it with per-element lambda dispatch; this expression is
  * a single fused loop over the two unsafe array buffers — no allocation,
  * stays inside WholeStageCodegen. Mismatched lengths use the common
  * prefix; a null array yields null (standard null-intolerant semantics).
  */
case class DotProductLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "dot_product_long"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductLong =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Column-API entry point. */
  def dot_product_long(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductLong(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Expose to SQL: `SELECT dot_product_long(a, b)`. */
  def register(spark: SparkSession): Unit =
    ColumnBridge.registerFunction(spark, "dot_product_long",
      exprs => DotProductLong(exprs.head, exprs(1)))
}
