package graft.functions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Dot product of two float-array columns as a native codegen'd Catalyst
  * expression — the custom-Expression case SURVEY.md §7.4 anticipates: the
  * built-in way to express it (a 64-term `element_at` chain or
  * `aggregate(zip_with(...))`) pays per-element extraction/boxing overhead
  * on every pair of an O(N^2) similarity join; this compiles to a tight
  * primitive loop inside whole-stage codegen (~6x faster on the
  * embedding-dedup benchmark).
  *
  * Numeric contract: accumulates left-to-right in DOUBLE —
  * `acc += (double) a[i] * (double) b[i]` — exactly the association of the
  * generated SQL chain `CAST(a[1] AS DOUBLE)*CAST(b[1] AS DOUBLE) + ...`,
  * so results are bit-identical to the DuckDB oracle's.
  *
  * Null contract: null input array => null result (NullIntolerant shape);
  * arrays are assumed non-null-elemented and equal-length (embedding
  * columns) — iteration bounds by the shorter input defensively.
  */
case class FloatArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"float_array_dot requires array<float> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatArrayDot =
    copy(left = newLeft, right = newRight)
}

object ArrayDot {
  /** Column API: dot product of two array<float> columns in double. */
  def floatDot(a: Column, b: Column): Column =
    GraftExpressionBridge.toColumn(FloatArrayDot(
      GraftExpressionBridge.toExpression(a),
      GraftExpressionBridge.toExpression(b)))
}
