package graft.functions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership probe as a native codegen'd Catalyst expression —
  * the "(b) custom Expression beats a Scala UDF" case: the probe runs once
  * per row on the 100 TB side of an incremental dedup, and a UDF there
  * forces a catalyst<->scala conversion wrapper and breaks whole-stage
  * codegen for the stage. The filter object ships with the plan via
  * `addReferenceObj` (a few KB — one copy per stage, not per row).
  *
  * Probe semantics match the builder exactly: Spark's
  * `DataFrameStatFunctions.bloomFilter` puts strings as UTF-8 bytes, and
  * `mightContainBinary(getBytes)` hashes the same bytes.
  */
case class BloomMightContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain requires a string input, got $other")
    }

  override def nullSafeEval(s: Any): Any =
    bloom.mightContainBinary(s.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContainBinary($c.getBytes());")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  /** Column API: true iff the string column's UTF-8 bytes may be in `bloom`. */
  def probe(c: Column, bloom: BloomFilter): Column =
    GraftExpressionBridge.toColumn(BloomMightContain(
      GraftExpressionBridge.toExpression(c), bloom))
}
