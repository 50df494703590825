package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** FloatArrayDot: native codegen'd dot product — parity with the built-in
  * element_at chain, null handling, and both eval paths. */
class ArrayDotSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, Array(1f, 2f, 3f), Array(4f, 5f, 6f)),
    (2L, Array(0.1f, -0.2f, 0.3f), Array(-0.4f, 0.5f, 0.6f))
  ).toDF("id", "a", "b")

  test("matches the explicit CAST chain bit-for-bit (same accumulation order)") {
    val chain = expr((0 until 3)
      .map(i => s"CAST(a[$i] AS DOUBLE) * CAST(b[$i] AS DOUBLE)").mkString(" + "))
    val got = df.select(
      ArrayDot.floatDot(col("a"), col("b")).as("native"), chain.as("chain"))
      .as[(Double, Double)].collect()
    got.foreach { case (n, c) =>
      assert(java.lang.Double.doubleToLongBits(n) === java.lang.Double.doubleToLongBits(c))
    }
    assert(got.head._1 === (4.0 + 10.0 + 18.0))
  }

  test("null array yields null; interpreted eval agrees with codegen") {
    val withNull = Seq((1L, Array(1f, 2f), null.asInstanceOf[Array[Float]]))
      .toDF("id", "a", "b")
    val r = withNull.select(ArrayDot.floatDot(col("a"), col("b"))).head()
    assert(r.isNullAt(0))
    // interpreted path (nullSafeEval) via filter pushing expression off codegen:
    val interpreted = FloatArrayDot(
      org.apache.spark.sql.GraftExpressionBridge.toExpression(col("a")),
      org.apache.spark.sql.GraftExpressionBridge.toExpression(col("b")))
    val x = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(1f, 2f, 3f))
    val y = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(4f, 5f, 6f))
    assert(interpreted.nullSafeEval(x, y) === 32.0)
  }

  test("type check rejects non-float arrays") {
    val bad = Seq((1L, Array(1.0, 2.0), Array(3.0, 4.0))).toDF("id", "a", "b")
    val e = intercept[Exception] {
      bad.select(ArrayDot.floatDot(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("float"))
  }
}
