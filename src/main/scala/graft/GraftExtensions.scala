package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.FloatArrayDot

/** Session extension registering graft's native expressions for SQL use.
  *
  * Deployment: `--conf spark.sql.extensions=graft.GraftExtensions`, after
  * which `SELECT float_array_dot(a, b)` parses anywhere SQL does. For an
  * already-running session (notebooks, tests), [[GraftFunctions.register]]
  * installs the same functions into the session's registry.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectFunction(GraftFunctions.floatArrayDot)
  }
}

object GraftFunctions {

  private[graft] val floatArrayDot = (
    FunctionIdentifier("float_array_dot"),
    new ExpressionInfo(
      classOf[FloatArrayDot].getCanonicalName,
      null,
      "float_array_dot",
      "_FUNC_(a, b) - dot product of two array<float> columns in double " +
        "(native codegen loop; left-to-right accumulation)",
      ""),
    (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
      FloatArrayDot(exprs(0), exprs(1)))

  /** Register graft SQL functions on a live session. Alongside the native
    * expression, the mergeable sketch aggregators are exposed as SQL UDAFs
    * at a fixed default capacity (SQL has no type-level parameters;
    * Scala callers size them per call site via `functions.udaf`). */
  def register(spark: SparkSession): Unit = {
    val (ident, info, builder) = floatArrayDot
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    spark.udf.register("mg_candidates",
      org.apache.spark.sql.functions.udaf(new graft.functions.MisraGriesAggregator(256)))
    // HASHED-INPUT-ONLY, and named to say so: the KMV estimator assumes
    // uniform hashes in [0, 2^31) — over raw values (sequential ids, say)
    // the estimate is garbage. SQL callers pass
    // pmod(key * 2654435761, 2147483647) (= Sketches.knuthHash).
    spark.udf.register("kmv_sketch_hashed",
      org.apache.spark.sql.functions.udaf(new graft.functions.KmvAggregator(256)))
  }
}
