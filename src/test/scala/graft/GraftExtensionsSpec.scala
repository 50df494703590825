package graft

import org.apache.spark.sql.functions._

/** SQL-surface registration of native expressions. */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("float_array_dot usable from SQL after registration") {
    GraftFunctions.register(spark)
    Seq((Array(1f, 2f, 3f), Array(4f, 5f, 6f))).toDF("a", "b")
      .createOrReplaceTempView("vecs")
    val got = spark.sql("SELECT float_array_dot(a, b) AS d FROM vecs")
      .as[Double].head()
    assert(got === 32.0)
    // registration is idempotent:
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT float_array_dot(a, a) FROM vecs").as[Double].head() === 14.0)
  }
}
