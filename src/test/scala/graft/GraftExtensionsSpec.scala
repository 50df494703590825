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

  test("sketch UDAFs usable from SQL after registration") {
    GraftFunctions.register(spark)
    (Seq.fill(50)("hot") ++ (1 to 5).map(i => s"rare$i")).toDF("w")
      .createOrReplaceTempView("words")
    val cands = spark.sql("SELECT mg_candidates(w).keys AS ks FROM words")
      .as[Seq[String]].head()
    assert(cands.contains("hot"))
    (1L to 300L).toDF("id").createOrReplaceTempView("ids")
    val est = spark.sql(
      "SELECT kmv_sketch_hashed(pmod(id * 2654435761, 2147483647)) AS e FROM ids")
      .as[Double].head()
    assert(est > 150.0 && est < 600.0, s"KMV estimate off: $est")
  }
}
