package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Table profiler: exact null accounting, HLL distincts inside the SE
  * envelope, null-only columns, and the one-scan plan shape. */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private def frame = (1L to 5000L).toDF("k")
    .select(col("k").as("id"),
      when(col("k") % 10 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("v"), (col("k") % 100).cast("string"))).as("cat"),
      lit(null).cast("string").as("empty"))

  test("per-column rows: exact nulls, near-exact small distincts, null-only column") {
    val out = Profile.profileTable(frame, Seq("cat", "empty", "id"))
      .as[(String, Long, Long, Double, Long, Long)].collect()
    assert(out.map(_._1).toSeq === Seq("cat", "empty", "id")) // ordered
    val byName = out.map(r => r._1 -> r).toMap
    assert(byName("cat")._2 === 5000L)
    assert(byName("cat")._3 === 500L)      // every 10th is null
    assert(math.abs(byName("cat")._4 - 100.0) <= 15.0) // linear-counting regime
    assert(byName("empty")._3 === 5000L)
    assert(byName("empty")._4 === 0.0)     // no non-null values -> 0 distinct
    assert(byName("id")._3 === 0L)
    val rel = math.abs(byName("id")._4 - 5000.0) / 5000.0
    assert(rel <= 3 * 1.04 / math.sqrt(1024.0), s"id est=${byName("id")._4}")
  }

  test("one scan, no joins: profiling k columns is a single aggregation pass") {
    val plan = Profile.profileTable(frame, Seq("cat", "empty", "id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    val scans = "LocalTableScan|Scan ExistingRDD|FileScan".r.findAllIn(plan).size
    assert(scans <= 1, s"expected a single source scan, got $scans:\n$plan")
  }

  test("column names that would break the generated stack()/SQL are rejected up front") {
    val evil = frame.withColumnRenamed("cat", "ca't")
    for (bad <- Seq("ca't", "c`at", "c,at", "c\"at")) {
      val renamed = frame.withColumnRenamed("cat", bad)
      val e = intercept[IllegalArgumentException] {
        Profile.profileTable(renamed, Seq(bad))
      }
      assert(e.getMessage.contains("rejected"), s"name $bad")
      intercept[IllegalArgumentException] { Profile.oracleSql("t", Seq(bad)) }
    }
    // a safe rename still profiles
    assert(Profile.profileTable(evil.withColumnRenamed("ca't", "cat_ok"),
      Seq("cat_ok")).count() === 1L)
  }

  test("nulls are not a distinct value: adding null rows never moves the sketch") {
    val base = Profile.profileTable(frame.filter(col("cat").isNotNull), Seq("cat"))
      .as[(String, Long, Long, Double, Long, Long)].head()
    val withNulls = Profile.profileTable(frame, Seq("cat"))
      .as[(String, Long, Long, Double, Long, Long)].head()
    assert(base._4 === withNulls._4)
    assert(base._5 === withNulls._5)
    assert(base._6 === withNulls._6)
  }
}
