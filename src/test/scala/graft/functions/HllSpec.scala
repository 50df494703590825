package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** HyperLogLog: accuracy within the 1.04/sqrt(m) standard-error envelope,
  * partitioning independence of the register state, linear-counting
  * behavior at small cardinality, and batch == streaming state. */
class HllSpec extends SparkSpec {
  import spark.implicits._

  private val hll = udaf(new HllAggregator(10)) // m = 1024, se ~ 3.25%

  private def estimate(keys: Seq[Long], parts: Int = 8): HllResult =
    keys.toDF("k").repartition(parts)
      .select(HllAggregator.md5Hash60(col("k")).as("hv"))
      .agg(hll(col("hv")).as("r"))
      .select("r.*").as[HllResult].head()

  test("estimate within 3 standard errors across cardinality decades") {
    for (n <- Seq(5000, 50000)) {
      val r = estimate((1L to n.toLong))
      val rel = math.abs(r.approx_distinct - n) / n.toDouble
      assert(rel <= 3 * 1.04 / math.sqrt(1024.0), s"n=$n est=${r.approx_distinct} rel=$rel")
    }
  }

  test("small cardinality takes the linear-counting branch and lands near-exact") {
    val r = estimate(1L to 150L)
    assert(r.zero_buckets > 0)
    assert(math.abs(r.approx_distinct - 150.0) <= 15.0, s"est=${r.approx_distinct}")
  }

  test("register state is identical under any repartitioning") {
    val keys = (1L to 20000L).map(k => k % 3000) // duplicates included
    val a = estimate(keys, parts = 1)
    val b = estimate(keys, parts = 7)
    val c = estimate(keys, parts = 32)
    assert(a === b)
    assert(b === c)
  }

  test("duplicates never move the estimate") {
    val once = estimate(1L to 2000L)
    val tenTimes = estimate(Seq.fill(10)(1L to 2000L).flatten)
    assert(once === tenTimes)
  }

  test("keeps partial (map-side) aggregation per group") {
    val q = (1L to 1000L).toDF("k")
      .withColumn("g", col("k") % 2)
      .select(col("g"), HllAggregator.md5Hash60(col("k")).as("hv"))
      .groupBy("g").agg(hll(col("hv")))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"))
    assert(q.count() === 2)
  }

  test("runs unchanged as streaming state (complete mode) and matches batch") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Long]
    val sdf = mem.toDF()
      .select(HllAggregator.md5Hash60(col("value")).as("hv"))
      .agg(hll(col("hv")).as("r")).select("r.*")
    val q = sdf.writeStream.format("memory").queryName("hll_stream")
      .outputMode("complete").start()
    try {
      mem.addData(1L to 3000L: _*)
      q.processAllAvailable()
      mem.addData(2000L to 5000L: _*)
      q.processAllAvailable()
      val streamed = spark.table("hll_stream").as[HllResult].head()
      val batch = estimate((1L to 3000L) ++ (2000L to 5000L))
      assert(streamed === batch)
    } finally q.stop()
  }
}
