package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Co-located joins via bucketing — the zero-shuffle join path for the
  * repeated big-big joins a 100 TB warehouse runs daily (orders x lineitem
  * shapes). Writing both sides bucketed by the join key means every
  * subsequent join on that key is Exchange-free: the shuffle is paid ONCE at
  * write time, then amortized over every downstream query.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of two tables bucketed on the key plans with no shuffle exchange") {
    // warehouse.dir is a static conf on a shared session; an explicit
    // LOCATION isolates this suite's tables in a temp dir instead.
    val wh = Files.createTempDirectory("graft_bucket_wh").toString
    val db = s"bdb_${System.nanoTime()}"
    spark.sql(s"CREATE DATABASE $db LOCATION '$wh/$db'")
    // sf0.001 fits under the broadcast threshold; force the shuffled-join
    // planner path so the assertion exercises what bucketing buys at scale
    // (where neither side broadcasts).
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val dir = "/root/testdata/sf0.001"
      spark.read.parquet(s"$dir/orders.parquet")
        .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(s"$db.orders_b")
      spark.read.parquet(s"$dir/lineitem.parquet")
        .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(s"$db.lineitem_b")

      val joined = spark.table(s"$db.lineitem_b")
        .join(spark.table(s"$db.orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey")
        .agg(sum(col("l_quantity")).as("qty"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString

      // The join itself must not shuffle either side: bucket layout IS the
      // required distribution. (The groupBy on the same key is free too.)
      val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(shuffles === 0, s"expected shuffle-free bucketed join, got:\n${plan.take(900)}")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a bucket-aligned join:\n${plan.take(400)}")

      // And the result is the same as the shuffled plain-parquet join:
      val plain = spark.read.parquet(s"$dir/lineitem.parquet")
        .join(spark.read.parquet(s"$dir/orders.parquet"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey")
        .agg(sum(col("l_quantity")).as("qty"))
      assert(joined.orderBy("o_orderkey").as[(Long, Double)].collect().toSeq ===
        plain.orderBy("o_orderkey").as[(Long, Double)].collect().toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    }
  }
}
