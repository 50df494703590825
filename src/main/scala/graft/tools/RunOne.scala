package graft.tools

import org.apache.spark.sql.SparkSession

/** Run one registered query against a data dir and report OK/ERR —
  * the minimal debugging runner for a single `SparkEntry.queries` entry
  * at any scale dir (BenchScale only accepts its HeavyQueries subset;
  * Verify only dumps at oracle scale).
  *
  * Usage: RunOne <dataDir> <queryName> [queryName ...]
  *
  * `GRAFT_SESSION_CONF` (optional): comma-separated key=value session
  * confs applied before any query runs — the hook for measuring a
  * conf-switched MODE of an existing query (e.g.
  * `graft.lm.positionalJoin=true`) without registering a twin.
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.ui.enabled", false)
      .config("spark.sql.legacy.parquet.nanosAsLong", true)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SessionConf.applyFromEnv(spark)
    var failed = false
    for (name <- args.drop(1)) {
      val t0 = System.nanoTime()
      try {
        graft.SparkEntry.queries(name)(spark, args(0))
          .queryExecution.toRdd.foreach(_ => ())
        println(s"OK $name ${(System.nanoTime() - t0) / 1e9}s")
      } catch {
        case e: Throwable =>
          failed = true
          println(s"ERR $name: ${Option(e.getMessage).getOrElse(e.getClass.getName).take(500)}")
      }
    }
    spark.stop()
    if (failed) sys.exit(1)
  }
}
