package graft
object TmpOne {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").appName("one")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    val name = args(0)
    SparkEntry.queries(name)(spark, "/root/testdata/sf0.01")
      .write.mode("overwrite").parquet(s"/tmp/one_out/$name")
    val sqlMap = SparkEntry.oracleSql
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/one_out/sql.txt"),
      sqlMap(name).getBytes("UTF-8"))
    spark.stop()
  }
}
