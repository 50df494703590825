package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** DDSketch quantile sketch: the alpha relative-error guarantee against
  * exact quantiles, partitioning independence (the property KLL-style
  * rank sketches cannot give), and batch == streaming state equivalence. */
class DdSketchSpec extends SparkSpec {
  import spark.implicits._

  private val alpha = 0.01
  private val qs = Seq(0.5, 0.9, 0.99)

  /** Deterministic log-uniform-ish positive values over ~4 decades. */
  private def values(n: Int): Seq[Double] =
    (1 to n).map { i =>
      val u = ((i * 2654435761L) & 0xffffffffL).toDouble / 0xffffffffL.toDouble
      math.pow(10.0, 4.0 * u) / 10.0
    }

  private def exactQuantile(vs: Seq[Double], q: Double): Double = {
    val s = vs.sorted
    s(math.max(1, math.ceil(q * s.length).toInt) - 1)
  }

  test("alpha guarantee: estimates within 1% of exact quantiles on a 4-decade spread") {
    val vs = values(5000)
    val dd = udaf(new DdSketchAggregator(alpha, qs))
    val idx = vs.toDF("v").agg(dd(col("v"))).as[Seq[Int]].head()
    qs.zip(idx).foreach { case (q, i) =>
      val est = DdSketchAggregator.valueOf(alpha, i)
      val exact = exactQuantile(vs, q)
      assert(math.abs(est - exact) <= alpha * exact * 1.0000001,
        s"q=$q est=$est exact=$exact rel=${math.abs(est - exact) / exact}")
    }
  }

  test("partitioning independence: identical buckets for any repartitioning") {
    val vs = values(2000)
    val dd = udaf(new DdSketchAggregator(alpha, qs))
    def run(parts: Int): Seq[Int] =
      vs.toDF("v").repartition(parts).agg(dd(col("v"))).as[Seq[Int]].head()
    assert(run(1) === run(7))
    assert(run(7) === run(32))
  }

  test("non-positive values occupy the zero class below every bucket") {
    val dd = udaf(new DdSketchAggregator(alpha, Seq(0.25, 0.75)))
    val idx = Seq(-1.0, 0.0, 5.0, 6.0).toDF("v").agg(dd(col("v"))).as[Seq[Int]].head()
    assert(idx.head === Int.MinValue) // rank 1 of 4 lands in the zero class
    assert(DdSketchAggregator.valueOf(alpha, idx.head) === 0.0)
    assert(idx(1) !== Int.MinValue)   // rank 3 is a real positive bucket
  }

  test("keeps partial (map-side) aggregation: sketch merges cross the shuffle, not rows") {
    val dd = udaf(new DdSketchAggregator(alpha, qs))
    val q = values(500).toDF("v").withColumn("g", col("v") > 1.0)
      .groupBy("g").agg(dd(col("v")))
    val plan = q.queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(plan).length >= 2,
      s"no partial+final aggregate:\n${plan.take(500)}")
  }

  test("streaming state: complete-mode aggregate equals the batch sketch") {
    val dd = udaf(new DdSketchAggregator(alpha, qs))
    val vs = values(600)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Double]
    val q = input.toDF().toDF("v")
      .agg(dd(col("v")).as("bk"))
      .writeStream.outputMode("complete").format("memory").queryName("dd_out")
      .start()
    val (a, b) = vs.splitAt(200)
    input.addData(a: _*); q.processAllAvailable()
    input.addData(b: _*); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("dd_out").as[Seq[Int]].head()
    val batch = vs.toDF("v").agg(dd(col("v"))).as[Seq[Int]].head()
    assert(streamed === batch)
  }
}
