package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Morton interleave, bit by bit. */
  private def zRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("zValue matches the bit-by-bit reference on corners and seeded random points") {
    val rnd = new scala.util.Random(42)
    val pts = Seq((0L, 0L), (255L, 255L), (255L, 0L), (0L, 255L), (5L, 3L), (170L, 85L)) ++
      Seq.fill(200)((rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
    val got = pts.toDF("x", "y")
      .select($"x", $"y", Layout.zValue($"x", $"y", 8).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z === zRef(x, y, 8), s"($x, $y)") }
    // (5, 3): x bits 101 at even positions, y bits 011 at odd = 27
    assert(zRef(5L, 3L, 8) === 27L)
  }

  test("zValue covers the full grid bijectively (16x16, 4 bits)") {
    val all = (for { x <- 0 until 16; y <- 0 until 16 } yield (x.toLong, y.toLong))
      .toDF("x", "y")
      .select(Layout.zValue($"x", $"y", 4).as("z")).as[Long].collect()
    assert(all.toSet === (0L until 256L).toSet)
  }

  test("zBucket tiles the Z-range contiguously: bucket i's max < bucket i+1's min") {
    val ranges = (0L until 4096L).toDF("z")
      .select($"z", Layout.zBucket($"z", bits = 6, buckets = 16).as("b"))
      .groupBy("b").agg(min("z").as("lo"), max("z").as("hi"))
      .orderBy("b").as[(Long, Long, Long)].collect()
    assert(ranges.map(_._1).toSeq === (0L until 16L).toSeq)
    ranges.sliding(2).foreach {
      case Array((_, _, hi), (_, lo, _)) => assert(hi < lo)
      case _ =>
    }
    // every bucket holds the same aligned tile size
    assert(ranges.forall { case (_, lo, hi) => hi - lo + 1 == 256 })
  }

  test("zorderRepartition produces disjoint per-partition Z-ranges, sorted within") {
    val rnd = new scala.util.Random(7)
    val df = Seq.fill(2000)((rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
      .toDF("x", "y")
    val laid = Layout.zorderRepartition(df, "x", "y", bits = 8, numPartitions = 8)
    // recompute z (deterministic) and check each partition owns one z-range
    val parts = laid
      .withColumn("z", Layout.zValue($"x", $"y", 8))
      .withColumn("pid", spark_partition_id())
      .groupBy("pid").agg(min("z").as("lo"), max("z").as("hi"))
      .orderBy("lo").as[(Int, Long, Long)].collect()
    assert(parts.length > 1, "range repartition produced a single partition")
    parts.sliding(2).foreach {
      case Array((_, _, hi), (_, lo, _)) => assert(hi <= lo,
        s"overlapping z-ranges across partitions: $hi vs $lo")
      case _ =>
    }
  }
}
