package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

  test("asofJoin: most recent prior right row per key, inclusive at equal ts") {
    val left = Seq(
      (1L, ts(5), "l1"),
      (1L, ts(10), "l2"),
      (1L, ts(2), "l0"), // before any right row -> null match
      (2L, ts(7), "l3")  // key with no right rows at all
    ).toDF("k", "ts", "tag")
    val right = Seq(
      (1L, ts(3), 30.0),
      (1L, ts(5), 50.0), // equal ts to l1 -> inclusive match
      (1L, ts(9), 90.0)
    ).toDF("k", "ts", "v")

    val out = Joins.asofJoin(left, right, Seq("k"), "ts", Seq("ts", "v"))
      .select("tag", "asof_v").as[(String, Option[Double])].collect().toMap

    assert(out("l0").isEmpty)
    assert(out("l1").contains(50.0))
    assert(out("l2").contains(90.0))
    assert(out("l3").isEmpty)
  }

  test("asofJoin: keeps left payload columns and attaches prefixed right columns") {
    val left = Seq((1L, ts(5), "a", 7)).toDF("k", "ts", "name", "extra")
    val right = Seq((1L, ts(1), 1.5)).toDF("k", "ts", "v")
    val out = Joins.asofJoin(left, right, Seq("k"), "ts", Seq("v"), prefix = "r_")
    assert(out.columns.toSet === Set("k", "ts", "name", "extra", "r_v"))
    assert(out.select("name", "extra", "r_v").as[(String, Int, Double)].collect()
      .toSeq === Seq(("a", 7, 1.5)))
  }

  test("asofJoin: payload-less left side (spine) works") {
    val spine = Seq((1L, ts(5)), (1L, ts(10))).toDF("k", "ts")
    val right = Seq((1L, ts(7), 7.0)).toDF("k", "ts", "v")
    val out = Joins.asofJoin(spine, right, Seq("k"), "ts", Seq("v"))
      .orderBy("ts").select("asof_v").as[Option[Double]].collect()
    assert(out.toSeq === Seq(None, Some(7.0)))
  }

  test("rangeJoinByBucket: containment semantics across bucket boundaries") {
    // bucketWidth 10; interval [5, 25) spans buckets 0..2
    val intervals = Seq((100L, 5L, 25L), (200L, 40L, 50L)).toDF("iv_id", "s", "e")
    val points = Seq(4L, 5L, 14L, 24L, 25L, 40L, 49L, 50L).toDF("p")
    val out = Joins.rangeJoinByBucket(points, intervals, "p", "s", "e", bucketWidth = 10L)
      .select("p", "iv_id").as[(Long, Long)].collect().toSet
    assert(out === Set((5L, 100L), (14L, 100L), (24L, 100L), (40L, 200L), (49L, 200L)))
  }

  test("saltedJoin: identical result set to the plain join, any salt count") {
    val big = (0L until 200L).map(i => (i, s"k${i % 3}", i * 1.5)).toDF("id", "key", "v")
    val small = Seq(("k0", "a"), ("k1", "b"), ("k2", "c"), ("k9", "unmatched"))
      .toDF("key", "tag")
    val plain = big.join(small, Seq("key")).select("id", "tag")
      .as[(Long, String)].collect().toSet
    Seq(1, 4, 16).foreach { salts =>
      val salted = Joins.saltedJoin(big, small, Seq("key"), salts)
        .select("id", "tag").as[(Long, String)].collect().toSet
      assert(salted === plain, s"salts=$salts")
    }
  }

  test("adaptiveSaltedJoin: identical to plain join whether keys are hot, cold, or mixed") {
    // k0 is hot (120 rows), k1/k2 light (40 each); k9 unmatched on big side.
    val big = (0L until 200L).map { i =>
      val k = if (i < 120) "k0" else s"k${1 + (i % 2)}"
      (i, k, i * 1.5)
    }.toDF("id", "key", "v")
    val small = Seq(("k0", "a"), ("k1", "b"), ("k2", "c"), ("k9", "unmatched"))
      .toDF("key", "tag")
    val plain = big.join(small, Seq("key")).select("id", "tag")
      .as[(Long, String)].collect().toSet
    // threshold 50: only k0 salted; threshold 1: everything salted;
    // threshold 10000: nothing salted (degenerates to a plain join)
    Seq(1L, 50L, 10000L).foreach { thr =>
      val got = Joins.adaptiveSaltedJoin(big, small, Seq("key"), salts = 8, hotThreshold = thr)
        .select("id", "tag").as[(Long, String)].collect().toSet
      assert(got === plain, s"hotThreshold=$thr")
    }
  }

  test("rangeJoinByBucket: empty intervals match nothing") {
    val intervals = Seq((1L, 10L, 10L), (2L, 10L, 11L)).toDF("iv_id", "s", "e")
    val points = Seq(10L).toDF("p")
    val out = Joins.rangeJoinByBucket(points, intervals, "p", "s", "e", bucketWidth = 4L)
      .select("iv_id").as[Long].collect().toSet
    assert(out === Set(2L))
  }

  test("rangeJoinByBucket: overlapping intervals emit one row per containing interval") {
    val intervals = Seq((1L, 0L, 20L), (2L, 10L, 30L)).toDF("iv_id", "s", "e")
    val points = Seq(15L).toDF("p")
    val out = Joins.rangeJoinByBucket(points, intervals, "p", "s", "e", bucketWidth = 8L)
      .select("iv_id").as[Long].collect().toSet
    assert(out === Set(1L, 2L))
  }

  test("bloomPrunedJoin: identical to the plain inner join, including duplicates") {
    // Keys on both sides that don't match (small has 1500; big lacks it),
    // plus a duplicated big-side key — multiplicities must survive pruning.
    val big = ((1 to 1000).map(i => (i.toLong, s"v$i")) :+ (500L, "v500b"))
      .toDF("k", "payload")
    val small = Seq((10L, "a"), (500L, "b"), (999L, "c"), (1500L, "d"))
      .toDF("sk", "name")
    val pruned = Joins.bloomPrunedJoin(big, small, "k", "sk",
      expectedItems = 10L, fpp = 0.01)
      .select("k", "payload", "name").as[(Long, String, String)].collect().sorted.toSeq
    val plain = big.join(small, $"k" === $"sk")
      .select("k", "payload", "name").as[(Long, String, String)].collect().sorted.toSeq
    assert(pruned === plain)
    assert(pruned.map(_._1) === Seq(10L, 500L, 500L, 999L))
  }

  test("bloomPrunedJoin: empty small side yields an empty (not failing) join") {
    val big = (1 to 50).map(i => (i.toLong, "x")).toDF("k", "payload")
    val small = Seq.empty[(Long, String)].toDF("sk", "name")
    assert(Joins.bloomPrunedJoin(big, small, "k", "sk", expectedItems = 10L)
      .count() === 0L)
  }

  test("skewReport: shares and salt factors match hand calc; topK caps") {
    // key a x6, b x2, c x1 (total 9); parts = 3 -> salt(a) = ceil(2) = 2
    val df = (Seq.fill(6)("a") ++ Seq.fill(2)("b") ++ Seq("c")).toDF("k")
    val got = Joins.skewReport(df, "k", topK = 2, parts = 3)
      .select("k", "cnt", "share", "salt_factor")
      .as[(String, Long, Double, Long)].collect().toSeq
    assert(got === Seq(
      ("a", 6L, 0.666667, 2L),
      ("b", 2L, 0.222222, 1L)))   // light key floors at salt 1; c cut by topK
  }
}
