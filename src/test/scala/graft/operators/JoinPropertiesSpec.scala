package graft.operators

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests: the scale-safe join formulations must agree with their
  * brute-force definitions on arbitrary inputs — the operator IS its
  * semantics, not its plan shape.
  */
class JoinPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val eventsGen: Gen[(List[(Long, Long)], List[(Long, Long, Double)])] = for {
    nl <- Gen.choose(0, 25)
    nr <- Gen.choose(0, 25)
    l <- Gen.listOfN(nl, for { k <- Gen.choose(0L, 3L); t <- Gen.choose(0L, 50L) } yield (k, t))
    r <- Gen.listOfN(nr, for {
      k <- Gen.choose(0L, 3L); t <- Gen.choose(0L, 50L); v <- Gen.choose(0, 999)
    } yield (k, t, v.toDouble))
  } yield (l, r.groupBy(x => (x._1, x._2)).values.map(_.head).toList) // unique (k,ts) right side

  test("property: asofJoin equals brute-force latest-prior lookup") {
    samples(eventsGen, 12).foreach { case (lRows, rRows) =>
      val left = lRows.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      val lDf = left.toDF("k", "ts", "lid")
      val rDf = rRows.toDF("k", "ts", "v")
      val got = Joins.asofJoin(lDf, rDf, Seq("k"), "ts", Seq("v"))
        .select("lid", "asof_v").as[(Long, Option[Double])].collect().toMap
      val expected = left.map { case (k, t, lid) =>
        val prior = rRows.filter(r => r._1 == k && r._2 <= t)
        lid -> (if (prior.isEmpty) None else Some(prior.maxBy(_._2)._3))
      }.toMap
      assert(got === expected, s"left=$left right=$rRows")
    }
  }

  private val intervalsGen: Gen[(List[Long], List[(Long, Long, Long)])] = for {
    np <- Gen.choose(0, 30)
    ni <- Gen.choose(0, 10)
    pts <- Gen.listOfN(np, Gen.choose(0L, 100L))
    ivs <- Gen.listOfN(ni, for {
      s <- Gen.choose(0L, 90L); len <- Gen.choose(1L, 40L)
    } yield (s, s + len))
  } yield (pts, ivs.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) })

  test("property: rangeJoinByBucket equals brute-force containment for any bucket width") {
    samples(intervalsGen, 12).foreach { case (pts, ivs) =>
      val pDf = pts.zipWithIndex.map { case (p, i) => (i.toLong, p) }.toDF("pid", "p")
      val iDf = ivs.toDF("iid", "s", "e")
      Seq(1L, 7L, 64L).foreach { width =>
        val got = Joins.rangeJoinByBucket(pDf, iDf, "p", "s", "e", width)
          .select("pid", "iid").as[(Long, Long)].collect().toSet
        val expected = (for {
          (pid, p) <- pts.zipWithIndex.map { case (p, i) => (i.toLong, p) }
          (iid, s, e) <- ivs if p >= s && p < e
        } yield (pid, iid)).toSet
        assert(got === expected, s"width=$width pts=$pts ivs=$ivs")
      }
    }
  }

  test("property: rangeJoinByBucket is exact beyond 2^53 (byte-offset domain)") {
    // Double-based bucketing loses the low bits of values past the 53-bit
    // significand: adjacent offsets map to the same double and endpoints
    // misbucket, silently dropping matches. The integer formulation must be
    // exact at the top of the long domain (and for negative offsets).
    Seq((1L << 60) + 12345L, -(1L << 60) - 12345L).foreach { base =>
      val gen: Gen[(List[Long], List[(Long, Long)])] = for {
        np <- Gen.choose(1, 30)
        ni <- Gen.choose(1, 10)
        pts <- Gen.listOfN(np, Gen.choose(-200L, 200L).map(base + _))
        ivs <- Gen.listOfN(ni, for {
          s <- Gen.choose(-180L, 150L); len <- Gen.choose(1L, 60L)
        } yield (base + s, base + s + len))
      } yield (pts, ivs)
      samples(gen, 8).foreach { case (pts, ivsRaw) =>
        val ivs = ivsRaw.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
        val pDf = pts.zipWithIndex.map { case (p, i) => (i.toLong, p) }.toDF("pid", "p")
        val iDf = ivs.toDF("iid", "s", "e")
        Seq(1L, 7L, 1L << 40).foreach { width =>
          val got = Joins.rangeJoinByBucket(pDf, iDf, "p", "s", "e", width)
            .select("pid", "iid").as[(Long, Long)].collect().toSet
          val expected = (for {
            (pid, p) <- pts.zipWithIndex.map { case (p, i) => (i.toLong, p) }
            (iid, s, e) <- ivs if p >= s && p < e
          } yield (pid, iid)).toSet
          assert(got === expected, s"base=$base width=$width pts=$pts ivs=$ivs")
        }
      }
    }
  }
}
