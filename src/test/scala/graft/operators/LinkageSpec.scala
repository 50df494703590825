package graft.operators

import graft.SparkSpec

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private val parts = Seq(
    (1L, "small ring", "B1"),
    (2L, "small king", "B1"),   // dist 1 to #1
    (3L, "large bolt", "B1"),   // dist >2 to both
    (4L, "small ring", "B2"),   // same name as #1 but DIFFERENT block
    (5L, "smell ring", "B2"),   // dist 1 to #4
    (6L, "lonely gear", "B3")   // alone in its block
  ).toDF("id", "name", "brand")

  test("nearestNeighborWithinBlocks: min edit distance, block-scoped, singletons dropped") {
    val out = Linkage.nearestNeighborWithinBlocks(parts, "id", "name", Seq("brand"))
      .select("id_a", "nn_dist").as[(Long, Long)].collect().toMap
    assert(out === Map(
      1L -> 1L, 2L -> 1L,                   // ring ~ king
      3L -> 9L,                             // large bolt vs small ring/king
      4L -> 1L, 5L -> 1L))                  // blocked: #4 never sees #1
    // #6 has no neighbor in its block -> absent, not zero/null
  }

  test("fuzzyDupPairs: ordered pairs under the distance cap, never across blocks") {
    val out = Linkage.fuzzyDupPairs(parts, "id", "name", Seq("brand"), maxDist = 2)
      .select("id_a", "id_b", "dist").as[(Long, Long, Long)].collect().toSet
    assert(out === Set((1L, 2L, 1L), (4L, 5L, 1L)))
  }

  test("fuzzyDupPairs: identical names in one block pair at distance 0") {
    val dup = Seq((1L, "same", "B"), (2L, "same", "B")).toDF("id", "name", "brand")
    val out = Linkage.fuzzyDupPairs(dup, "id", "name", Seq("brand"), maxDist = 0)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq((1L, 2L, 0L)))
  }

  test("fuzzyDupPairs: length banding equals brute force, incl. band-boundary pairs") {
    // names engineered to straddle floor(len/maxDist) band boundaries:
    // lengths 3..13 with many cross-band near-pairs
    val rnd = new scala.util.Random(7)
    val names = (1 to 60).map { i =>
      val base = "abcdefghijklm".take(3 + rnd.nextInt(11))
      if (i % 3 == 0) base + "x" else if (i % 3 == 1) base.drop(1) else base
    }
    val df = names.zipWithIndex
      .map { case (n, i) => (i.toLong, n, s"B${i % 2}") }
      .toDF("id", "name", "brand")
    val banded = Linkage.fuzzyDupPairs(df, "id", "name", Seq("brand"), maxDist = 2,
      lengthBand = true)
      .as[(Long, Long, Long)].collect().toSet
    // brute force: plain block join, no banding
    val rows = names.zipWithIndex.map { case (n, i) => (i.toLong, n, s"B${i % 2}") }
    val brute = (for {
      (ia, na, ba) <- rows; (ib, nb, bb) <- rows
      if ba == bb && ia < ib
      d = {
        val m = Array.tabulate(na.length + 1, nb.length + 1) { (x, y) =>
          if (x == 0) y else if (y == 0) x else 0 }
        for (x <- 1 to na.length; y <- 1 to nb.length)
          m(x)(y) = math.min(math.min(m(x - 1)(y) + 1, m(x)(y - 1) + 1),
            m(x - 1)(y - 1) + (if (na(x - 1) == nb(y - 1)) 0 else 1))
        m(na.length)(nb.length)
      }
      if d <= 2
    } yield (ia, ib, d.toLong)).toSet
    assert(banded === brute)
  }

  test("salted pair join (default) equals the unsalted form exactly — " +
    "both operators, randomized blocks") {
    // 120 names over 3 blocks with many near-pairs: the salt must change
    // NOTHING about the pair set or the per-record minima (each unordered
    // pair matches exactly one b-replica).
    val rnd = new scala.util.Random(11)
    val df = (1 to 120).map { i =>
      val base = "qwertyuiopas".take(4 + rnd.nextInt(8))
      val name = if (i % 4 == 0) base + "z" else if (i % 4 == 1) base.drop(1)
        else base
      (i.toLong, name, s"B${i % 3}")
    }.toDF("id", "name", "brand")
    val pairsSalted = Linkage.fuzzyDupPairs(df, "id", "name", Seq("brand"),
      maxDist = 2).as[(Long, Long, Long)].collect().toSet
    val pairsPlain = Linkage.fuzzyDupPairs(df, "id", "name", Seq("brand"),
      maxDist = 2, saltBuckets = 1).as[(Long, Long, Long)].collect().toSet
    assert(pairsSalted === pairsPlain)
    val nnSalted = Linkage.nearestNeighborWithinBlocks(df, "id", "name",
      Seq("brand")).select("id_a", "nn_dist")
      .as[(Long, Long)].collect().toMap
    val nnPlain = Linkage.nearestNeighborWithinBlocks(df, "id", "name",
      Seq("brand"), saltBuckets = 1).select("id_a", "nn_dist")
      .as[(Long, Long)].collect().toMap
    assert(nnSalted === nnPlain)
  }

  test("one shared bandedPairDistances frame serves both operators: the " +
    "<=maxDist screen over a WIDER threshold equals the direct maxDist " +
    "computation, and the NN aggregate equals the direct form") {
    val rnd = new scala.util.Random(13)
    val df = (1 to 150).map { i =>
      val base = "zxcvbnmasdfg".take(4 + rnd.nextInt(8))
      val name = if (i % 5 == 0) base + "q" else if (i % 5 == 1) base.drop(1)
        else if (i % 5 == 2) base.reverse else base
      (i.toLong, name, s"B${i % 3}")
    }.toDF("id", "name", "brand")
    val shared = Linkage.bandedPairDistances(df, "id", "name", Seq("brand"),
      threshold = 3).localCheckpoint()
    assert(
      Linkage.fuzzyDupPairsFrom(shared, maxDist = 2)
        .as[(Long, Long, Long)].collect().toSet ===
        Linkage.fuzzyDupPairs(df, "id", "name", Seq("brand"), maxDist = 2)
          .as[(Long, Long, Long)].collect().toSet,
      "screen over the shared threshold-3 frame diverged from direct maxDist=2")
    assert(
      Linkage.nearestNeighborFromDistances(shared, df, "id", "name",
        Seq("brand")).select("id_a", "nn_dist")
        .as[(Long, Long)].collect().toMap ===
        Linkage.nearestNeighborWithinBlocks(df, "id", "name", Seq("brand"))
          .select("id_a", "nn_dist").as[(Long, Long)].collect().toMap,
      "NN aggregate over the shared frame diverged from the direct form")
  }
}
