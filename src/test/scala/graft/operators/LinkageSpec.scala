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
}
