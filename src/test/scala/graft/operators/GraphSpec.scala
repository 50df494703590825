package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Specs for the power-iteration graph family (integer fixed-point
  * PageRank). Rank units are 1e-9 (BIGINT).
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private val Scale = 1000000000L

  test("pageRank: isolated vertices keep exactly the teleport + dangling share") {
    // two connected nodes + one isolated; the isolated node receives
    // teleport plus its 1/N share of its own dangling mass each round
    val edges = Seq(("a", "b", 1L), ("b", "a", 1L)).toDF("src", "dst", "w")
    val nodes = Seq("a", "b", "c").toDF("node")
    val r = Graph.pageRank(edges, "src", "dst", "w", nodes, "node", iterations = 1)
      .as[(String, Long)].collect().toMap
    val r0 = Scale / 3
    val teleport = Scale * 15 / 300
    // a and b each receive the other's full rank (single out-edge) + c's
    // dangling share; c receives only teleport + dangling share
    val dangShare = r0 / 3
    assert(r("c") === teleport + 85L * dangShare / 100)
    assert(r("a") === teleport + 85L * (r0 + dangShare) / 100)
    assert(r("a") === r("b"))
  }

  test("pageRank: symmetric graph converges to equal ranks; mass conserved ~Scale") {
    val edges = Seq(("a", "b", 2L), ("b", "a", 2L), ("b", "c", 2L),
      ("c", "b", 2L), ("c", "a", 2L), ("a", "c", 2L)).toDF("src", "dst", "w")
    val nodes = Seq("a", "b", "c").toDF("node")
    val r = Graph.pageRank(edges, "src", "dst", "w", nodes, "node", iterations = 5)
      .as[(String, Long)].collect().toMap
    assert(r.values.toSet.size === 1, r)       // full symmetry ⇒ equal ranks
    val total = r.values.sum
    assert(math.abs(total - Scale) < 1000L, s"mass drifted: $total") // floor drift only
  }

  test("pageRank: weight asymmetry steers rank toward the heavier target") {
    // b -> a carries 9x the weight of b -> c; a must outrank c
    val edges = Seq(("b", "a", 9L), ("b", "c", 1L),
      ("a", "b", 1L), ("c", "b", 1L)).toDF("src", "dst", "w")
    val nodes = Seq("a", "b", "c").toDF("node")
    val r = Graph.pageRank(edges, "src", "dst", "w", nodes, "node", iterations = 5)
      .as[(String, Long)].collect().toMap
    assert(r("a") > r("c"), r)
  }

  test("pageRank: result is partitioning-independent (exact longs)") {
    val edges = (1 to 40).map(i => (s"n${i % 7}", s"n${(i * 3) % 7}", (i % 5 + 1).toLong))
      .toDF("src", "dst", "w").filter(col("src") =!= col("dst"))
    val nodes = (0 until 7).map(i => s"n$i").toDF("node")
    val one = Graph.pageRank(edges.coalesce(1), "src", "dst", "w", nodes, "node", 3)
      .as[(String, Long)].collect().toMap
    val many = Graph.pageRank(edges.repartition(13), "src", "dst", "w", nodes, "node", 3)
      .as[(String, Long)].collect().toMap
    assert(one === many)
  }

  // ---- triangleCounts ----------------------------------------------------

  test("triangleCounts: K4 gives 3 per vertex; pendant vertex gives 0") {
    // complete graph on {1,2,3,4} (4 triangles, each vertex in 3) plus a
    // pendant vertex 5 attached to 1
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (1L, 5L)).toDF("id_a", "id_b")
    val got = Graph.triangleCounts(edges, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L, 5L -> 0L))
  }

  test("triangleCounts: a both-directions edge list counts the same as one-row-per-edge") {
    val one = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("id_a", "id_b")
    val both = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L), (2L, 3L), (3L, 2L))
      .toDF("id_a", "id_b")
    val g1 = Graph.triangleCounts(one, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    val g2 = Graph.triangleCounts(both, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(g1 === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    assert(g2 === g1)
  }

  test("pageRank: zero-weight edges drop; an all-zero-out node becomes dangling") {
    // b's only out-edge has weight 0 -> b is dangling; mass must conserve
    val edges = Seq(("a", "b", 1L), ("b", "a", 0L)).toDF("src", "dst", "w")
    val nodes = Seq("a", "b").toDF("node")
    val r = Graph.pageRank(edges, "src", "dst", "w", nodes, "node", iterations = 3)
      .as[(String, Long)].collect().toMap
    val total = r.values.sum
    assert(math.abs(total - Scale) < 1000L, s"mass leaked: $r")
    assert(r("b") > 0L)
  }

  test("triangleCounts: a star graph has zero triangles (hub never wedges)") {
    val edges = (2L to 30L).map(i => (1L, i)).toDF("id_a", "id_b")
    val got = Graph.triangleCounts(edges, "id_a", "id_b")
      .agg(sum("triangles")).as[Long].head()
    assert(got === 0L)
  }

  test("triangleCounts equals brute force on a random graph, any partitioning") {
    val rnd = new scala.util.Random(11)
    val es = (1 to 120).map(_ => (rnd.nextInt(15).toLong, rnd.nextInt(15).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val df = es.toDF("id_a", "id_b")
    val got = Graph.triangleCounts(df.repartition(7), "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    val adj = es.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).toSet }
    val brute = adj.map { case (v, ns) =>
      v -> ns.toSeq.combinations(2).count { case Seq(x, y) => adj(x).contains(y) }.toLong
    }
    assert(got === brute)
  }
}
