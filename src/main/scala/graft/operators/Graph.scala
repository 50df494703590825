package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics as keyed DataFrame joins — the power-iteration
  * family (PageRank here; the label-propagation variant lives in
  * `Dedup.clusterLabels`).
  *
  * Exactness: ranks are integer fixed-point (1e-9 units, BIGINT) and every
  * per-edge contribution is integral division `(w * r) div out_weight` —
  * addition of longs is order-independent, so the result is bit-identical
  * on any partitioning AND in the DuckDB oracle (`//`), unlike a floating
  * formulation whose per-target sums drift with reduction order.
  *
  * Scale notes (100 TB / billion-edge graphs): each round is one equi-join
  * of edges against the rank vector (shuffle on src, then dst) plus a
  * groupBy-sum — the standard edge-partitioned PageRank; no adjacency is
  * ever collected. Rounds localCheckpoint (lineage truncation — same
  * contract as clusterLabels; swap for reliable checkpoint() on a real
  * cluster). The dangling-mass term is a 1-row aggregate broadcast back,
  * not a driver round-trip per partition. Node count is the one driver
  * scalar (a single count()).
  */
object Graph {

  private val Scale = 1000000000L // 1e-9 rank units

  /** Weighted PageRank with uniform teleport and dangling-mass
    * redistribution, damping = dampNum/dampDen (default 85/100).
    *
    * `edges` must already contain every directed edge (callers union both
    * directions for an undirected graph); `nodes` fixes the vertex set so
    * isolated vertices keep teleport mass. Returns (node, rank_fp) with
    * rank_fp in 1e-9 units; sum(rank_fp) ≈ Scale up to integer-floor drift
    * (deterministic, identical in the oracle).
    */
  def pageRank(
      edges: DataFrame, srcCol: String, dstCol: String, weightCol: String,
      nodes: DataFrame, nodeCol: String, iterations: Int,
      dampNum: Int = 85, dampDen: Int = 100): DataFrame = {
    require(iterations >= 1 && dampNum >= 0 && dampNum <= dampDen)
    // weight contract: positive integral longs (pre-scale fractional
    // weights before calling). w <= 0 rows are dropped, and a node whose
    // edges ALL drop correctly becomes dangling — without the ow > 0
    // guard, Spark's `div ow` would NULL on zero and silently leak that
    // node's whole rank mass each round (the oracle's `//` raises).
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      col(weightCol).cast("long").as("w"))
      .filter(col("w") > 0).localCheckpoint()
    val outw = e.groupBy("src").agg(sum("w").as("ow")).localCheckpoint()
    val n = nodes.select(col(nodeCol).as("node")).distinct().localCheckpoint()
    val nCount = n.count()
    require(nCount > 0, "empty vertex set")
    val teleport = Scale * (dampDen - dampNum) / (dampDen.toLong * nCount)
    var r = n.select(col("node"), lit(Scale / nCount).as("r")).localCheckpoint()
    (1 to iterations).foreach { _ =>
      val dang = r
        .join(outw.select(col("src").as("node")), Seq("node"), "left_anti")
        .agg(coalesce(sum("r"), lit(0L)).as("ds"))
      val contrib = e
        .join(r.withColumnRenamed("node", "src"), "src")
        .join(outw, "src")
        .select(col("dst"), expr("(w * r) div ow").as("c"))
      val ins = contrib.groupBy("dst").agg(sum("c").as("s"))
      r = n
        .join(ins.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .crossJoin(broadcast(dang))
        .select(col("node"),
          (lit(teleport) +
            expr(s"($dampNum * (coalesce(s, CAST(0 AS BIGINT)) + " +
              s"(ds div $nCount))) div $dampDen")).as("r"))
        .localCheckpoint()
    }
    r.select(col("node"), col("r").as("rank_fp"))
  }

  /** Per-vertex triangle counts via degree-ordered orientation — the
    * standard bounded-skew distributed formulation: every undirected edge
    * is oriented from its lower to its higher endpoint by (degree, id), so
    * out-degrees are O(sqrt(m)) and the wedge self-join never explodes on
    * a hub vertex (a star graph yields ZERO wedges under orientation,
    * where the naive neighbor self-join is quadratic in the hub degree).
    * Each triangle is generated exactly once (its orientation-minimal
    * vertex is the wedge center), then credited to all three corners.
    * Three keyed shuffles: degree agg, wedge join, closing-edge join. */
  def triangleCounts(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    // canonicalize direction BEFORE distinct: an undirected edge supplied
    // as both (a,b) and (b,a) — pageRank's required input shape — must
    // collapse to one row, or every wedge/closing join double-counts
    val e = edges.select(
        least(col(aCol), col(bCol)).as("u"),
        greatest(col(aCol), col(bCol)).as("v"))
      .filter(col("u") =!= col("v")).distinct().localCheckpoint()
    val deg = e.select(col("u").as("x"))
      .unionByName(e.select(col("v").as("x")))
      .groupBy("x").agg(count(lit(1)).cast("long").as("d"))
    val withDeg = e
      .join(deg.select(col("x").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("x").as("v"), col("d").as("dv")), "v")
    val lt = struct(col("du"), col("u")) < struct(col("dv"), col("v"))
    val oe = withDeg.select(
      when(lt, col("u")).otherwise(col("v")).as("src"),
      when(lt, col("v")).otherwise(col("u")).as("dst"),
      when(lt, struct(col("dv").as("kd"), col("v").as("kv")))
        .otherwise(struct(col("du").as("kd"), col("u").as("kv"))).as("dkey"))
      .localCheckpoint()
    val w1 = oe.select(col("src"), col("dst").as("y"), col("dkey").as("ky"))
    val w2 = oe.select(col("src"), col("dst").as("z"), col("dkey").as("kz"))
    val tri = w1.join(w2, Seq("src")).filter(col("ky") < col("kz"))
      .join(oe.select(col("src").as("y"), col("dst").as("z")), Seq("y", "z"))
      .select(col("src").as("a"), col("y").as("b"), col("z").as("c"))
    val perVertex = tri.select(col("a").as("x"))
      .unionByName(tri.select(col("b").as("x")))
      .unionByName(tri.select(col("c").as("x")))
      .groupBy("x").agg(count(lit(1)).cast("long").as("n_tri"))
    deg.select(col("x"))
      .join(perVertex, Seq("x"), "left")
      .select(col("x").as("node"),
        coalesce(col("n_tri"), lit(0L)).cast("long").as("triangles"))
  }
}
