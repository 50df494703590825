package graft.functions

import graft.SparkSpec
import graft.io.ParquetTableStore
import org.apache.spark.sql.functions._

/** Persisted ANN index: build-then-load must be row-identical to the
  * inline index paths, rebuilds must be idempotent, and the serve plan
  * must read only index tables. */
class AnnIndexSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (0L until 40L).map { i =>
    i -> Array.tabulate(8)(j => (((i * 13 + j * 5) % 17).toFloat - 8f) / 4f)
  }.toDF("vec_id", "embedding")

  private def tmpStore() = new ParquetTableStore(spark,
    java.nio.file.Files.createTempDirectory("ann_spec_").toString)

  test("persisted IVF index serves results row-identical to the inline path") {
    val store = tmpStore()
    val queries = corpus.filter($"vec_id" < 3)
    AnnIndex.buildIvf(store, "ivf", corpus, "vec_id", "embedding", nlist = 8)
    assert(store.exists("ivf_centroids") && store.exists("ivf_lists"))
    val persisted = AnnIndex.ivfTopK(store, "ivf", queries,
      "vec_id", "embedding", k = 3, nprobe = 2)
      .orderBy("query_id", "rank")
      .as[(Long, Long, Double, Int)].collect().toSeq
    val inline = Similarity.ivfTopK(corpus, queries,
      "vec_id", "embedding", k = 3, nlist = 8, nprobe = 2)
      .orderBy("query_id", "rank")
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(persisted === inline)
    assert(persisted.nonEmpty)
  }

  test("persisted PQ index serves ADC results row-identical to the inline path") {
    val store = tmpStore()
    val queries = corpus.filter($"vec_id" < 3)
    AnnIndex.buildPq(store, "pq", corpus, "vec_id", "embedding",
      dims = 8, m = 4, ksub = 4)
    assert(store.exists("pq_codebook") && store.exists("pq_codes"))
    val persisted = AnnIndex.pqAdcTopK(store, "pq", queries,
      "vec_id", "embedding", dims = 8, m = 4, k = 3)
      .orderBy("query_id", "rnk")
      .as[(Long, Long, Double, Long)].collect().toSeq
    val inline = Similarity.pqAdcTopK(corpus, queries,
      "vec_id", "embedding", dims = 8, m = 4, ksub = 4, k = 3)
      .orderBy("query_id", "rnk")
      .as[(Long, Long, Double, Long)].collect().toSeq
    assert(persisted === inline)
    assert(persisted.nonEmpty)
  }

  test("trained PQ codebooks: persisted build == inline trained path; training moves codewords") {
    val store = tmpStore()
    val queries = corpus.filter($"vec_id" < 3)
    AnnIndex.buildPq(store, "pq", corpus, "vec_id", "embedding",
      dims = 8, m = 4, ksub = 4, trainIters = 2)
    val cb = Similarity.pqCodebookTrained(corpus, "vec_id", "embedding",
      dims = 8, m = 4, ksub = 4, iters = 2)
    val persisted = AnnIndex.pqAdcTopK(store, "pq", queries,
      "vec_id", "embedding", dims = 8, m = 4, k = 3)
      .orderBy("query_id", "rnk")
      .as[(Long, Long, Double, Long)].collect().toSeq
    val inline = Similarity.pqAdcSearch(
        Similarity.pqEncodeWith(corpus, cb, "vec_id", "embedding", dims = 8, m = 4),
        cb, queries, "vec_id", "embedding", dims = 8, m = 4, k = 3)
      .orderBy("query_id", "rnk")
      .as[(Long, Long, Double, Long)].collect().toSeq
    assert(persisted === inline)
    assert(persisted.nonEmpty)
    // Training actually moved the geometry off the lowest-id stand-in…
    val standIn = Similarity.pqCodebook(corpus, "vec_id", "embedding", m = 4, d0 = 2, ksub = 4)
      .select("s", "cb_id", "cw").as[(Int, Long, Array[Float])].collect()
      .map(r => (r._1, r._2) -> r._3.toSeq).toMap
    val trained = cb.select("s", "cb_id", "cw").as[(Int, Long, Array[Float])].collect()
      .map(r => (r._1, r._2) -> r._3.toSeq).toMap
    assert(standIn.keySet === trained.keySet)
    assert(standIn.exists { case (k, v) => trained(k) != v },
      "2 Lloyd's rounds left every codeword exactly on its seed")
    // …and iters = 0 IS the stand-in (the existing oracles' path).
    val zero = Similarity.pqCodebookTrained(corpus, "vec_id", "embedding",
      dims = 8, m = 4, ksub = 4, iters = 0)
      .select("s", "cb_id", "cw").as[(Int, Long, Array[Float])].collect()
      .map(r => (r._1, r._2) -> r._3.toSeq).toMap
    assert(zero === standIn)
  }

  test("IVF append: build-then-append equals one search over frozen centroids + union lists") {
    val store = tmpStore()
    val base = corpus.filter($"vec_id" < 20)
    val batch = corpus.filter($"vec_id" >= 20)
    val queries = corpus.filter($"vec_id" < 3)
    AnnIndex.buildIvf(store, "ivf", base, "vec_id", "embedding", nlist = 8)
    AnnIndex.appendIvf(store, "ivf", batch, "vec_id", "embedding")
    val got = AnnIndex.ivfTopK(store, "ivf", queries,
      "vec_id", "embedding", k = 3, nprobe = 2)
      .orderBy("query_id", "rank")
      .as[(Long, Long, Double, Int)].collect().toSeq
    // Reference: the ORIGINAL coarse quantizer over the WHOLE corpus.
    val cents = Similarity.ivfCentroids(base, "vec_id", "embedding", 8)
    val want = Similarity.ivfSearch(cents,
      Similarity.ivfInvertedLists(corpus, cents, "vec_id", "embedding"),
      queries, "vec_id", "embedding", k = 3, nprobe = 2)
      .orderBy("query_id", "rank")
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(got === want)
    // appended vectors are actually reachable
    assert(got.exists(_._2 >= 20L))
  }

  test("PQ append: new vectors coded under the persisted codebook, not a rederived one") {
    val store = tmpStore()
    val base = corpus.filter($"vec_id" < 20)
    val batch = corpus.filter($"vec_id" >= 20)
    val queries = corpus.filter($"vec_id" < 3)
    AnnIndex.buildPq(store, "pq", base, "vec_id", "embedding",
      dims = 8, m = 4, ksub = 4)
    AnnIndex.appendPq(store, "pq", batch, "vec_id", "embedding", dims = 8, m = 4)
    val got = AnnIndex.pqAdcTopK(store, "pq", queries,
      "vec_id", "embedding", dims = 8, m = 4, k = 3)
      .orderBy("query_id", "rnk")
      .as[(Long, Long, Double, Long)].collect().toSeq
    val cb = Similarity.pqCodebook(base, "vec_id", "embedding", 4, 2, 4)
    val want = Similarity.pqAdcSearch(
      Similarity.pqEncodeWith(corpus, cb, "vec_id", "embedding", 8, 4),
      cb, queries, "vec_id", "embedding", dims = 8, m = 4, k = 3)
      .orderBy("query_id", "rnk")
      .as[(Long, Long, Double, Long)].collect().toSeq
    assert(got === want)
    assert(got.exists(_._2 >= 20L))
  }

  test("rebuild is an atomic overwrite: second build leaves identical results") {
    val store = tmpStore()
    val queries = corpus.filter($"vec_id" < 2)
    AnnIndex.buildIvf(store, "ivf", corpus, "vec_id", "embedding", nlist = 8)
    val first = AnnIndex.ivfTopK(store, "ivf", queries,
      "vec_id", "embedding", k = 3, nprobe = 2).collect().toSeq
    AnnIndex.buildIvf(store, "ivf", corpus, "vec_id", "embedding", nlist = 8)
    val second = AnnIndex.ivfTopK(store, "ivf", queries,
      "vec_id", "embedding", k = 3, nprobe = 2).collect().toSeq
    assert(first.toSet === second.toSet)
  }

  test("kmeansTrain: k rows, deterministic, iters=0 = stand-in, training moves centroids") {
    val seeds = Similarity.ivfCentroids(corpus, "vec_id", "embedding", 8)
      .orderBy("cent_id").collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toSeq
    val zero = Similarity.kmeansTrain(corpus, "vec_id", "embedding", k = 8, iters = 0)
      .orderBy("cent_id").collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toSeq
    assert(zero === seeds)
    val t1 = Similarity.kmeansTrain(corpus, "vec_id", "embedding", k = 8, iters = 2)
      .orderBy("cent_id").collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toSeq
    val t2 = Similarity.kmeansTrain(corpus, "vec_id", "embedding", k = 8, iters = 2)
      .orderBy("cent_id").collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toSeq
    assert(t1 === t2, "training is not deterministic")
    assert(t1.size === 8)
    assert(t1.map(_._1) === seeds.map(_._1), "cluster identity lost its seed keying")
    assert(t1 !== seeds, "2 Lloyd's rounds left every centroid exactly on its seed")
  }

  test("trained centroids never lose recall vs the stand-in at equal nprobe") {
    // The property that justifies paying the training passes. (sf0.01
    // measurement: stand-in mean recall@3 = 0.933, trained = 1.0 —
    // recorded in BASELINE.md round 10.)
    val queries = corpus.filter($"vec_id" < 5)
    def recallOf(cents: org.apache.spark.sql.DataFrame): Double = {
      val brute = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", 3)
        .select("query_id", "vec_id")
      val ivf = Similarity.ivfSearch(cents,
        Similarity.ivfInvertedLists(corpus, cents, "vec_id", "embedding"),
        queries, "vec_id", "embedding", k = 3, nprobe = 2)
        .select("query_id", "vec_id")
      brute.join(ivf, Seq("query_id", "vec_id"), "left_semi").count().toDouble /
        brute.count().toDouble
    }
    val standIn = recallOf(Similarity.ivfCentroids(corpus, "vec_id", "embedding", 8))
    val trained = recallOf(Similarity.kmeansTrain(corpus, "vec_id", "embedding", 8, 2))
    assert(trained >= standIn, s"trained $trained < stand-in $standIn")
  }

  test("buildIvf(trainIters) serves trained results identical to the inline trained path") {
    val store = tmpStore()
    val queries = corpus.filter($"vec_id" < 3)
    AnnIndex.buildIvf(store, "ivf", corpus, "vec_id", "embedding",
      nlist = 8, trainIters = 2)
    val persisted = AnnIndex.ivfTopK(store, "ivf", queries,
      "vec_id", "embedding", k = 3, nprobe = 2)
      .orderBy("query_id", "rank")
      .as[(Long, Long, Double, Int)].collect().toSeq
    val cents = Similarity.kmeansTrain(corpus, "vec_id", "embedding", 8, 2)
    val inline = Similarity.ivfSearch(cents,
      Similarity.ivfInvertedLists(corpus, cents, "vec_id", "embedding"),
      queries, "vec_id", "embedding", k = 3, nprobe = 2)
      .orderBy("query_id", "rank")
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(persisted === inline)
    assert(persisted.nonEmpty)
  }

  test("buildIvfFromFrames == buildIvf(trainIters) table-for-table given " +
      "the shared trained frames") {
    val a = tmpStore(); val b = tmpStore()
    AnnIndex.buildIvf(a, "ivf", corpus, "vec_id", "embedding",
      nlist = 8, trainIters = 2)
    val cents = Similarity.kmeansTrain(corpus, "vec_id", "embedding", 8, 2)
    AnnIndex.buildIvfFromFrames(b, "ivf", cents,
      Similarity.ivfInvertedLists(corpus, cents, "vec_id", "embedding"))
    for (t <- Seq("ivf_centroids", "ivf_lists"))
      assert(b.load(t).collect().map(_.toString).toSet ===
        a.load(t).collect().map(_.toString).toSet,
        s"$t diverged between buildIvf and buildIvfFromFrames")
  }

  test("cent_id-partitioned lists: serve prunes to the probed partitions, same rows") {
    val flat = tmpStore()
    val part = new ParquetTableStore(spark,
      java.nio.file.Files.createTempDirectory("ann_spec_part_").toString,
      partitionByCols = AnnIndex.partitionSpec("ivf"))
    val queries = corpus.filter($"vec_id" === 0L) // 1 query × nprobe=2
    AnnIndex.buildIvf(flat, "ivf", corpus, "vec_id", "embedding", nlist = 8)
    AnnIndex.buildIvf(part, "ivf", corpus, "vec_id", "embedding", nlist = 8)
    val served = AnnIndex.ivfTopK(part, "ivf", queries,
      "vec_id", "embedding", k = 3, nprobe = 2)
    val want = AnnIndex.ivfTopK(flat, "ivf", queries,
      "vec_id", "embedding", k = 3, nprobe = 2)
      .orderBy("query_id", "rank").collect().toSeq
    assert(served.orderBy("query_id", "rank").collect().toSeq === want)
    // The lists scan carries the probe routing as a static partition
    // filter and physically selects only the nprobe probed partitions.
    val scans = graft.PlanTestUtils.scansOf(
      served.queryExecution.executedPlan, "ivf_lists")
    assert(scans.nonEmpty, "no ivf_lists file scan found")
    scans.foreach { f =>
      assert(f.partitionFilters.nonEmpty, "lists scan has no PartitionFilters")
      assert(f.selectedPartitions.partitionCount <= 2,
        s"read ${f.selectedPartitions.partitionCount} partitions for nprobe=2")
    }
  }

  test("deleteVectors: delete-then-query == rebuild-without-deleted; compact folds + empties") {
    val store = new ParquetTableStore(spark,
      java.nio.file.Files.createTempDirectory("ann_spec_del_").toString,
      partitionByCols = AnnIndex.partitionSpec("ivf"))
    val queries = corpus.filter($"vec_id" < 3)
    val deleted = corpus.filter(($"vec_id" >= 8L) && ($"vec_id" % 5 === 1L))
    val kept = corpus.filter(!(($"vec_id" >= 8L) && ($"vec_id" % 5 === 1L)))
    AnnIndex.buildIvf(store, "ivf", corpus, "vec_id", "embedding", nlist = 8)
    AnnIndex.buildPq(store, "ivf", corpus, "vec_id", "embedding",
      dims = 8, m = 4, ksub = 4)
    AnnIndex.deleteVectors(store, "ivf", deleted, "vec_id")

    def ivfNow() = AnnIndex.ivfTopK(store, "ivf", queries,
      "vec_id", "embedding", k = 3, nprobe = 2)
      .orderBy("query_id", "rank").as[(Long, Long, Double, Int)].collect().toSeq
    def pqNow() = AnnIndex.pqAdcTopK(store, "ivf", queries,
      "vec_id", "embedding", dims = 8, m = 4, k = 3)
      .orderBy("query_id", "rnk").as[(Long, Long, Double, Long)].collect().toSeq

    // rebuild-without-deleted references (deleted ids are all >= 8, so the
    // 8 lowest-id centroids / 4 lowest-id codewords are unchanged)
    val cents = Similarity.ivfCentroids(corpus, "vec_id", "embedding", 8)
    val wantIvf = Similarity.ivfSearch(cents,
      Similarity.ivfInvertedLists(kept, cents, "vec_id", "embedding"),
      queries, "vec_id", "embedding", k = 3, nprobe = 2)
      .orderBy("query_id", "rank").as[(Long, Long, Double, Int)].collect().toSeq
    val wantPq = Similarity.pqAdcTopK(kept, queries,
      "vec_id", "embedding", dims = 8, m = 4, ksub = 4, k = 3)
      .orderBy("query_id", "rnk").as[(Long, Long, Double, Long)].collect().toSeq

    val deletedIds = deleted.select("vec_id").as[Long].collect().toSet
    val beforeIvf = ivfNow()
    val beforePq = pqNow()
    assert(beforeIvf === wantIvf)
    assert(beforePq === wantPq)
    assert(!beforeIvf.exists(r => deletedIds(r._2)))
    assert(!beforePq.exists(r => deletedIds(r._2)))

    // compaction folds tombstones into BOTH physical tables atomically,
    // empties the tombstone set, changes no serve result, and is idempotent
    AnnIndex.compact(store, "ivf")
    assert(store.load("ivf_tombstones").count() === 0L)
    assert(store.load("ivf_lists").join(deleted, Seq("vec_id"), "left_semi").count() === 0L)
    assert(store.load("ivf_codes").join(deleted, Seq("vec_id"), "left_semi").count() === 0L)
    assert(ivfNow() === beforeIvf)
    assert(pqNow() === beforePq)
    AnnIndex.compact(store, "ivf")
    assert(ivfNow() === beforeIvf)
    assert(pqNow() === beforePq)
  }

  test("serve plan reads only index tables — never the raw corpus") {
    val store = tmpStore()
    AnnIndex.buildIvf(store, "ivf", corpus, "vec_id", "embedding", nlist = 8)
    val served = AnnIndex.ivfTopK(store, "ivf", corpus.filter($"vec_id" < 2),
      "vec_id", "embedding", k = 3, nprobe = 2)
    val plan = served.queryExecution.executedPlan.toString
    // Probe routing (queries × ivf_centroids) runs ONCE at call time and
    // lands in the plan as a LOCAL probes relation + a static cent_id IN
    // pushdown — so the serve plan's only file scan is the pruned lists
    // table. A second centroids scan here would mean the routing subtree
    // re-evaluates per consumer; any other FileScan would mean the raw
    // corpus leaked into serving.
    assert(plan.contains("ivf_lists"), plan.take(600))
    // The pushdown gate must match the actual In/InSet node over cent_id
    // — the lists table's partition column stringifies as "cent_id" in
    // every pruned scan, so a substring check can never fail.
    import org.apache.spark.sql.catalyst.expressions.{In, InSet}
    val listScans = graft.PlanTestUtils
      .fileScans(served.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("ivf_lists")))
    assert(listScans.nonEmpty, "no ivf_lists file scan in the serve plan")
    assert(listScans.exists { f =>
      (f.partitionFilters ++ f.dataFilters).exists(_.exists {
        case i: In => i.value.toString.contains("cent_id")
        case i: InSet => i.child.toString.contains("cent_id")
        case _ => false
      })
    }, s"lists scan lost the static cent_id IN pushdown: " +
      listScans.map(f => (f.partitionFilters, f.dataFilters)).mkString("; "))
    val scans = "Location: [^\\n]*".r.findAllIn(plan).toSeq
    assert(scans.forall(_.contains("ivf_lists")), scans.mkString("\n"))
  }

  test("pinned snapshot serves row-identical to the fresh path (IVF and PQ)") {
    val store = tmpStore()
    val queries = corpus.filter($"vec_id" < 3)
    AnnIndex.buildIvf(store, "ivf", corpus, "vec_id", "embedding", nlist = 8)
    AnnIndex.buildPq(store, "pq", corpus, "vec_id", "embedding",
      dims = 8, m = 4, ksub = 4)
    val ivfSnap = AnnIndex.ivfSnapshot(store, "ivf")
    val pqSnap = AnnIndex.pqSnapshot(store, "pq")
    try {
      val gotIvf = AnnIndex.ivfTopK(ivfSnap, queries,
        "vec_id", "embedding", k = 3, nprobe = 2, pruneProbed = true)
        .orderBy("query_id", "rank").collect().toSeq
      val wantIvf = AnnIndex.ivfTopK(store, "ivf", queries,
        "vec_id", "embedding", k = 3, nprobe = 2)
        .orderBy("query_id", "rank").collect().toSeq
      assert(gotIvf === wantIvf)
      assert(gotIvf.nonEmpty)
      val gotPq = AnnIndex.pqAdcTopK(pqSnap, queries,
        "vec_id", "embedding", dims = 8, m = 4, k = 3)
        .orderBy("query_id", "rnk").collect().toSeq
      val wantPq = AnnIndex.pqAdcTopK(store, "pq", queries,
        "vec_id", "embedding", dims = 8, m = 4, k = 3)
        .orderBy("query_id", "rnk").collect().toSeq
      assert(gotPq === wantPq)
      assert(gotPq.nonEmpty)
    } finally { ivfSnap.release(); pqSnap.release() }
  }

  test("snapshot freshness contract: deletes land at the next snapshot, not the next call") {
    val store = tmpStore()
    val queries = corpus.filter($"vec_id" < 2)
    AnnIndex.buildIvf(store, "ivf", corpus, "vec_id", "embedding", nlist = 8)
    val before = AnnIndex.ivfSnapshot(store, "ivf")
    val preDelete = AnnIndex.ivfTopK(before, queries,
      "vec_id", "embedding", k = 3, nprobe = 2, pruneProbed = true)
      .collect().toSeq
    val victims = preDelete.map(_.getLong(1)).distinct.take(2)
    AnnIndex.deleteVectors(store, "ivf",
      victims.toDF("vec_id"), "vec_id")
    // The pinned snapshot still serves the pre-delete view …
    val stillOld = AnnIndex.ivfTopK(before, queries,
      "vec_id", "embedding", k = 3, nprobe = 2, pruneProbed = true)
      .collect().toSeq
    assert(stillOld === preDelete)
    before.release()
    // … and a re-snapshot (or the fresh path) reflects the delete.
    val after = AnnIndex.ivfSnapshot(store, "ivf")
    try {
      val reSnap = AnnIndex.ivfTopK(after, queries,
        "vec_id", "embedding", k = 3, nprobe = 2, pruneProbed = true)
        .collect().toSeq
      assert(reSnap.forall(r => !victims.contains(r.getLong(1))))
      val fresh = AnnIndex.ivfTopK(store, "ivf", queries,
        "vec_id", "embedding", k = 3, nprobe = 2)
        .collect().toSeq
      assert(reSnap.toSet === fresh.toSet)
    } finally { after.release() }
  }
}
