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

  test("serve plan reads only index tables — never the raw corpus") {
    val store = tmpStore()
    AnnIndex.buildIvf(store, "ivf", corpus, "vec_id", "embedding", nlist = 8)
    val plan = AnnIndex.ivfTopK(store, "ivf", corpus.filter($"vec_id" < 2),
      "vec_id", "embedding", k = 3, nprobe = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ivf_centroids") && plan.contains("ivf_lists"), plan.take(600))
    // The query frame here is in-memory (LocalTableScan); a FileScan other
    // than the two index tables would mean the corpus leaked into serving.
    val scans = "Location: [^\\n]*".r.findAllIn(plan).toSeq
    assert(scans.forall(s => s.contains("ivf_centroids") || s.contains("ivf_lists")),
      scans.mkString("\n"))
  }
}
