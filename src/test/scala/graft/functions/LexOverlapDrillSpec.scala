package graft.functions

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The §2.6 overlapped BM25 maintenance drill (round-18 optimization):
  * buildAppendTopK overlaps the batch's postings pass with the build's
  * staged writes and the serve with the append's two-phase commit — it
  * must leave the store table-for-table identical to the sequential
  * build + append and return exactly the rows bm25TopK returns over the
  * committed index. */
class LexOverlapDrillSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(seed: Int): org.apache.spark.sql.DataFrame = {
    val rnd = new scala.util.Random(seed)
    val pool = Vector("spark", "query", "index", "token", "merge", "store",
      "batch", "serve", "probe", "shard")
    def txt(): String =
      (0 until (4 + rnd.nextInt(10))).map(_ => pool(rnd.nextInt(10))).mkString(" ")
    (1L to 50L).map(i => (i, txt())).toDF("doc_id", "text")
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  private def store() = new graft.io.ParquetTableStore(spark,
    Files.createTempDirectory("graft_lexo_").toString)

  test("buildAppendTopK == build + append + bm25TopK, table-for-table " +
      "and row-for-row") {
    val docs = corpus(91)
    val base = docs.filter(col("doc_id") <= 20)
    val batch = docs.filter(col("doc_id") > 20)
    val queries = docs.filter(col("doc_id") <= 3)
      .select(col("doc_id"), col("text"))

    val sa = store()
    LexIndex.build(sa, "lex", base, "doc_id", "text")
    LexIndex.append(sa, "lex", batch, "doc_id", "text")
    val seqServe = LexIndex.bm25TopK(sa, "lex", queries, "doc_id", "text",
      k = 5)

    for (overlapServe <- Seq(false, true)) {
      val sb = store()
      val drill = LexIndex.buildAppendTopK(sb, "lex", base, batch,
        "doc_id", "text", queries, "doc_id", "text", k = 5,
        overlapServe = overlapServe)
      for (t <- Seq("postings", "doclens", "lexstats", "tombstones"))
        assert(rows(sb.load(s"lex_$t")) === rows(sa.load(s"lex_$t")),
          s"index table $t diverged (overlapServe=$overlapServe)")
      assert(rows(drill) === rows(seqServe),
        s"drill serve diverged from bm25TopK (overlapServe=$overlapServe)")
    }
  }
}
