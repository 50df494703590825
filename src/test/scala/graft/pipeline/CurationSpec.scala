package graft.pipeline

import graft.SparkSpec

/** Specs for the per-stage curation funnel (exact dedup → near-dup
  * best-rep → language gate → quality gate, sequential attribution).
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("funnel: each stage drops its designed victim, counts chain") {
    // doc 1 survives everything: en, stopword-rich, clean.
    // doc 2 = exact copy of doc 1          -> dropped at exact_dedup
    // doc 3 = near-dup of doc 1, lower n_chars -> dropped at best-rep
    // doc 4 = German text labeled en        -> dropped at lang_mismatch
    // doc 5 = punctuation soup              -> dropped at quality_min
    val docs = Seq(
      (1L, "the cat of the hat", "en", 100L),
      (2L, "the cat of the hat", "en", 100L),
      (3L, "the cat of the hat today", "en", 50L),
      (4L, "der hund und die katze ist", "en", 90L),
      (5L, "!!!", "en", 3L)
    ).toDF("doc_id", "text", "lang", "n_chars")
    val pairs = Seq((1L, 3L)).toDF("id_a", "id_b")
    val got = Curation.funnel(docs, "doc_id", "text", "lang", "n_chars",
      pairs, qualityMin = 0.6)
      .orderBy("stage_order")
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, "exact_dedup", 5L, 4L, 1L),
      (2L, "near_dup_best_rep", 4L, 3L, 1L),
      (3L, "lang_mismatch", 3L, 2L, 1L),
      (4L, "quality_min", 2L, 1L, 1L)))
  }

  test("keptSet: exactly the survivors of every gate; count equals funnel tail") {
    val docs = Seq(
      (1L, "the cat of the hat", "en", 100L),
      (2L, "the cat of the hat", "en", 100L),
      (3L, "the cat of the hat today", "en", 50L),
      (4L, "der hund und die katze ist", "en", 90L),
      (5L, "!!!", "en", 3L)
    ).toDF("doc_id", "text", "lang", "n_chars")
    val pairs = Seq((1L, 3L)).toDF("id_a", "id_b")
    val kept = Curation.keptSet(docs, "doc_id", "text", "lang", "n_chars",
      pairs, qualityMin = 0.6).as[Long].collect().toSet
    assert(kept === Set(1L))
    val funnelTail = Curation.funnel(docs, "doc_id", "text", "lang", "n_chars",
      pairs, qualityMin = 0.6)
      .orderBy("stage_order")
      .select("docs_kept").as[Long].collect().last
    assert(kept.size.toLong === funnelTail)
  }

  test("funnel: clean corpus passes every stage untouched") {
    val docs = Seq(
      (1L, "the cat of the hat", "en", 10L),
      (2L, "a dog and the bird to fly", "en", 11L)
    ).toDF("doc_id", "text", "lang", "n_chars")
    val pairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val got = Curation.funnel(docs, "doc_id", "text", "lang", "n_chars",
      pairs, qualityMin = 0.5)
      .orderBy("stage_order")
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(got.map(r => (r._3, r._4, r._5)) ===
      Seq.fill(4)((2L, 2L, 0L)))
  }
}
