package graft.functions

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The shared-holdout-score equality behind the r18 cross-query sharing:
  * each order's inline holdout cross-score and its persisted twin serve
  * ONE checkpointed frame (SparkEntry.lmhScoresShared), so the identity
  * the persisted twins now rely on — score from a store built on the
  * 80% split == the base/frame-derived cross-score of the SAME held-out
  * docs, with genuine OOV events firing — is pinned here directly, per
  * order, on a corpus whose holdout contains words/contexts absent from
  * the training split. */
class LmHoldoutShareSpec extends SparkSpec {
  import spark.implicits._

  // Training pool and holdout pool overlap only partially: held-out docs
  // carry OOV words (zz, yy) and unseen contexts, so every backoff
  // branch the shared frame serves is exercised, not just the in-corpus
  // path the score==crossScore in-corpus pins cover.
  private def corpus(seed: Int): org.apache.spark.sql.DataFrame = {
    val rnd = new scala.util.Random(seed)
    val pool = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val oov = Vector("zz", "yy")
    def txt(id: Long): String = {
      val all = if (id % 5 == 0) pool ++ oov else pool
      (0 until (2 + rnd.nextInt(9)))
        .map(_ => all(rnd.nextInt(all.size))).mkString(" ")
    }
    (1L to 60L).map(i => (i, txt(i))).toDF("doc_id", "text")
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  private def store() = new graft.io.ParquetTableStore(spark,
    Files.createTempDirectory("graft_lmh_").toString)

  test("persisted holdout serve == shared holdout score frame, with OOV " +
      "events firing (orders 2, 3 and 5)") {
    val docs = corpus(181)
    val train = docs.filter(col("doc_id") % 5 =!= 0)
    val hold = docs.filter(col("doc_id") % 5 === 0)

    // The holdout genuinely carries OOV words for the training split.
    val trainVocab = train.select(explode(split(lower(col("text")), "\\s+")))
      .distinct().as[String].collect().toSet
    assert(!trainVocab.contains("zz") && !trainVocab.contains("yy"),
      "fixture must keep zz/yy out of the training split")

    // Order 2: score(store) == crossScore — the q_kn_persisted /
    // q_kn_score_holdout shared frame.
    val s2 = store()
    LmIndex.build(s2, "lm", train, "doc_id", "text")
    assert(rows(LmIndex.score(s2, "lm", hold, "doc_id", "text")) ===
      rows(LmIndex.crossScore(train, hold, "doc_id", "text")),
      "order-2 persisted holdout serve diverged from the shared frame")

    // Order 3: score3(store built from the shared base) == the
    // base-frame cross-score — q_kn3_persisted_holdout / q_kn3_holdout.
    val base3 = LmIndex.base3Of(train, "doc_id", "text").localCheckpoint()
    val s3 = store()
    LmIndex.build3FromBase(s3, "lm3", base3)
    assert(rows(LmIndex.score3(s3, "lm3", hold, "doc_id", "text")) ===
      rows(LmIndex.scoreFrames3(LmIndex.frames3FromBase(base3), hold,
        "doc_id", "text", 0.75)),
      "order-3 persisted holdout serve diverged from the shared frame")

    // Order 5: score5(store built from the shared base) == the
    // base-frame cross-score — q_kn5_persisted_holdout / q_kn5_holdout.
    val base5 = LmIndex.base5Of(train, "doc_id", "text").localCheckpoint()
    val s5 = store()
    LmIndex.build5FromBase(s5, "lm5", base5)
    assert(rows(LmIndex.score5(s5, "lm5", hold, "doc_id", "text")) ===
      rows(LmIndex.scoreFrames5(LmIndex.frames5FromBase(base5), hold,
        "doc_id", "text", 0.75)),
      "order-5 persisted holdout serve diverged from the shared frame")
  }
}
