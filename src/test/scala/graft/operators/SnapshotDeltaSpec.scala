package graft.operators

import graft.SparkSpec

class SnapshotDeltaSpec extends SparkSpec {
  import spark.implicits._

  test("delta classifies added / removed / changed / unchanged") {
    val old = Seq(
      (1L, "alpha", "en"),
      (2L, "beta", "en"),
      (3L, "gamma", "de")
    ).toDF("id", "text", "lang")
    val cur = Seq(
      (1L, "alpha", "en"),    // unchanged
      (2L, "beta EDITED", "en"), // changed
      (4L, "delta", "fr")     // added; 3 removed
    ).toDF("id", "text", "lang")

    val got = SnapshotDelta.delta(old, cur, "id", Seq("text", "lang"))
      .select("id", "change").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("delta: a change in ANY listed content column flags the row") {
    val old = Seq((1L, "same", "en"), (2L, "same", "en")).toDF("id", "text", "lang")
    val cur = Seq((1L, "same", "de"), (2L, "same", "en")).toDF("id", "text", "lang")
    val got = SnapshotDelta.delta(old, cur, "id", Seq("text", "lang"))
      .select("id", "change").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "changed", 2L -> "unchanged"))
    // but a column NOT listed doesn't
    val gotTextOnly = SnapshotDelta.delta(old, cur, "id", Seq("text"))
      .select("id", "change").as[(Long, String)].collect().toMap
    assert(gotTextOnly === Map(1L -> "unchanged", 2L -> "unchanged"))
  }

  test("delta: the wide content column never shuffles (hash-projection before the join)") {
    // The join's shuffle inputs must read only (key, hash) — the text column
    // is consumed by md5 below the exchange. Assert no exchange carries the
    // raw content column in its output schema.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val old = (1 to 100).map(i => (i.toLong, "t" * 100)).toDF("id", "text")
    val cur = (50 to 150).map(i => (i.toLong, "t" * 100)).toDF("id", "text")
    val plan = SnapshotDelta.delta(old, cur, "id", Seq("text"))
      .queryExecution.sparkPlan
    val leaky = plan.collect {
      case e: ShuffleExchangeLike if e.output.exists(_.name == "text") => e
    }
    assert(leaky.isEmpty, s"content column crosses an exchange:\n$plan")
  }
}
