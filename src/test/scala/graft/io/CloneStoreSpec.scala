package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[ParquetTableStore.cloneTo]] — the clone-then-mutate primitive the
  * delete drills use instead of rebuilding a frozen shared artifact. */
class CloneStoreSpec extends SparkSpec {
  import spark.implicits._

  test("cloneTo copies every table byte-for-byte at the row level, skips " +
      "_history, and mutating the clone leaves the original intact") {
    val root = Files.createTempDirectory("graft_clone_src_").toString
    // keepSnapshots > 0 so an overwrite leaves a _history dir to skip.
    val src = new ParquetTableStore(spark, root, keepSnapshots = 2)
    src.overwrite("alpha", (1L to 10L).toDF("id"))
    src.overwrite("alpha", (1L to 12L).toDF("id")) // archives v0 under _history
    src.overwrite("beta", Seq(("a", 1L), ("b", 2L)).toDF("k", "v"))

    val cloneRoot = Files.createTempDirectory("graft_clone_dst_").toString
    val clone = src.cloneTo(cloneRoot)

    // Every table row-identical.
    for (t <- Seq("alpha", "beta")) {
      assert(clone.exists(t), s"clone missing $t")
      assert(clone.load(t).collect().map(_.toString).sorted.toSeq ===
        src.load(t).collect().map(_.toString).sorted.toSeq,
        s"clone table $t diverged")
    }
    // History is NOT cloned: the clone starts snapshot-free.
    assert(!new java.io.File(s"$cloneRoot/_history").exists(),
      "clone carried _history")
    intercept[IllegalArgumentException] { clone.loadSnapshot("alpha") }

    // Mutating the clone must not touch the original (the whole point:
    // a delete drill mutates its private copy of a shared artifact).
    clone.overwrite("alpha", (1L to 3L).toDF("id"))
    clone.drop("beta")
    assert(src.load("alpha").count() === 12L, "clone mutation leaked to src")
    assert(src.exists("beta"), "clone drop leaked to src")

    // Partition specs survive the clone (the IVF layout contract).
    val proot = Files.createTempDirectory("graft_clone_part_").toString
    val psrc = new ParquetTableStore(spark, proot,
      partitionByCols = Map("lists" -> Seq("cent_id")))
    psrc.overwrite("lists",
      Seq((1L, 10L), (2L, 20L)).toDF("cent_id", "vec_id"))
    val pclone = psrc.cloneTo(
      Files.createTempDirectory("graft_clone_part_dst_").toString)
    pclone.overwrite("lists",
      Seq((3L, 30L)).toDF("cent_id", "vec_id"))
    val files = new java.io.File(pclone.load("lists")
      .inputFiles.head.stripPrefix("file:")).getParentFile
    assert(files.getName.startsWith("cent_id="),
      s"clone lost the partition layout: ${files.getName}")
  }
}
