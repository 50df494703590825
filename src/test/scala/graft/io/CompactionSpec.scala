package graft.io

import graft.SparkSpec
import org.apache.hadoop.fs.Path

/** ParquetTableStore.compact: fragmented partitions shrink, cold ones are
  * physically untouched, content is identical. */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def dataFiles(p: String): Array[org.apache.hadoop.fs.FileStatus] = {
    val path = new Path(p)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) Array.empty
    else fs.listStatus(path).filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
  }

  test("streaming drain with maintenance compacts the fragmented contacts partition, data intact") {
    // 12 same-tenant jobs can't share a wave (tenant conflict), so each
    // appends its own contacts file into partition contacts_user_id=u1 —
    // exactly the fragmentation a long-running stream accumulates. With
    // maintainEvery=1 the dispatcher compacts after the drain batch.
    import graft.model.Schemas.JobStatus
    import graft.stream.JobDispatch
    import org.apache.spark.sql.streaming.Trigger
    import java.nio.file.{Files, Paths}
    val nJobs = 12
    val root = Files.createTempDirectory("graft_stream_compact").toString
    Files.createDirectories(Paths.get(s"$root/uploads"))
    Files.createDirectories(Paths.get(s"$root/queue"))
    val store = new ParquetTableStore(spark, s"$root/tables")
    store.overwrite("jobs", (1 to nJobs).map(i => (i, "u1", JobStatus.Pending))
      .toDF("job_id", "job_user_id", "job_status"))
    (1 to nJobs).foreach { i =>
      Files.writeString(Paths.get(s"$root/uploads/f$i.csv"),
        s"email,first_name,last_name,company\nj$i@b.co,F,L,C\n")
      val tmp = Files.writeString(Paths.get(f"$root/queue/.m$i%03d.tmp"),
        s"""{"job_id": $i, "s3_key": "f$i.csv"}""")
      Files.move(tmp, Paths.get(f"$root/queue/m$i%03d"))
    }
    val q = JobDispatch.startQueue(spark, store, s"$root/queue", s"$root/cp",
      k => s"$root/uploads/$k", Trigger.AvailableNow(), maintainEvery = 1)
    q.awaitTermination(600000)
    q.stop()
    assert(store.load("jobs").select("job_status").as[String].collect()
      .forall(_ == JobStatus.Completed))
    assert(store.load("contacts").count() === nJobs.toLong)
    val partFiles = dataFiles(s"$root/tables/contacts/contacts_user_id=u1").length
    assert(partFiles <= 4,
      s"$partFiles files left in the tenant partition after maintenance")
  }

  test("compact merges fragmented partitions and leaves cold partitions untouched") {
    val root = java.nio.file.Files.createTempDirectory("compact").toString
    val store = new ParquetTableStore(spark, root)
    // Partition job=hot gets 6 tiny appends (6+ files); job=cold gets one.
    (1 to 6).foreach { i =>
      store.append("staging", Seq((s"row$i", "hot")).toDF("payload", "staging_job_id"))
    }
    store.append("staging", Seq(("only", "cold")).toDF("payload", "staging_job_id"))

    val hotDir = s"$root/staging/staging_job_id=hot"
    val coldDir = s"$root/staging/staging_job_id=cold"
    assert(dataFiles(hotDir).length >= 6)
    val coldBefore = dataFiles(coldDir).map(s => (s.getPath.getName, s.getModificationTime)).toSet
    val before = store.load("staging").as[(String, String)].collect().toSet

    store.compact("staging", maxFilesPerPartition = 2)

    assert(dataFiles(hotDir).length === 1, "fragmented partition should collapse to one file")
    assert(dataFiles(coldDir).map(s => (s.getPath.getName, s.getModificationTime)).toSet
      === coldBefore, "under-threshold partition must not be rewritten")
    assert(store.load("staging").as[(String, String)].collect().toSet === before)
  }

  test("snapshot history: overwrites archive by rename, prune to keepSnapshots, loadSnapshot reads back") {
    val root = java.nio.file.Files.createTempDirectory("snap").toString
    val store = new ParquetTableStore(spark, root, partitionByCols = Map.empty,
      keepSnapshots = 2)
    (1 to 4).foreach { i =>
      store.overwrite("jobs", Seq((i.toLong, s"gen$i")).toDF("id", "name"))
    }
    // current = gen4; history holds gen3 (back=1) and gen2 (back=2); gen1 pruned
    assert(store.load("jobs").as[(Long, String)].head() === ((4L, "gen4")))
    assert(store.loadSnapshot("jobs", 1).as[(Long, String)].head() === ((3L, "gen3")))
    assert(store.loadSnapshot("jobs", 2).as[(Long, String)].head() === ((2L, "gen2")))
    intercept[IllegalArgumentException] { store.loadSnapshot("jobs", 3) }
    // default keepSnapshots=0 keeps no history (delete, not archive)
    val plain = new ParquetTableStore(spark, root + "2", partitionByCols = Map.empty)
    plain.overwrite("jobs", Seq((1L, "a")).toDF("id", "name"))
    plain.overwrite("jobs", Seq((2L, "b")).toDF("id", "name"))
    intercept[IllegalArgumentException] { plain.loadSnapshot("jobs", 1) }
  }

  test("compact handles unpartitioned tables and respects targetFileBytes") {
    val root = java.nio.file.Files.createTempDirectory("compact2").toString
    val store = new ParquetTableStore(spark, root, partitionByCols = Map.empty)
    (1 to 5).foreach { i => store.append("jobs", Seq((i.toLong, s"j$i")).toDF("id", "name")) }
    assert(dataFiles(s"$root/jobs").length >= 5)
    val before = store.load("jobs").as[(Long, String)].collect().toSet

    store.compact("jobs", maxFilesPerPartition = 1)
    assert(dataFiles(s"$root/jobs").length === 1)
    assert(store.load("jobs").as[(Long, String)].collect().toSet === before)

    // A tiny byte target forces multiple output files.
    val store2 = new ParquetTableStore(spark, root, partitionByCols = Map.empty)
    (1 to 8).foreach { i =>
      store2.append("big", (1 to 2000).map(j => (j.toLong, s"v$i-$j")).toDF("id", "v"))
    }
    val totalBytes = dataFiles(s"$root/big").map(_.getLen).sum
    store2.compact("big", targetFileBytes = totalBytes / 3, maxFilesPerPartition = 1)
    val after = dataFiles(s"$root/big").length
    assert(after >= 3 && after <= 4, s"expected ~ceil(bytes/target)=3-4 files, got $after")
    assert(store2.load("big").count() === 16000L)
  }
}
