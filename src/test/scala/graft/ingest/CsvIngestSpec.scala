package graft.ingest

import graft.SparkSpec
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

/** Fixture-driven ingest specs per FIXTURES.md §1 (encodings × delimiters ×
  * cleanup axes). Fixtures are generated as temp files — the CSV axes can't
  * be expressed over the parquet oracle harness. */
class CsvIngestSpec extends SparkSpec {

  private def tmpCsv(bytes: Array[Byte], suffix: String = ".csv"): String = {
    val p: Path = Files.createTempFile("graft_csv", suffix)
    Files.write(p, bytes)
    p.toFile.deleteOnExit()
    p.toString
  }

  private def tmpCsv(text: String): String =
    tmpCsv(text.getBytes(StandardCharsets.UTF_8))

  // ---- encoding detection -------------------------------------------------

  test("encoding: valid utf-8 detected") {
    assert(CsvSniffer.detectEncoding("email,ação\né@b.co,x\n".getBytes(StandardCharsets.UTF_8)) === "UTF-8")
  }

  test("encoding: non-utf8 bytes fall back to latin-1 (cascade never goes further)") {
    val latin = "email;nome\njosé@b.co;José\n".getBytes(StandardCharsets.ISO_8859_1)
    assert(CsvSniffer.detectEncoding(latin) === "ISO-8859-1")
  }

  test("encoding: utf-8 char truncated by head window still utf-8") {
    val full = ("a,b\n" + ("x" * 10) + "é").getBytes(StandardCharsets.UTF_8)
    val truncated = full.dropRight(1) // cuts the 2-byte é in half
    assert(CsvSniffer.detectEncoding(truncated) === "UTF-8")
  }

  // ---- delimiter detection ------------------------------------------------

  test("delimiter: semicolon preferred (European format, ADR-004)") {
    assert(CsvSniffer.detectDelimiter("email;first_name\na@b.co;Ann\n") === ';')
  }

  test("delimiter: comma when semicolon yields single field") {
    assert(CsvSniffer.detectDelimiter("email,first_name\na@b.co,Ann\n") === ',')
  }

  test("delimiter: tab detected when others fail") {
    assert(CsvSniffer.detectDelimiter("email\tfirst_name\na@b.co\tAnn\n") === '\t')
  }

  test("delimiter: rival-delimiter-in-field-name rejects wrong candidate") {
    // Splitting 'email,first_name' by ';' gives ONE field -> fails multiple-
    // fields check; header with both ';' and ',' exercises the rival rule.
    val text = "name;desc,extra\nv1;v2,v3\n"
    // ';' split -> fields: [name, desc,extra] -> 'desc,extra' contains ',' -> invalid for ';'
    // ',' split -> fields: [name;desc, extra] -> contains ';' -> invalid for ','
    // tab -> single field -> invalid; falls back to ','
    assert(CsvSniffer.detectDelimiter(text) === ',')
  }

  test("delimiter: quoted rival in a field name still rejects (reference predicate)") {
    // The reference applies its rival-delimiter check to the PARSED (unquoted)
    // field name (s3_service.py:196-207), so a quoted "last,first" header
    // rejects ';' and every other candidate, landing on the ',' fallback.
    assert(CsvSniffer.detectDelimiter("\"last,first\";email\n\"Bee, Ann\";a@b.co\n") === ',')
  }

  test("delimiter: garbage single-column input falls back to comma") {
    assert(CsvSniffer.detectDelimiter("justonecolumn\nvalue\n") === ',')
  }

  // ---- end-to-end read ----------------------------------------------------

  test("read: semicolon file with trailing ;; drops empty-header columns and trims") {
    val path = tmpCsv("email;first_name;last_name;company;;\n" +
      " a@b.co ; Ann ;Bee;Acme;;\n" +
      ";;;;;\n" + // blank row -> dropped
      "c@d.co;Cat;Dee;Biz;x;\n") // value under empty header -> column dropped
    val df = CsvSource.read(spark, path)
    assert(df.columns.toSeq === Seq("row_number", "email", "first_name", "last_name", "company"))
    val rows = df.orderBy("row_number").collect()
    assert(rows.length === 2)
    assert(rows(0).getAs[String]("email") === "a@b.co")
    assert(rows(0).getAs[String]("first_name") === "Ann")
    assert(rows(0).getAs[Long]("row_number") === 1L)
    assert(rows(1).getAs[Long]("row_number") === 2L)
  }

  test("read: latin-1 file decodes with accented values intact") {
    val latin = "email;first_name;last_name;company\njose@b.co;José;Sá;Ação\n"
      .getBytes(StandardCharsets.ISO_8859_1)
    val df = CsvSource.read(spark, tmpCsv(latin))
    val r = df.collect().head
    assert(r.getAs[String]("first_name") === "José")
    assert(r.getAs[String]("company") === "Ação")
  }

  test("read: row_number is 1-based file order") {
    val path = tmpCsv("email,first_name,last_name,company\n" +
      (1 to 50).map(i => s"u$i@b.co,F$i,L$i,C$i").mkString("\n") + "\n")
    val df = CsvSource.read(spark, path)
    val got = df.orderBy("row_number").collect()
      .map(r => (r.getAs[Long]("row_number"), r.getAs[String]("email")))
    assert(got.take(3).toSeq === Seq((1L, "u1@b.co"), (2L, "u2@b.co"), (3L, "u3@b.co")))
    assert(got.length === 50)
    assert(got.last === ((50L, "u50@b.co")))
  }

  test("toContract: missing columns null, extra columns dropped") {
    val path = tmpCsv("email,first_name,notes\na@b.co,Ann,hello\n")
    val df = CsvSource.toContract(CsvSource.read(spark, path))
    assert(df.columns.toSeq === Seq("row_number", "email", "first_name", "last_name", "company"))
    val r = df.collect().head
    assert(r.getAs[String]("last_name") === null)
    assert(r.getAs[String]("email") === "a@b.co")
  }

  // ---- grouped wave scan (readWaveKeyed) ----------------------------------

  private def waveFile(jobId: Int, path: String): CsvSource.WaveFile = {
    val conf = spark.sparkContext.hadoopConfiguration
    val hp = new org.apache.hadoop.fs.Path(path)
    CsvSource.WaveFile(jobId, path, CsvSniffer.sniff(path, conf),
      hp.getFileSystem(conf).getFileStatus(hp).getLen)
  }

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Set[(Int, Long, String, String, String, String)] =
    df.collect().map(r => (
      r.getAs[Int]("job_id"), r.getAs[Long]("row_number"),
      r.getAs[String]("email"), r.getAs[String]("first_name"),
      r.getAs[String]("last_name"), r.getAs[String]("company"))).toSet

  private def perFileReference(files: Seq[CsvSource.WaveFile]): Set[(Int, Long, String, String, String, String)] =
    files.map { f =>
      rowsOf(CsvSource.toContract(CsvSource.readWith(spark, f.path, f.sniff))
        .withColumn(
          "job_id", org.apache.spark.sql.functions.lit(f.jobId)))
    }.reduce(_ ++ _)

  test("readWaveKeyed == per-file reads: mixed dialects, encodings, ragged rows, path with space") {
    val utf1 = tmpCsv("email,first_name,last_name,company\n" +
      (1 to 40).map(i => s"a$i@b.co,F$i,L$i,C$i").mkString("\n") + "\n")
    val utf2 = tmpCsv("email,first_name,last_name,company\nb1@b.co,F,L,C\n,, ,\nb2@b.co,F2,L2,C2\n")
    val semi = tmpCsv("email;first_name;last_name;company;;\ns@b.co; Ann ;Bee;Acme;;\n")
    val latin = tmpCsv(
      "email;first_name;last_name;company\njose@b.co;José;Sá;Ação\n"
        .getBytes(StandardCharsets.ISO_8859_1))
    val spaced = {
      val dir = Files.createTempDirectory("graft wave dir")
      val p = dir.resolve("file with space.csv")
      Files.writeString(p, "email,first_name,last_name,company\nsp@b.co,F,L,C\n")
      p.toString
    }
    val files = Seq(
      waveFile(1, utf1), waveFile(2, utf2), waveFile(3, semi),
      waveFile(4, latin), waveFile(5, spaced))
    val keyed = CsvSource.readWaveKeyed(spark, files)
    assert(keyed.columns.toSeq ===
      Seq("row_number", "job_id", "email", "first_name", "last_name", "company"))
    assert(rowsOf(keyed) === perFileReference(files))
    // Per-file numbering: each job's rows are 1..n in its own file order.
    val byJob = keyed.collect().groupBy(_.getAs[Int]("job_id"))
    assert(byJob(1).map(_.getAs[Long]("row_number")).sorted.toSeq === (1L to 40L))
    assert(byJob(2).map(_.getAs[Long]("row_number")).sorted.toSeq === Seq(1L, 2L))
  }

  test("readWaveKeyed: one path shared by many jobs is read once and fanned out per job") {
    val shared = tmpCsv("email,first_name,last_name,company\nx@b.co,F,L,C\ny@b.co,F2,L2,C2\n")
    val files = (1 to 5).map(j => waveFile(j, shared))
    val keyed = CsvSource.readWaveKeyed(spark, files)
    val rows = rowsOf(keyed)
    assert(rows.size === 10, "2 rows x 5 jobs")
    assert(rows.map(_._1) === (1 to 5).toSet)
    (1 to 5).foreach { j =>
      assert(rows.filter(_._1 == j).map(r => (r._2, r._3)) ===
        Set((1L, "x@b.co"), (2L, "y@b.co")), s"job $j")
    }
    // The shared path appears once in the physical scan (one leaf file).
    val scans = keyed.queryExecution.executedPlan.toString
    assert(!scans.contains("Union") || files.map(_.path).distinct.size == 1)
  }
}
