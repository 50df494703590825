package graft.ingest

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** CSV ingestion: sniff -> vectorized Spark CSV scan -> clean -> number.
  *
  * Mirrors the reference's read path (s3_service.py:37-319) as one
  * declarative read:
  *   S4/S5  encoding+delimiter via [[CsvSniffer]] (head-only, not whole-file)
  *   S6     header-driven parse, all columns StringType (DictReader parity)
  *   S7     drop empty-header columns (trailing ';;'), trim keys + values
  *   S8     drop rows with no non-empty value
  *   H2     1-based `row_number` in file order (zipWithIndex — preserves
  *          partition order without a global sort; the hash contract is
  *          per-file, SURVEY.md §7.5)
  */
object CsvSource {

  /** Read one CSV object into the cleaned, numbered input frame. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val sniff = CsvSniffer.sniff(path, spark.sparkContext.hadoopConfiguration)
    readWith(spark, path, sniff)
  }

  def readWith(spark: SparkSession, path: String, sniff: CsvSniffer.Sniff): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .option("sep", sniff.delimiter.toString)
      .option("encoding", sniff.encoding)
      .option("inferSchema", "false")
      .option("mode", "PERMISSIVE")
      .csv(path)

    val cleaned = clean(raw, sniff.rawHeader)
    numberRows(cleaned)
  }

  /** S7: drop columns whose RAW header name is blank (Spark renames them
    * _cN, so we match by position against the sniffed raw header), trim the
    * kept header names, and trim every value (null-preserving, like
    * `value.strip() if value else value`). S8: keep rows with >=1 non-empty
    * value. */
  def clean(raw: DataFrame, rawHeader: Seq[String]): DataFrame = {
    val cols = raw.columns.toSeq
    // Positional pairing with the sniffed header; if the sniff is absent
    // (e.g. direct testing), fall back to the dataframe's own column names.
    val paired =
      if (rawHeader.length == cols.length) cols.zip(rawHeader)
      else cols.map(c => c -> c)
    val kept = paired.collect { case (c, rawName) if rawName.trim.nonEmpty =>
      trim(col(s"`$c`")).as(rawName.trim)
    }
    val projected = raw.select(kept: _*)
    val nonEmpty = projected.columns
      .map(c => coalesce(col(s"`$c`"), lit("")) =!= "")
      .reduceOption(_ || _)
      .getOrElse(lit(false))
    projected.filter(nonEmpty)
  }

  /** H2: 1-based row numbering in file order. zipWithIndex keeps partition
    * (= file byte-range) order with one extra count pass and no shuffle —
    * scales linearly with input splits, unlike a global `row_number()`
    * window which would single-partition the sort. */
  def numberRows(df: DataFrame): DataFrame = {
    val schema = StructType(StructField("row_number", LongType, nullable = false) +: df.schema.fields)
    val rdd = df.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq((i + 1L) +: r.toSeq)
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Project to the engine's four contract fields (absent columns become
    * null, extra columns dropped — processor.py:241-244 reads only these). */
  def toContract(df: DataFrame): DataFrame = {
    val present = df.columns.toSet
    val fields = graft.model.Schemas.csvFields.map { f =>
      if (present(f)) col(f) else lit(null).cast("string").as(f)
    }
    df.select(col("row_number") +: fields: _*)
  }

  /** One CSV object of a dispatch wave: which job reads it + its sniff. */
  case class WaveFile(jobId: Int, path: String, sniff: CsvSniffer.Sniff, bytes: Long)

  /** Files above this size take the per-file path: Spark splits bigger CSVs
    * across partitions (maxPartitionBytes), which would break the
    * per-partition file-order numbering the grouped scan relies on. */
  val GroupMaxBytes: Long = 32L * 1024 * 1024

  /** Read MANY wave CSVs as ONE multi-file scan per sniff group, returning
    * the contract frame plus a `job_id` column.
    *
    * The per-file union the wave used before paid ~64 separate scan +
    * RDD-numbering subtrees per materialization (measured 7.8 s vs 0.44 s
    * for one 64-file scan at 1,500 rows/file) — plan-leaf count, not data,
    * was the wave's remaining floor. Here:
    *
    *   - files group by their FULL sniff (encoding, delimiter, raw header),
    *     so `clean`'s positional header handling is byte-identical to the
    *     per-file read; mixed-dialect waves just produce several scans;
    *   - row numbering stays 1-based in FILE order: small files never split
    *     (only files over maxPartitionBytes do — those take the per-file
    *     path via [[GroupMaxBytes]]), so each file's rows are contiguous
    *     and ordered within its scan partition, and a per-partition counter
    *     that resets on `input_file_name()` change reproduces
    *     [[numberRows]] exactly;
    *   - a path serving SEVERAL jobs (redelivered/shared uploads) is read
    *     ONCE and fanned out by a broadcast (path -> job_id) join, which
    *     also tags every row's job.
    */
  def readWaveKeyed(spark: SparkSession, files: Seq[WaveFile]): DataFrame = {
    require(files.nonEmpty, "readWaveKeyed needs at least one file")
    val (big, small) = files.partition(_.bytes >= GroupMaxBytes)
    val bigFrames = big.map { f =>
      toContract(readWith(spark, f.path, f.sniff))
        .withColumn("job_id", lit(f.jobId))
        .select(col("row_number"), col("job_id"),
          col("email"), col("first_name"), col("last_name"), col("company"))
    }
    val groupFrames = small
      .groupBy(f => (f.sniff.encoding, f.sniff.delimiter, f.sniff.rawHeader.toList))
      .values.map(g => groupScanKeyed(spark, g.toSeq)).toSeq
    (groupFrames ++ bigFrames).reduce(_.unionByName(_))
  }

  /** Canonical match key for `input_file_name()` vs a request path: the
    * decoded URI path (input_file_name returns the URL-encoded URI). */
  private def pathKey(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  private def groupScanKeyed(spark: SparkSession, group: Seq[WaveFile]): DataFrame = {
    import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
    val sn = group.head.sniff
    val paths = group.map(_.path).distinct
    val raw = spark.read
      .option("header", "true")
      .option("sep", sn.delimiter.toString)
      .option("encoding", sn.encoding)
      .option("inferSchema", "false")
      .option("mode", "PERMISSIVE")
      .csv(paths: _*)
    val cleaned = clean(raw, sn.rawHeader).withColumn("__file", input_file_name())
    // Per-file numbering in one narrow pass: files are contiguous and
    // in-order inside a scan partition, and small files never split.
    val numbered = StructType(
      StructField("row_number", LongType, nullable = false) +:
        StructField("__path", org.apache.spark.sql.types.StringType, nullable = false) +:
        cleaned.schema.fields.dropRight(1))
    val rdd = cleaned.rdd.mapPartitions { it =>
      var cur: String = null
      var key: String = null
      var n = 0L
      it.map { r =>
        val f = r.getAs[String]("__file")
        if (f != cur) {
          cur = f
          key = try new java.net.URI(f).getPath catch { case _: Exception => f }
          n = 0L
        }
        n += 1
        Row.fromSeq(n +: key +: r.toSeq.dropRight(1))
      }
    }
    val byFile = spark.createDataFrame(rdd, numbered)
    val session = spark
    import session.implicits._
    val pathJobs = broadcast(group.map(f => (pathKey(f.path), f.jobId))
      .toDF("__path", "job_id"))
    val present = numbered.fieldNames.toSet
    val fields = graft.model.Schemas.csvFields.map { f =>
      if (present(f)) col(f) else lit(null).cast("string").as(f)
    }
    byFile.join(pathJobs, Seq("__path"))
      .select(col("row_number") +: col("job_id").cast(IntegerType) +: fields: _*)
  }
}
