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
}
