package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import graft.io.TableStore
import graft.ingest.CsvSource
import graft.model.Schemas.JobStatus
import graft.pipeline.{Lifecycle, Router}

/** Structured Streaming dispatch shell (SURVEY.md §2.10, §3.1 step 1).
  *
  * The reference long-polls SQS one message at a time (consumer.py:55-111).
  * Spark has no built-in SQS source, so the sanctioned bridge (SURVEY.md
  * §7.4) is a message FILE stream: an SQS drainer (or any producer) appends
  * JSON-lines job messages to a directory; `readStream.text` tails it with
  * exactly-once file tracking via the checkpoint. PRODUCER CONTRACT: files
  * must APPEAR atomically (write to a temp name, then rename into the
  * directory) — Spark's file source lists a file once and can observe a
  * partial write otherwise. Everything downstream of a
  * message is the bounded batch pipeline, dispatched per micro-batch through
  * `foreachBatch`.
  *
  * Delivery contract kept from the reference (README ADR-001):
  *   - at-least-once + idempotent pipeline => replay is a no-op
  *     (COMPLETED short-circuit + row-hash anti-join J1)
  *   - malformed JSON = poison pill, dropped immediately with a dead-letter
  *     record (consumer.py:180-190)
  *   - processing errors do NOT ack: the job stays in its prior state and
  *     the failure is recorded for redelivery/inspection (consumer.py:164-176)
  */
object JobDispatch {

  /** SQS body schema: {"job_id": int, "s3_key": string} (consumer.py:131-136). */
  val messageSchema: StructType = StructType(Seq(
    StructField("job_id", IntegerType),
    StructField("s3_key", StringType)))

  /** S2: parse + classify raw message bodies.
    * Returns columns: body, job_id, s3_key, disposition
    * (VALID | POISON_MALFORMED | POISON_MISSING_FIELD). */
  def parseMessages(raw: DataFrame, bodyCol: String = "value"): DataFrame = {
    // PERMISSIVE from_json yields a struct of nulls (not a null struct) for
    // garbage input; the corrupt-record column is the reliable malformed
    // signal, distinguishing poison pills (dropped, consumer.py:180-190)
    // from valid JSON missing required fields (error path).
    val schemaWithCorrupt = messageSchema.add("_corrupt", StringType)
    val parsed = raw.withColumn("msg",
      from_json(col(bodyCol), schemaWithCorrupt,
        Map("columnNameOfCorruptRecord" -> "_corrupt")))
    parsed.select(
      col(bodyCol).as("body"),
      col("msg.job_id").as("job_id"),
      col("msg.s3_key").as("s3_key"),
      when(col("msg").isNull || col("msg._corrupt").isNotNull, lit("POISON_MALFORMED"))
        .when(col("msg.job_id").isNull || col("msg.s3_key").isNull, lit("POISON_MISSING_FIELD"))
        .otherwise(lit("VALID"))
        .as("disposition"))
  }

  /** Outcome of one processed message (driver-side record). */
  case class MessageOutcome(job_id: Option[Int], body: String, outcome: String, detail: String)

  /** Process one micro-batch of raw message bodies against the store.
    * Message cardinality is jobs-per-trigger (control plane, not data
    * plane), so collecting the parsed batch to the driver is correct — the
    * DATA each message fans out to (the CSV, the staging set) stays fully
    * distributed inside the Lifecycle plans. */
  def processBatch(
      spark: SparkSession,
      store: TableStore,
      batch: DataFrame,
      resolveCsv: String => String): Seq[MessageOutcome] = {
    val messages = parseMessages(batch).collect()
    messages.toSeq.map { m =>
      val body = m.getAs[String]("body")
      m.getAs[String]("disposition") match {
        case "POISON_MALFORMED" =>
          MessageOutcome(None, body, "DROPPED_POISON", "malformed JSON")
        case "POISON_MISSING_FIELD" =>
          MessageOutcome(Option(m.getAs[Integer]("job_id")).map(_.toInt), body,
            "DROPPED_POISON", "missing job_id/s3_key")
        case _ =>
          val jobId = m.getAs[Int]("job_id")
          val s3Key = m.getAs[String]("s3_key")
          try processOne(spark, store, jobId, s3Key, resolveCsv)
          catch {
            case e: Exception =>
              if (sys.env.contains("GRAFT_DISPATCH_DEBUG")) e.printStackTrace()
              // Not acked in the reference (visibility timeout redelivers);
              // here the file-source offset IS committed, so the failure is
              // recorded for an external retry queue. Job state was set to
              // FAILED by processOne's error path.
              MessageOutcome(Some(jobId), body, "FAILED", String.valueOf(e.getMessage))
          }
      }
    }
  }

  private def emptyLike(spark: SparkSession, schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Route + run one job message end-to-end (the reference's
    * Processor.process_job, §2.11 flow router). */
  def processOne(
      spark: SparkSession,
      store: TableStore,
      jobId: Int,
      s3Key: String,
      resolveCsv: String => String): MessageOutcome = {
    import graft.model.Schemas

    val jobs = if (store.exists("jobs")) store.load("jobs") else null
    val jobRow = Option(jobs).flatMap(_.filter(col("job_id") === jobId).collect().headOption)
    val jobStatus = jobRow.map(_.getAs[String]("job_status"))
    val userId = jobRow.map(_.getAs[String]("job_user_id")).getOrElse("")

    def tbl(name: String, schema: StructType): DataFrame =
      if (store.exists(name)) store.load(name) else emptyLike(spark, schema)
    val staging = tbl("staging", stagingShape)
    val hasStaging = store.exists("staging") &&
      !staging.filter(col("staging_job_id") === jobId).isEmpty

    Router.route(jobStatus, hasStaging) match {
      case Router.SkipMissingJob =>
        MessageOutcome(Some(jobId), s3Key, "SKIPPED", "job not found (stale message)")
      case Router.SkipCompleted =>
        MessageOutcome(Some(jobId), s3Key, "SKIPPED", "job already COMPLETED")
      case route =>
        setJobStatus(store, jobId, JobStatus.Processing)
        try {
          val issues = tbl("issues", issuesShape)
          val items = tbl("issue_items", itemsShape)
          val contacts = tbl("contacts", contactsShape)
          val result = route match {
            case Router.Reprocessing =>
              Lifecycle.reprocess(
                staging.filter(col("staging_job_id") === jobId),
                issues.filter(col("issues_job_id") === jobId),
                items.filter(col("issues_job_id") === jobId),
                contacts, jobId, userId)
            case _ =>
              val input = CsvSource.toContract(CsvSource.read(spark, resolveCsv(s3Key)))
              Lifecycle.initialProcess(
                input, jobId, userId,
                staging.filter(col("staging_job_id") === jobId),
                issues.filter(col("issues_job_id") === jobId),
                items.filter(col("issues_job_id") === jobId),
                contacts)
          }
          // Per-job commit: normalize THIS job's result rows to the canonical
          // table shapes (columns absent from a result frame become typed
          // nulls) and replace only this job's partitions. Other jobs' files
          // are never rewritten, and their rows never flow through this
          // job's plan — at 100 TB a message commit touches one partition,
          // not the corpus.
          def norm(df: DataFrame, shape: StructType): DataFrame =
            df.select(shape.fields.toSeq.map(f =>
              (if (df.columns.contains(f.name)) col(f.name).cast(f.dataType)
               else lit(null).cast(f.dataType)).as(f.name)): _*)
          // Counters must materialize BEFORE the commit: their plan reads the
          // pre-commit table snapshots, which the commit replaces — a
          // post-commit collect() hits deleted files from the second job of a
          // session onward. (The contacts append runs first for the same
          // reason: its plan reads the pre-commit staging snapshot.)
          val c = result.counters.collect().head
          store.append("contacts", result.newContacts)
          store.overwritePartitionsAll(Seq(
            graft.io.PartitionCommit("staging", norm(result.staging, stagingShape),
              "staging_job_id", jobId),
            graft.io.PartitionCommit("issues", norm(result.issues, issuesShape),
              "issues_job_id", jobId),
            graft.io.PartitionCommit("issue_items", norm(result.issueItems, itemsShape),
              "issues_job_id", jobId)))
          // W7/W8 last (crash-repairable): status + counters in one 1-row update.
          updateJob(store, jobId, result.jobStatus,
            totalRows = c.getAs[Long]("total_rows"),
            processedRows = c.getAs[Long]("total_rows"), // all rows seen (processor.py:313-330)
            issueCount = c.getAs[Long]("unresolved_issues"))
          MessageOutcome(Some(jobId), s3Key, result.jobStatus, "ok")
        } catch {
          case e: Exception =>
            setJobStatus(store, jobId, JobStatus.Failed)
            throw e
        }
    }
  }

  /** Add any missing metadata columns as typed nulls (seed jobs tables can
    * stay minimal; columns appear on first use). */
  private def ensureCols(df: DataFrame, cols: Seq[(String, String)]): DataFrame =
    cols.foldLeft(df) { case (d, (name, dt)) =>
      if (d.columns.contains(name)) d else d.withColumn(name, lit(null).cast(dt))
    }

  /** W7: single-row job status update (driver-side; 1-row table op).
    * Entering PROCESSING stamps `job_process_start` and CLEARS
    * `job_process_end` — a restarted job must not carry the previous cycle's
    * end time (processor.py:143, job_repository.py:58-61). */
  def setJobStatus(store: TableStore, jobId: Int, status: String): Unit =
    if (store.exists("jobs")) {
      val jobs = ensureCols(store.load("jobs"),
        Seq("job_process_start" -> "timestamp", "job_process_end" -> "timestamp"))
      val isJob = col("job_id") === jobId
      val entering = status == JobStatus.Processing
      store.overwrite("jobs", jobs
        .withColumn("job_status", when(isJob, lit(status)).otherwise(col("job_status")))
        .withColumn("job_process_start",
          if (entering) when(isJob, current_timestamp()).otherwise(col("job_process_start"))
          else col("job_process_start"))
        .withColumn("job_process_end",
          if (entering) when(isJob, lit(null).cast("timestamp")).otherwise(col("job_process_end"))
          else col("job_process_end")))
    }

  /** W7+W8: status + progress counters + process_end in one update
    * (processor.py:313-330, job_repository.py:32-110). Metadata columns are
    * created on first use so seed jobs tables can stay minimal. */
  def updateJob(
      store: TableStore, jobId: Int, status: String,
      totalRows: Long, processedRows: Long, issueCount: Long): Unit = {
    if (!store.exists("jobs")) return
    val jobs = ensureCols(store.load("jobs"),
      Seq("job_total_rows" -> "long", "job_processed_rows" -> "long",
        "job_issue_count" -> "long", "job_process_end" -> "timestamp"))
    val isJob = col("job_id") === jobId
    store.overwrite("jobs", jobs
      .withColumn("job_status", when(isJob, lit(status)).otherwise(col("job_status")))
      .withColumn("job_total_rows", when(isJob, lit(totalRows)).otherwise(col("job_total_rows")))
      .withColumn("job_processed_rows", when(isJob, lit(processedRows)).otherwise(col("job_processed_rows")))
      .withColumn("job_issue_count", when(isJob, lit(issueCount)).otherwise(col("job_issue_count")))
      .withColumn("job_process_end",
        when(isJob && lit(status == graft.model.Schemas.JobStatus.Completed), current_timestamp())
          .otherwise(col("job_process_end"))))
  }

  /** Start the dispatch stream over a message QUEUE directory (one file per
    * message) via the native [[graft.stream.queue.QueueSourceProvider]]
    * source — full reference delivery protocol: messages are DELETED only
    * when the epoch commits (ack-on-success, consumer.py:152-156), and a
    * failed/interrupted epoch leaves them visible for redelivery on restart
    * (the visibility-timeout analog, consumer.py:171-177). Use [[start]] for
    * the simpler exactly-once JSON-lines file bridge. */
  def startQueue(
      spark: SparkSession,
      store: TableStore,
      queueDir: String,
      checkpointDir: String,
      resolveCsv: String => String,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery = {
    spark.readStream
      .format("graft-queue")
      .load(queueDir)
      .writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val outcomes = processBatch(spark, store, batch.select("value"), resolveCsv)
        outcomes.foreach(o => println(s"[dispatch] $o"))
      }
      .start()
  }

  /** Start the dispatch stream over a JSON-lines message directory. */
  def start(
      spark: SparkSession,
      store: TableStore,
      messagesDir: String,
      checkpointDir: String,
      resolveCsv: String => String,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery = {
    spark.readStream
      .text(messagesDir)
      .writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val outcomes = processBatch(spark, store, batch, resolveCsv)
        outcomes.foreach(o => println(s"[dispatch] $o"))
      }
      .start()
  }

  // Canonical runtime table shapes: used for absent tables (first message
  // ever) and as the DDL contract for SQL-backed stores — a JdbcTableStore
  // deployment creates its tables from exactly these (see
  // [[tableShapes]] and JdbcLifecycleSpec).
  private val stagingShape = StructType(Seq(
    StructField("staging_id", org.apache.spark.sql.types.LongType),
    StructField("staging_job_id", IntegerType),
    StructField("staging_email", StringType),
    StructField("staging_first_name", StringType),
    StructField("staging_last_name", StringType),
    StructField("staging_company", StringType),
    StructField("staging_status", StringType),
    StructField("staging_row_hash", StringType)))
  private val issuesShape = StructType(Seq(
    StructField("issues_job_id", IntegerType),
    StructField("issue_type", StringType),
    StructField("issue_key", StringType),
    StructField("issue_description", StringType),
    StructField("issue_resolved", org.apache.spark.sql.types.BooleanType),
    StructField("issue_resolved_at", org.apache.spark.sql.types.TimestampType),
    StructField("issue_resolved_by", StringType),
    StructField("issue_resolution_comment", StringType)))
  private val itemsShape = StructType(Seq(
    StructField("issues_job_id", IntegerType),
    StructField("issue_type", StringType),
    StructField("issue_key", StringType),
    StructField("item_staging_id", org.apache.spark.sql.types.LongType)))
  private val contactsShape = StructType(Seq(
    StructField("staging_id", org.apache.spark.sql.types.LongType),
    StructField("contacts_user_id", StringType),
    StructField("contact_email", StringType),
    StructField("contact_first_name", StringType),
    StructField("contact_last_name", StringType),
    StructField("contact_company", StringType)))

  /** The canonical store-table shapes the dispatch pipeline reads/commits —
    * the DDL contract for a SQL-backed (DDL-managed) TableStore. */
  val tableShapes: Map[String, StructType] = Map(
    "staging" -> stagingShape,
    "issues" -> issuesShape,
    "issue_items" -> itemsShape,
    "contacts" -> contactsShape)
}
