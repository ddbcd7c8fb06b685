package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Recon unhealthy-containers CSV export job manager — the async export
 * ladder of `recon/.../api/ExportJobManager.java` and the
 * `/containers/unhealthy/export` routes of
 * `recon/.../api/ContainerEndpoint.java:522-661`:
 *
 *  - submit (`ExportJobManager.submitJob:131-170`): the state param is
 *    validated against `ContainerSchemaDefinition.UnHealthyContainerStates`
 *    first (`ContainerEndpoint.startExport:552-558` → 400 INVALID_STATE);
 *    then, under one queue lock, a job whose state already has a tracked
 *    job in QUEUED / RUNNING / COMPLETED is refused (DUPLICATE_STATE —
 *    FAILED jobs do NOT block resubmission, :146-153); then the queue
 *    capacity check (`jobQueue.size() >= maxQueueSize` → QUEUE_FULL,
 *    :155-158; the queue holds QUEUED jobs only — a RUNNING job was
 *    dequeued by `executeExport:252-255`); an accepted job reports its
 *    1-indexed queue position = queue size after insert (:160-163).
 *  - status (`getExportStatus:580-597`): unknown id → NOT_FOUND; a QUEUED
 *    job carries its live queue position (`getQueuePosition:184-199`,
 *    insertion order), every other status reports position 0.
 *  - download (`downloadExport:605-655`): unknown id → NOT_FOUND; not yet
 *    COMPLETED → NOT_COMPLETED (409); the per-job download budget
 *    (`ExportJob.tryReserveDownload` CAS, maxDownloads) exhausted →
 *    LIMIT_REACHED (429); else DOWNLOAD_OK with the remaining budget
 *    after this reservation.
 *  - cancel (`cancelJob:206-241`): unknown id → NOT_FOUND; QUEUED/RUNNING
 *    jobs are cancelled (future.cancel + FAILED "Cancelled by user");
 *    COMPLETED/FAILED jobs are deleted with their TAR file. Both rungs
 *    evict the job from the tracker.
 *
 * The fold evaluates a request batch against one tracker snapshot (the
 * lock makes real submissions sequential; nothing dequeues mid-batch
 * because the single worker is busy). In-batch interactions that ARE
 * modeled: a later submit of a state an earlier batch submit ACCEPTED is
 * DUPLICATE_STATE; one whose earlier twin was refused QUEUE_FULL is
 * refused QUEUE_FULL again (a refused job is never tracked, and fullness
 * is monotone within the batch); capacity consumed by earlier accepted
 * submits counts against later ones (a running count in request order).
 *
 * Scale shape: pure control-plane — two literal fixtures, broadcast
 * joins, and windows over the ≤ dozens-of-rows request batch (the
 * no-partition windows run over the bounded batch, never data-plane
 * rows).
 */
object ReconJobs {
  private val ValidStates = Seq("MISSING", "EMPTY_MISSING",
    "UNDER_REPLICATED", "OVER_REPLICATED", "MIS_REPLICATED",
    "ALL_REPLICAS_BAD", "NEGATIVE_SIZE", "REPLICA_MISMATCH")

  /** Tracker snapshot: insertion order, id, state, status, downloads so
    * far. job3 is the only QUEUED job → queue size 1, position 1. */
  private def trackedJobs(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "job1", "MISSING", "COMPLETED", 1L),
      (2L, "job2", "UNDER_REPLICATED", "RUNNING", 0L),
      (3L, "job3", "OVER_REPLICATED", "QUEUED", 0L),
      (4L, "job4", "MIS_REPLICATED", "FAILED", 0L),
      (5L, "job5", "EMPTY_MISSING", "COMPLETED", 2L))
      .toDF("job_idx", "job_id", "state", "status", "download_count")
  }

  private def requests(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "SUBMIT", "ALL_REPLICAS_BAD"),
      (2L, "SUBMIT", "MISSING"),
      (3L, "SUBMIT", "UNDER_REPLICATED"),
      (4L, "SUBMIT", "MIS_REPLICATED"),
      (5L, "SUBMIT", "NEGATIVE_SIZE"),
      (6L, "SUBMIT", "ALL_REPLICAS_BAD"),
      (7L, "SUBMIT", "NEGATIVE_SIZE"),
      (8L, "SUBMIT", "BAD_STATE"),
      (9L, "SUBMIT", "REPLICA_MISMATCH"),
      (10L, "STATUS", "job3"),
      (11L, "STATUS", "job2"),
      (12L, "STATUS", "job4"),
      (13L, "STATUS", "job9"),
      (14L, "DOWNLOAD", "job1"),
      (15L, "DOWNLOAD", "job5"),
      (16L, "DOWNLOAD", "job2"),
      (17L, "DOWNLOAD", "job8"),
      (18L, "CANCEL", "job3"),
      (19L, "CANCEL", "job2"),
      (20L, "CANCEL", "job1"),
      (21L, "CANCEL", "job4"),
      (22L, "CANCEL", "job7"))
      .toDF("req_id", "op", "arg")
  }

  def exportJobLadder(spark: SparkSession,
                      maxQueueSize: Int = 3,
                      maxDownloads: Int = 2): DataFrame =
    exportJobLadderOver(trackedJobs(spark), requests(spark),
      maxQueueSize, maxDownloads)

  /** Ladder body over caller-supplied tracker snapshot + request batch —
    * the property census drives this with randomized fixtures. */
  def exportJobLadderOver(tracked: DataFrame, reqs: DataFrame,
                          maxQueueSize: Int,
                          maxDownloads: Int): DataFrame = {
    val spark = tracked.sparkSession
    import spark.implicits._
    val valid = ValidStates.toDF("vstate")

    // snapshot facts: QUEUED-only queue size + per-QUEUED-job position
    val q0 = tracked.filter(col("status") === "QUEUED").count()
    val queuePos = tracked.filter(col("status") === "QUEUED")
      .withColumn("qpos",
        row_number().over(Window.partitionBy(lit(0)).orderBy("job_idx")))
      .select(col("job_id").as("arg"), col("qpos"))
    val activeStates = tracked
      .filter(col("status").isin("QUEUED", "RUNNING", "COMPLETED"))
      .select(col("state").as("arg"), lit(1).as("dup_tracked")).distinct()

    val base = reqs
      .join(broadcast(valid.select(col("vstate").as("arg"),
        lit(1).as("is_valid"))), Seq("arg"), "left")
      .join(broadcast(activeStates), Seq("arg"), "left")
      .join(broadcast(tracked.select(col("job_id").as("arg"), col("status"),
        col("download_count"))), Seq("arg"), "left")
      .join(broadcast(queuePos), Seq("arg"), "left")

    // submit rungs: candidate = valid new state, first occurrence in the
    // batch; running candidate count in request order drives capacity
    val wBatchState = Window.partitionBy(col("op"), col("arg"))
      .orderBy("req_id")
    val wRun = Window.partitionBy(col("op")).orderBy("req_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val submits = base.filter(col("op") === "SUBMIT")
      .withColumn("is_cand", col("is_valid") === 1 &&
        col("dup_tracked").isNull &&
        row_number().over(wBatchState) === 1)
      .withColumn("k", sum(when(col("is_cand"), 1L).otherwise(0L))
        .over(wRun))
      .withColumn("accepted", col("is_cand") && lit(q0) + col("k")
        <= maxQueueSize)
    // a non-first duplicate inherits its first occurrence's fate
    val firstFate = submits.filter(col("is_cand"))
      .select(col("arg"), col("accepted").as("first_accepted"))
    val submitV = submits
      .join(broadcast(firstFate), Seq("arg"), "left")
      .withColumn("verdict",
        when(col("is_valid").isNull, lit("INVALID_STATE"))
          .when(col("dup_tracked") === 1, lit("DUPLICATE_STATE"))
          .when(!col("is_cand"),
            when(col("first_accepted"), lit("DUPLICATE_STATE"))
              .otherwise(lit("QUEUE_FULL")))
          .when(col("accepted"), lit("ACCEPTED"))
          .otherwise(lit("QUEUE_FULL")))
      .withColumn("queue_position",
        when(col("verdict") === "ACCEPTED", lit(q0) + col("k"))
          .otherwise(lit(0L)))
      .withColumn("downloads_left", lit(0L))

    val statusV = base.filter(col("op") === "STATUS")
      .withColumn("verdict",
        when(col("status").isNull, lit("NOT_FOUND"))
          .otherwise(col("status")))
      .withColumn("queue_position",
        when(col("status") === "QUEUED", col("qpos").cast("long"))
          .otherwise(lit(0L)))
      .withColumn("downloads_left", lit(0L))

    val downloadV = base.filter(col("op") === "DOWNLOAD")
      .withColumn("verdict",
        when(col("status").isNull, lit("NOT_FOUND"))
          .when(col("status") =!= "COMPLETED", lit("NOT_COMPLETED"))
          .when(col("download_count") >= maxDownloads,
            lit("LIMIT_REACHED"))
          .otherwise(lit("DOWNLOAD_OK")))
      .withColumn("queue_position", lit(0L))
      .withColumn("downloads_left",
        when(col("verdict") === "DOWNLOAD_OK",
          lit(maxDownloads.toLong) - col("download_count") - 1L)
          .otherwise(lit(0L)))

    val cancelV = base.filter(col("op") === "CANCEL")
      .withColumn("verdict",
        when(col("status").isNull, lit("NOT_FOUND"))
          .when(col("status").isin("QUEUED", "RUNNING"), lit("CANCELLED"))
          .otherwise(lit("DELETED")))
      .withColumn("queue_position", lit(0L))
      .withColumn("downloads_left", lit(0L))

    val out = Seq("req_id", "op", "arg", "verdict", "queue_position",
      "downloads_left")
    submitV.select(out.map(col): _*)
      .unionByName(statusV.select(out.map(col): _*))
      .unionByName(downloadV.select(out.map(col): _*))
      .unionByName(cancelV.select(out.map(col): _*))
      .orderBy("req_id")
  }
}
