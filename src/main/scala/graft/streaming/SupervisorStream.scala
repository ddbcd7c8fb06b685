package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/**
 * Streamed DN replication-supervisor admission — the incremental dual of
 * [[graft.operators.ClusterHealth.replicationSupervisorFold]]
 * (`container-service/.../replication/ReplicationSupervisor.java`):
 * command events arrive as a stream and the supervisor's admission state
 * — the in-flight identity set and its size — is carried as GroupState
 * across micro-batches. The queue is a single global structure on the
 * datanode, so the stream keys on the supervisor instance (one group);
 * the state is BOUNDED by maxQueueSize (the reference's own cap), which
 * is what makes a single-group fold safe. Events inside a micro-batch
 * are sorted by seq (the §2.9 ordered-replay contract).
 *
 * Verdicts match the batch fold exactly: QUEUE_FULL before the dedup
 * (queueHasRoomFor runs first, :270-286), DEDUPED on an in-flight
 * (kind, container) identity (:306-309), then the run rungs — expired
 * deadline, stale SCM term, and the task outcome.
 */
object SupervisorStream {

  final case class SupState(inFlight: Set[String], admitted: Int)

  final case class TaskRow(seq: Long, kind: String, container_id: Long,
                           verdict: String)

  val EventSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType.fromDDL(
      "seq BIGINT, kind STRING, container_id BIGINT, " +
        "deadline_passed BOOLEAN, task_term BIGINT, outcome STRING")

  /** Drain `srcDir` (parquet command events) with AvailableNow; append
    * per-event verdict rows to `outDir` after every micro-batch. */
  def supervisorStream(spark: SparkSession, srcDir: String, outDir: String,
                       checkpointDir: String, maxQueueSize: Int = 100,
                       currentTerm: Long = 5L): Unit = {
    import spark.implicits._
    val q = spark.readStream
      .schema(EventSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
      .as[(Long, String, Long, Boolean, Long, String)]
      .groupByKey(_ => "supervisor")
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: String, rows: Iterator[(Long, String, Long, Boolean, Long, String)],
         state: GroupState[SupState]) => {
          var s = state.getOption.getOrElse(SupState(Set.empty, 0))
          val out = scala.collection.mutable.ArrayBuffer.empty[TaskRow]
          rows.toSeq.sortBy(_._1).foreach {
            case (seq, kind, cid, deadlinePassed, term, outcome) =>
              val id = s"$kind#$cid"
              val verdict =
                if (s.admitted >= maxQueueSize) "QUEUE_FULL"
                else if (s.inFlight.contains(id)) "DEDUPED"
                else {
                  s = SupState(s.inFlight + id, s.admitted + 1)
                  if (deadlinePassed) "TIMEOUT"
                  else if (term < currentTerm) "STALE_TERM"
                  else outcome
                }
              out += TaskRow(seq, kind, cid, verdict)
          }
          state.update(s)
          out.iterator
        })
      .toDF()
      .writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").parquet(outDir); ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
