package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/**
 * Streamed deleted-block ACK ingestion — the incremental dual of
 * [[graft.operators.ClusterHealth.blockAckFold]]
 * (SCMDeletedBlockTransactionStatusManager.commitTransactions,
 * `server-scm/.../block/SCMDeletedBlockTransactionStatusManager.java:541-608`):
 * datanode delete-block ACKs arrive as a stream and each txn's commit
 * status — PURGED only when the acked set CONTAINS the container's whole
 * replica set and reaches the required count — is maintained as typed
 * GroupState instead of being re-folded from the full ack history every
 * micro-batch. Failed ACKs are counted and never enter the set; the
 * state is ORDER-INDEPENDENT (set union), so the view is exact under any
 * arrival order.
 *
 * Scale shape: state is one small record per in-flight txn (the deletion
 * backlog, bounded by the deletion-service queue) holding at most the
 * replica-set-sized dn list; the replica map itself is a control-plane
 * dim passed as a broadcast-sized closure.
 */
object AckStream {

  final case class TxnAcks(txn_id: Long, container_id: Long,
                           acked_csv: String, n_failed: Long,
                           status: String)

  val AcksSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType.fromDDL(
      "txn_id BIGINT, datanode STRING, success BOOLEAN")

  /** Classify a txn from its acked-dn set against the container's replica
    * set — the same superset-purge rule as the batch fold. */
  def classify(acked: Set[String], replicas: Set[String],
               required: Int): String = {
    val nCommitted = acked.size
    if (math.min(replicas.size, nCommitted) >= required) {
      if (replicas.subsetOf(acked)) "PURGED" else "WAITING_ALL_REPLICAS"
    } else "PENDING"
  }

  /** Drain `srcDir` (parquet ack rows) with AvailableNow; after every
    * micro-batch append the UPDATED txns' status to `outDir`. The
    * replica map (container → replica dns) is control-plane-sized and
    * ships in the closure. */
  def ackStatusStream(spark: SparkSession, srcDir: String, outDir: String,
                      checkpointDir: String,
                      replicaMap: Map[Long, Set[String]],
                      required: Int = 3): Unit = {
    import spark.implicits._
    val q = spark.readStream
      .schema(AcksSchema)
      .option("maxFilesPerTrigger", 2)
      .parquet(srcDir)
      .as[(Long, String, Boolean)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (txn: Long, rows: Iterator[(Long, String, Boolean)],
         state: GroupState[TxnAcks]) => {
          val cid = (txn / 10) % 1000
          var s = state.getOption.getOrElse(
            TxnAcks(txn, cid, "", 0L, "PENDING"))
          var acked = if (s.acked_csv.isEmpty) Set.empty[String]
            else s.acked_csv.split(",").toSet
          rows.foreach { r =>
            if (r._3) acked += r._2
            else s = s.copy(n_failed = s.n_failed + 1)
          }
          val reps = replicaMap.getOrElse(cid, Set.empty)
          s = s.copy(acked_csv = acked.toSeq.sorted.mkString(","),
            status = classify(acked, reps, required))
          state.update(s)
          Iterator.single(s)
        })
      .toDF()
      .writeStream
      .outputMode(OutputMode.Update)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").parquet(outDir); ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** The live view from the update log: latest emitted row per txn (the
    * acked set only grows, so the longest csv is the newest). */
  def ackStatusView(spark: SparkSession, outDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("txn_id")
      .orderBy(length(col("acked_csv")).desc, col("n_failed").desc)
    spark.read.parquet(outDir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
      .orderBy("txn_id")
  }
}
