package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/**
 * Streamed datanode-report ingestion — the incremental dual of
 * [[graft.operators.Lifecycle.replicaHistoryStats]] (Recon's
 * ContainerEndpoint replica first/last-seen history,
 * `recon/.../api/ContainerEndpoint.java:330-345`): replica reports arrive
 * as a stream and the per-(container, datanode) stats — report count,
 * first/last seen — are maintained as typed GroupState across
 * micro-batches instead of being recomputed from the full history each
 * time. The state holds only ORDER-INDEPENDENT stats (count / min /
 * max), so the view is exact under ANY file-arrival order — no ordering
 * assumption at all. The max-gap staleness signal inherently needs the
 * ordered series; that stays a batch query over the full history
 * (replicaHistoryStats).
 *
 * Scale shape: state is one tiny record per (container, datanode) — the
 * replica-map cardinality, control-plane-sized — and each micro-batch
 * touches only the groups it carries; the fold over a group's slice is a
 * running min/max, no buffering.
 */
object ReportStream {

  final case class ReplicaSeen(container_id: Long, datanode: String,
                               n_reports: Long, first_seen: Long,
                               last_seen: Long)

  val ReportsSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType.fromDDL(
      "container_id BIGINT, datanode STRING, ts BIGINT")

  /** Drain `srcDir` (parquet report rows) with AvailableNow; after every
    * micro-batch append the UPDATED groups' current stats to `outDir` —
    * the latest row per group is the live view. */
  def replicaSeenStream(spark: SparkSession, srcDir: String,
                        outDir: String, checkpointDir: String): Unit = {
    import spark.implicits._
    val q = spark.readStream
      .schema(ReportsSchema)
      .option("maxFilesPerTrigger", 2)
      .parquet(srcDir)
      .as[(Long, String, Long)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (key: (Long, String), rows: Iterator[(Long, String, Long)],
         state: GroupState[ReplicaSeen]) => {
          var s = state.getOption.getOrElse(
            ReplicaSeen(key._1, key._2, 0L, Long.MaxValue, Long.MinValue))
          rows.foreach { r =>
            s = s.copy(
              n_reports = s.n_reports + 1,
              first_seen = math.min(s.first_seen, r._3),
              last_seen = math.max(s.last_seen, r._3))
          }
          state.update(s)
          Iterator.single(s)
        })
      .toDF()
      .writeStream
      .outputMode(OutputMode.Update)
      // file sinks are append-only: land each micro-batch's UPDATED rows
      // via foreachBatch; the view resolves latest-per-group below
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").parquet(outDir); ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** The live view from the update log: latest emitted row per group. */
  def replicaSeenView(spark: SparkSession, outDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("container_id", "datanode")
      .orderBy(col("n_reports").desc)
    spark.read.parquet(outDir)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .orderBy("container_id", "datanode")
  }
}
