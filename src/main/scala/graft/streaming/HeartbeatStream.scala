package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/**
 * Streamed datanode heartbeat-health ingestion — the incremental dual of
 * [[graft.operators.ClusterHealth.nodeHealthFold]] (NodeStateManager,
 * `server-scm/.../node/NodeStateManager.java:700-1000`): REGISTER / HB
 * events and the global checkNodesHealth ticks arrive as a stream and
 * each node's (health, lastHeartbeat, lastHealthCheck, layout) tuple is
 * carried as typed GroupState across micro-batches instead of being
 * re-folded from the whole event history. Every applied-or-skipped tick
 * after a node's registration emits the same row the batch fold derives.
 *
 * Unlike the ACK stream (order-independent set union), this fold is
 * order-DEPENDENT — the SCM heartbeat plane is a seq-ordered WAL, so the
 * stream consumes time-ordered micro-batches (the §2.9 "ordered replay"
 * contract of the change stream; within a batch rows are sorted by ts).
 *
 * Scale shape: state is one ~4-field record per datanode (control-plane
 * cardinality); ticks are protocol events on the same keyed stream, so
 * no broadcast state is needed at all.
 */
object HeartbeatStream {

  final case class NodeHealth(uuid: String, state: String, last_hb: Long,
                              last_chk: Long, mlv: Long)

  final case class CheckRow(uuid: String, check_ms: Long, skipped: Int,
                            state_before: String, state_after: String,
                            last_hb_ms: Long, fired: String)

  val EventSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType.fromDDL(
      "uuid STRING, ts_ms BIGINT, kind STRING, mlv BIGINT")

  /** Net result of one applied tick from the pre-tick state — the two
    * sequential captured-status updates of checkNodesHealth collapse to
    * this (timeout beats the layout move because the second update keys
    * the state machine on the CAPTURED state). Returns (state, fired). */
  def applyTick(state: String, lastHb: Long, mlv: Long, t: Long,
                scmMlv: Long, staleMs: Long, deadMs: Long,
                gate: Boolean): (String, String) = {
    val stale = lastHb < t - staleMs
    val dead = lastHb < t - deadMs
    state match {
      case "HEALTHY" =>
        val mism = gate && mlv != scmMlv
        val next = if (stale) "STALE"
          else if (mism) "HEALTHY_READONLY" else "HEALTHY"
        val fired = (if (mism) Seq("HEALTHY_READONLY_NODE") else Nil) ++
          (if (stale) Seq("STALE_NODE") else Nil)
        (next, fired.mkString(","))
      case "HEALTHY_READONLY" =>
        val matched = mlv == scmMlv
        val next = if (stale) "STALE"
          else if (matched) "HEALTHY" else "HEALTHY_READONLY"
        val fired =
          (if (matched) Seq("HEALTHY_READONLY_TO_HEALTHY_NODE") else Nil) ++
            (if (stale) Seq("STALE_NODE") else Nil)
        (next, fired.mkString(","))
      case "STALE" =>
        if (dead) ("DEAD", "DEAD_NODE")
        else if (!stale) ("HEALTHY_READONLY", "HEALTHY_READONLY_NODE")
        else ("STALE", "")
      case _ =>
        if (!stale) ("HEALTHY_READONLY", "HEALTHY_READONLY_NODE")
        else ("DEAD", "")
    }
  }

  /** Fold one event into the carried state; CHECK events after
    * registration emit a row. Pre-registration ticks still advance
    * lastHealthCheck (scheduleNextHealthCheck runs either way), and the
    * shouldSkipCheck JVM-pause guard skips ticks arriving
    * ≥ min(staleMs, deadMs) after the previous one. */
  def stepEvent(s: NodeHealth, ts: Long, kind: String, mlv: Long,
                scmMlv: Long, staleMs: Long, deadMs: Long,
                gate: Boolean): (NodeHealth, Option[CheckRow]) =
    kind match {
      case "REGISTER" =>
        val st = if (gate && mlv != scmMlv) "HEALTHY_READONLY"
          else "HEALTHY"
        (s.copy(state = st, last_hb = ts, mlv = mlv), None)
      case "HB" => (s.copy(last_hb = ts, mlv = mlv), None)
      case _ =>
        val skipped = ts - s.last_chk >= math.min(staleMs, deadMs)
        val s1 = s.copy(last_chk = ts)
        if (s.state.isEmpty) (s1, None)
        else if (skipped)
          (s1, Some(CheckRow(s.uuid, ts, 1, s.state, s.state,
            s.last_hb, "")))
        else {
          val (next, fired) = applyTick(s.state, s.last_hb, s.mlv, ts,
            scmMlv, staleMs, deadMs, gate)
          (s1.copy(state = next),
            Some(CheckRow(s.uuid, ts, 0, s.state, next, s.last_hb,
              fired)))
        }
    }

  /** Drain `srcDir` (parquet REGISTER/HB/CHECK rows, CHECK rows already
    * crossed onto each node as in the batch fold) with AvailableNow;
    * after every micro-batch append the ticks' rows to `outDir`. */
  def nodeHealthStream(spark: SparkSession, srcDir: String, outDir: String,
                       checkpointDir: String, scmMlv: Long = 3L,
                       staleMs: Long = 300000L, deadMs: Long = 600000L,
                       finalizationGate: Boolean = true): Unit = {
    import spark.implicits._
    val q = spark.readStream
      .schema(EventSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
      .as[(String, Long, String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (uuid: String, rows: Iterator[(String, Long, String, Long)],
         state: GroupState[NodeHealth]) => {
          var s = state.getOption.getOrElse(
            NodeHealth(uuid, "", -1L, 0L, -1L))
          val out = scala.collection.mutable.ArrayBuffer.empty[CheckRow]
          rows.toSeq.sortBy(r => (r._2, r._3, r._4)).foreach { r =>
            val (s2, row) = stepEvent(s, r._2, r._3, r._4, scmMlv,
              staleMs, deadMs, finalizationGate)
            s = s2
            row.foreach(out += _)
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
