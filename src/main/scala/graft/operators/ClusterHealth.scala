package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * SCM/Recon cluster-health plane: per-datanode usage, pipeline health, the
 * container-balancer pre-plan, and the deleted-directory purge backlog.
 *
 * References: NodeEndpoint.java / DatanodeMetadata.java:34-93 /
 * DatanodeStorageReport.java:27-36 (datanode page), PipelineEndpoint.java /
 * PipelineMetadata.java:35-67 (pipeline page),
 * ContainerBalancerTask.java:549-607,1109-1142 (balancer selection math),
 * OMDBDefinition.java:110,267-273 (deletedDirectoryTable).
 *
 * Scale shape: the node/pipeline catalogs are control-plane-sized (10^3-10^4
 * rows on any real cluster), so every join here broadcasts them; the only
 * data-plane inputs — `replicas` (per-container) and `objects` (per-key) —
 * are aggregated DOWN to per-datanode / per-directory rows BEFORE touching a
 * catalog, exactly one shuffle each, never the other way around.
 */
object ClusterHealth {

  /** Per-datanode usage + load: storage report columns, integer-basis-point
    * utilization ((capacity-remaining)*10000 DIV capacity — the scaled twin
    * of DatanodeUsageInfo.calculateUtilization), container count from the
    * replica map and pipeline membership count. */
  def datanodeUsage(datanodes: DataFrame, replicas: DataFrame,
                    pipelineMembers: DataFrame): DataFrame = {
    val perDnContainers = replicas
      .groupBy(col("datanode").as("uuid"))
      .agg(countDistinct("container_id").as("containers"))
    val perDnPipelines = pipelineMembers
      .groupBy(col("datanode").as("uuid"))
      .agg(count(lit(1)).as("pipelines"))
    datanodes
      .join(perDnContainers, Seq("uuid"), "left")
      .join(perDnPipelines, Seq("uuid"), "left")
      .select(col("uuid"), col("hostname"), col("rack"), col("state"),
        col("op_state"), col("last_heartbeat_ms"), col("capacity"),
        col("used"), col("remaining"), col("committed"),
        expr("(capacity - remaining) * 10000 DIV capacity")
          .as("utilization_bp"),
        coalesce(col("containers"), lit(0L)).as("containers"),
        coalesce(col("pipelines"), lit(0L)).as("pipelines"))
      .orderBy("uuid")
  }

  /** Pipeline health: metadata + live-container count (containers map to
    * pipelines by `container_id % 12`, the fixture's SCM pipeline map) +
    * a health verdict — OPEN with a leader, or OPEN EC (leaderless by
    * design), is healthy. */
  def pipelineHealth(pipelines: DataFrame,
                     containersScm: DataFrame): DataFrame = {
    val perPipeline = containersScm
      .filter(col("state") =!= "DELETED")
      .groupBy((col("container_id") % 12).as("pipeline_idx"))
      .agg(count(lit(1)).as("container_count"))
    pipelines
      .join(perPipeline, Seq("pipeline_idx"), "left")
      .select(col("pipeline_id"), col("replication"), col("state"),
        col("leader_node"), col("num_datanodes"),
        col("last_leader_election_ms"), col("leader_elections"),
        coalesce(col("container_count"), lit(0L)).as("container_count"),
        (col("state") === "OPEN" &&
          (col("leader_node").isNotNull ||
            col("replication").startsWith("EC/"))).as("healthy"))
      .orderBy("pipeline_id")
  }

  /**
   * Container-balancer pre-plan — ContainerBalancerTask.java:549-607: only
   * healthy IN_SERVICE nodes participate; cluster average utilization is
   * (Σcapacity - Σremaining)/Σcapacity (calculateAvgUtilization:1127-1142);
   * a node is OVER_UTILIZED above avg+threshold, UNDER_UTILIZED below
   * avg-threshold; move_bytes is the ratioToBytes(:1109-1117) gap back to
   * the nearest limit. All math in integer basis points (DIV), so the
   * oracle reproduces it exactly.
   */
  def balancerPlan(datanodes: DataFrame,
                   thresholdBp: Long = 1000L): DataFrame = {
    val eligible = datanodes
      .filter(col("state") === "HEALTHY" && col("op_state") === "IN_SERVICE")
      .withColumn("utilization_bp",
        expr("(capacity - remaining) * 10000 DIV capacity"))
    val stats = eligible.agg(
      expr("(sum(capacity) - sum(remaining)) * 10000 DIV sum(capacity)")
        .as("avg_utilization_bp"))
    eligible.crossJoin(broadcast(stats))
      .withColumn("upper_bp", col("avg_utilization_bp") + thresholdBp)
      .withColumn("lower_bp", col("avg_utilization_bp") - thresholdBp)
      .withColumn("action",
        when(col("utilization_bp") > col("upper_bp"), lit("OVER_UTILIZED"))
          .when(col("utilization_bp") < col("lower_bp"),
            lit("UNDER_UTILIZED"))
          .otherwise(lit("WITHIN_THRESHOLD")))
      .withColumn("move_bytes",
        when(col("utilization_bp") > col("upper_bp"),
          expr("capacity * utilization_bp DIV 10000 - capacity * upper_bp DIV 10000"))
          .when(col("utilization_bp") < col("lower_bp"),
            expr("capacity * lower_bp DIV 10000 - capacity * utilization_bp DIV 10000"))
          .otherwise(lit(0L)))
      .select("uuid", "rack", "capacity", "utilization_bp",
        "avg_utilization_bp", "action", "move_bytes")
      .orderBy(col("utilization_bp").desc, col("uuid"))
  }

  /**
   * SCM deleted-block transaction backlog per container — ref
   * DeletedBlockLogImpl.java:159-166 (a transaction is {txID, containerID,
   * block list, retry count}) and the retry bookkeeping around :149-155 /
   * :386-451 (transactions past the retry budget stop being re-sent):
   * one transaction per DELETE commit in the log, block count from the
   * deleted key's chunk layout (Tables.LocChunkBytes blocks, the same
   * layout `locations` explodes). The per-container rollup is what SCM
   * hands each datanode as its deletion work queue.
   */
  def blockDeletionBacklog(objects: DataFrame,
                           maxRetry: Int = 3): DataFrame =
    CommitLog.synthesizeLog(objects)
      .filter(col("op") === "DELETE")
      .withColumn("blocks",
        expr(s"(data_size - 1) DIV ${graft.core.Tables.LocChunkBytes} + 1"))
      .withColumn("retry_count", col("object_id") % 5)
      .groupBy("container_id")
      .agg(count(lit(1)).as("pending_txns"),
        sum("blocks").as("pending_blocks"),
        sum("data_size").as("pending_bytes"),
        sum(when(col("retry_count") > maxRetry, 1L).otherwise(0L))
          .as("expired_txns"))
      .orderBy("container_id")

  /**
   * Recon /blocks/deletePending page — BlocksEndPoint.getBlocksPendingDeletion
   * (recon/.../api/BlocksEndPoint.java:89-155): walk the SCM deletedBlocks
   * table in txID order with a prevKey resume (seek + skip-exact ⇒ strictly
   * greater), tag each transaction with its container's CURRENT state, and
   * stop the WHOLE walk once any one state's list reaches the limit (the
   * reference breaks out of the iterator, so later txns of OTHER states are
   * cut too — the page boundary is a single txID watermark, not a per-state
   * top-N). Synthetic duplicate txn rows canonicalize to one value per txID
   * (a KV table has one row per key), like listOpenFiles.
   *
   * Scale shape: the backlog table is bounded by the deletion queue, and
   * the page is limit-bounded; one row_number window partitioned by state
   * (≤ a handful of container states) + a scalar cutoff broadcast. The
   * container-state tag is a broadcast of the SCM container catalog
   * projection.
   */
  /** SCM deletedBlocks transactions — the commit log's DELETE branch as
    * the txn table (txID = the deleted key's object_id), KV-canonical:
    * one row per txID. Shared by the pending-deletion page and the ack
    * fold. */
  private def deletedBlockTxns(objects: DataFrame): DataFrame =
    CommitLog.synthesizeLog(objects)
      .filter(col("op") === "DELETE")
      .groupBy(col("object_id").as("txn_id"))
      .agg(max("data_size").as("data_size"))
      .withColumn("container_id", expr("(txn_id DIV 10) % 1000"))

  def blocksPendingDeletionPage(objects: DataFrame, containersScm: DataFrame,
                                prevTxn: Long, limit: Int): DataFrame = {
    val txns = deletedBlockTxns(objects)
      .withColumn("local_id_count",
        expr(s"(data_size - 1) DIV ${graft.core.Tables.LocChunkBytes} + 1"))
      .join(broadcast(containersScm.select("container_id", "state")),
        Seq("container_id"))
      .filter(col("txn_id") > prevTxn)
    val ranked = txns.withColumn("rn",
      row_number().over(Window.partitionBy("state").orderBy("txn_id")))
    val cutoff = ranked
      .agg(min(when(col("rn") === limit, col("txn_id"))).as("cut"))
    ranked.crossJoin(broadcast(cutoff))
      .filter(col("txn_id") <= coalesce(col("cut"), lit(Long.MaxValue)))
      .select("state", "txn_id", "container_id", "local_id_count")
      .orderBy("txn_id")
  }

  /**
   * Deleted-block txn ACK fold — SCMDeletedBlockTransactionStatusManager
   * .commitTransactions (server-scm/.../block/
   * SCMDeletedBlockTransactionStatusManager.java:541-608): datanodes ack
   * each txn's block deletions; failed acks are counted and skipped, and
   * a txn is PURGED from the log only when
   *   min(|current replicas|, |acked datanodes|) >= requiredNodes AND
   *   the acked set CONTAINS every current replica's datanode (:576-588)
   * — so an under-replicated container (|replicas| < required) can never
   * purge its txns until re-replication, and an ack set that counts to
   * quorum through a STALE datanode (one no longer holding a replica)
   * waits for the real replica set (WAITING_ALL_REPLICAS here). Ack
   * synthesis per txn over its container's replica set: txn%3==1 misses
   * the lexicographically-last datanode's ack, txn%3==2 has the first
   * datanode FAIL its ack, txn%7==0 adds a foreign dn99 ack (a moved
   * replica's late response — counts toward quorum, never toward the
   * superset).
   *
   * Scale shape: the replica catalog broadcasts into the txn scan; one
   * hash aggregation keyed by txn. No window, no driver loop.
   */
  def blockAckFold(objects: DataFrame, replicas: DataFrame,
                   requiredNodes: Int = 3): DataFrame =
    blockAckDecide(deletedBlockTxns(objects), replicas, requiredNodes)

  /** The ACK-fold decision core over an explicit txn set — injectable so
    * the property spec can drive it with randomized txn/replica states
    * (same refactor shape as underReplicationDecide). */
  private[graft] def blockAckDecide(txns: DataFrame, replicas: DataFrame,
                                    requiredNodes: Int): DataFrame = {
    val rdns = replicas.select("container_id", "datanode")
    val bounds = rdns.groupBy("container_id")
      .agg(max("datanode").as("max_dn"), min("datanode").as("min_dn"))
    val perReplica = txns
      .join(broadcast(rdns), Seq("container_id"))
      .join(broadcast(bounds), Seq("container_id"))
      .withColumn("acked",
        !(col("txn_id") % 3 === 1 && col("datanode") === col("max_dn")))
      .withColumn("success",
        col("acked") &&
          !(col("txn_id") % 3 === 2 && col("datanode") === col("min_dn")))
    perReplica.groupBy("txn_id", "container_id")
      .agg(count(lit(1)).as("n_replicas"),
        sum(when(col("success"), 1L).otherwise(0L)).as("n_replica_acks"),
        sum(when(!col("success"), 1L).otherwise(0L)).as("n_missing"))
      .withColumn("n_committed",
        col("n_replica_acks") +
          when(col("txn_id") % 7 === 0, 1L).otherwise(0L))
      .withColumn("status",
        when(least(col("n_replicas"), col("n_committed")) >= requiredNodes,
          when(col("n_missing") === 0, lit("PURGED"))
            .otherwise(lit("WAITING_ALL_REPLICAS")))
          .otherwise(lit("PENDING")))
      .select("txn_id", "container_id", "n_replicas", "n_committed",
        "n_missing", "status")
      .orderBy("txn_id")
  }

  /**
   * Ratis/THREE pipeline-creation placement — PipelinePlacementPolicy
   * (server-scm/.../pipeline/PipelinePlacementPolicy.java:103-380):
   * viable nodes are HEALTHY, IN_SERVICE, have space for the Raft
   * metadata + one container's data, and sit under the per-node
   * non-closed Ratis/THREE pipeline limit (:103-113 filterPipelineLimit,
   * sorted ASCENDING by that count — least-engaged first); then the
   * topology walk (:295-380): the least-engaged viable node anchors, the
   * second comes from a DIFFERENT rack (rack-awareness), and the third
   * prefers the anchor's rack, falls back to the second node's rack, and
   * finally to any viable node. Per-node verdict output; the pick order
   * ties break by node name after pipeline count (the reference's
   * SortedList insertion order made stable).
   *
   * Scale shape: the node catalog and pipeline map are control-plane
   * dims; counts are one broadcast hash agg, each pick an orderBy-limit-1
   * over the viable set, stitched back with one broadcast join.
   */
  def pipelineCreatePlan(datanodes: DataFrame, pipelines: DataFrame,
                         pipelineMembers: DataFrame,
                         metaBytes: Long = 1000000000L,
                         dataBytes: Long = 700000000000L,
                         pipelineLimit: Int = 2): DataFrame = {
    val counts = pipelineMembers
      .join(broadcast(pipelines
        .filter(col("replication") === "RATIS/THREE" &&
          col("state") =!= "CLOSED")
        .select("pipeline_id")), Seq("pipeline_id"))
      .groupBy("datanode").agg(count(lit(1)).as("pcount"))
    val nodes = datanodes
      .join(broadcast(counts), col("uuid") === col("datanode"), "left")
      .drop("datanode")
      .withColumn("pcount", coalesce(col("pcount"), lit(0L)))
      .withColumn("verdict0",
        when(col("state") =!= "HEALTHY", lit("EXCLUDED_HEALTH"))
          .when(col("op_state") =!= "IN_SERVICE", lit("EXCLUDED_OP_STATE"))
          .when(col("remaining") < metaBytes + dataBytes,
            lit("EXCLUDED_SPACE"))
          .when(col("pcount") >= pipelineLimit,
            lit("EXCLUDED_PIPELINE_LIMIT"))
          .otherwise(lit("VIABLE")))
    // The three picks in ONE window pass (the node catalog is a
    // control-plane dim — whole-frame windows are the cheap path here;
    // the earlier orderBy().limit(1) chain re-evaluated the viable set
    // four times and cost ~3 s of pure stage scheduling at any SF):
    // cumulative-count-of-qualifying-rows == 1 selects the first row of
    // each pick's order without re-scanning.
    val wAll = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wPick = Window.partitionBy(lit(1)).orderBy("pcount", "uuid")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val staged = nodes
      .withColumn("viab", col("verdict0") === "VIABLE")
      .withColumn("vrk",
        sum(when(col("viab"), 1L).otherwise(0L)).over(wPick))
      .withColumn("is_anchor", col("viab") && col("vrk") === 1)
      .withColumn("a_uuid", max(when(col("is_anchor"), col("uuid")))
        .over(wAll))
      .withColumn("a_rack", max(when(col("is_anchor"), col("rack")))
        .over(wAll))
      .withColumn("sec_q", col("viab") && col("rack") =!= col("a_rack"))
      .withColumn("srk",
        sum(when(col("sec_q"), 1L).otherwise(0L)).over(wPick))
      .withColumn("is_second", col("sec_q") && col("srk") === 1)
      .withColumn("n_rack", max(when(col("is_second"), col("rack")))
        .over(wAll))
      .withColumn("pref",
        when(col("rack") === col("a_rack"), 0)
          .when(col("rack") === col("n_rack"), 1).otherwise(2))
      .withColumn("t_q",
        col("viab") && col("uuid") =!= col("a_uuid") && !col("is_second"))
    val wThird = Window.partitionBy(lit(1))
      .orderBy("pref", "pcount", "uuid")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    staged
      .withColumn("trk",
        sum(when(col("t_q"), 1L).otherwise(0L)).over(wThird))
      .withColumn("is_third", col("t_q") && col("trk") === 1)
      .withColumn("verdict",
        when(col("is_anchor"), lit("ANCHOR"))
          .when(col("is_second"), lit("SECOND_DIFF_RACK"))
          .when(col("is_third") && col("pref") === 0,
            lit("THIRD_ANCHOR_RACK"))
          .when(col("is_third") && col("pref") === 1,
            lit("THIRD_NEXT_RACK"))
          .when(col("is_third"), lit("THIRD_FALLBACK"))
          .when(col("viab"), lit("VIABLE_UNUSED"))
          .otherwise(col("verdict0")))
      .select("uuid", "rack", "pcount", "remaining", "verdict")
      .orderBy("uuid")
  }

  /**
   * Pipeline scrubber — PipelineManagerImpl.scrubPipelines
   * (server-scm/.../pipeline/PipelineManagerImpl.java:623-671):
   *   1. pipelines stuck ALLOCATED past the allocation timeout never got
   *      their Ratis ring up ⇒ CLOSE_AND_DELETE;
   *   2. CLOSED pipelines past the destroy timeout are garbage ⇒ DELETE;
   *   3. OPEN pipelines holding UNREGISTERED nodes ⇒ CLOSE
   *      (isOpenWithUnregisteredNodes:678-689 — a stopped datanode plus
   *      an SCM restart; Ratis rings self-close when surviving members
   *      re-register, EC rings never would, so the scrubber must) —
   *      modeled as a DEAD member node (gone from the node manager);
   *   4. else RETAIN.
   * Scrub-view mints (mirrored in the oracle): pipeline_idx % 5 == 3 is
   * the ALLOCATED band; creation = NOW − idx·1h, state-enter =
   * creation + 10 min.
   *
   * Scale shape: the pipeline map and node dim are control-plane —
   * one broadcast member probe + a per-pipeline any() aggregate.
   */
  def pipelineScrub(pipelines: DataFrame, pipelineMembers: DataFrame,
                    datanodes: DataFrame, nowMs: Long = 1700000000000L,
                    allocTimeoutMs: Long = 18000000L,
                    deleteTimeoutMs: Long = 14400000L): DataFrame = {
    val unreg = pipelineMembers
      .join(broadcast(datanodes.select(col("uuid").as("datanode"),
        col("state").as("node_state"))), Seq("datanode"))
      .groupBy("pipeline_id")
      .agg(max(when(col("node_state") === "DEAD", 1L).otherwise(0L))
        .as("has_unregistered"))
    pipelines
      .withColumn("scrub_state",
        when(col("pipeline_idx") % 5 === 3, lit("ALLOCATED"))
          .otherwise(col("state")))
      .withColumn("creation_ms", lit(nowMs) - col("pipeline_idx") * 3600000L)
      .withColumn("state_enter_ms", col("creation_ms") + 600000L)
      .join(broadcast(unreg), Seq("pipeline_id"), "left")
      .withColumn("verdict",
        when(col("scrub_state") === "ALLOCATED" &&
          lit(nowMs) - col("creation_ms") >= allocTimeoutMs,
          lit("CLOSE_AND_DELETE"))
          .when(col("scrub_state") === "CLOSED" &&
            lit(nowMs) - col("state_enter_ms") >= deleteTimeoutMs,
            lit("DELETE"))
          .when(col("scrub_state") === "OPEN" &&
            coalesce(col("has_unregistered"), lit(0L)) === 1L,
            lit("CLOSE"))
          .otherwise(lit("RETAIN")))
      .select("pipeline_id", "scrub_state", "replication", "verdict")
      .orderBy("pipeline_id")
  }

  /**
   * Container lifecycle state-machine fold — ContainerStateManagerImpl
   * (server-scm/.../container/ContainerStateManagerImpl.java:174-217):
   * the SCM lifecycle DAG OPEN →FINALIZE→ CLOSING →{QUASI_CLOSE→
   * QUASI_CLOSED | CLOSE→ CLOSED}, QUASI_CLOSED →FORCE_CLOSE→ CLOSED,
   * {QUASI_CLOSED, CLOSED} →DELETE→ DELETING →CLEANUP→ DELETED, plus the
   * explicit idempotent self-loops (:193-206 — a replayed FINALIZE at any
   * later state is a no-op, etc.). Any other (state, event) pair throws
   * InvalidStateTransitionException, which updateContainerState logs and
   * IGNORES (:428-431) — the stream continues from the unchanged state.
   * The nuance worth probing: CLOSE is NOT legal at QUASI_CLOSED (only
   * FORCE_CLOSE closes a quasi-closed container), yet CLOSE IS an
   * idempotent no-op at CLOSED.
   *
   * Scale shape: per-container event lists are protocol-short; one
   * groupBy collects them and a codegen'd higher-order `aggregate`
   * prefix-fold derives each event's pre-state — no window recursion, no
   * driver loop.
   */
  def containerLifecycleFold(events: DataFrame): DataFrame = {
    val step = (s: String, e: String) =>
      s"""CASE
         |  WHEN $e = 'FINALIZE' AND $s = 'OPEN' THEN 'CLOSING'
         |  WHEN $e = 'QUASI_CLOSE' AND $s = 'CLOSING'
         |    THEN 'QUASI_CLOSED'
         |  WHEN $e = 'CLOSE' AND $s = 'CLOSING' THEN 'CLOSED'
         |  WHEN $e = 'FORCE_CLOSE' AND $s = 'QUASI_CLOSED' THEN 'CLOSED'
         |  WHEN $e = 'DELETE' AND $s IN ('QUASI_CLOSED', 'CLOSED')
         |    THEN 'DELETING'
         |  WHEN $e = 'CLEANUP' AND $s = 'DELETING' THEN 'DELETED'
         |  ELSE $s END""".stripMargin
    val idempotent =
      (col("event") === "FINALIZE" && col("state_before").isin(
        "CLOSING", "QUASI_CLOSED", "CLOSED", "DELETING", "DELETED")) ||
      (col("event") === "QUASI_CLOSE" && col("state_before").isin(
        "QUASI_CLOSED", "CLOSED", "DELETING", "DELETED")) ||
      (col("event").isin("CLOSE", "FORCE_CLOSE") &&
        col("state_before").isin("CLOSED", "DELETING", "DELETED")) ||
      (col("event") === "DELETE" && col("state_before").isin(
        "DELETING", "DELETED")) ||
      (col("event") === "CLEANUP" && col("state_before") === "DELETED")
    events.groupBy("container_id")
      .agg(expr("sort_array(collect_list(struct(seq, event)))").as("evs"))
      .select(col("container_id"), col("evs"),
        posexplode(col("evs")).as(Seq("pos", "ev")))
      .withColumn("seq", col("ev.seq"))
      .withColumn("event", col("ev.event"))
      .withColumn("state_before", expr(
        "aggregate(transform(slice(evs, 1, pos), x -> x.event), " +
          s"'OPEN', (s, e) -> ${step("s", "e")})"))
      .withColumn("state_after",
        expr(step("state_before", "event")))
      .withColumn("outcome",
        when(col("state_after") =!= col("state_before"),
          lit("TRANSITIONED"))
          .when(idempotent, lit("IDEMPOTENT_NOOP"))
          .otherwise(lit("INVALID_IGNORED")))
      .select("container_id", "seq", "event", "state_before",
        "state_after", "outcome")
      .orderBy("container_id", "seq")
  }

  /**
   * Datanode heartbeat health fold — NodeStateManager
   * (server-scm/.../node/NodeStateManager.java:700-1000): the SCM's
   * health plane replayed as a per-node prefix fold over an interleaved
   * stream of REGISTER / HB events and the global checkNodesHealth
   * ticks (:806-880).
   *
   * Reference semantics carried exactly:
   *   - registration seeds lastHeartbeat AND the health state — a
   *     layout-mismatched registrant starts HEALTHY_READONLY
   *     (newNodeStatus:333-347);
   *   - each tick computes healthyDeadline = T − staleMs and
   *     staleDeadline = T − deadMs (:827-840) and walks the DAG
   *     (:241-281): HEALTHY —TIMEOUT→ STALE —TIMEOUT→ DEAD;
   *     HEALTHY ⇄ HEALTHY_READONLY on LAYOUT_MISMATCH / LAYOUT_MATCH
   *     (mismatch additionally gated on the finalization checkpoint,
   *     :213-216); RESTORE and RESURRECT both land on HEALTHY_READONLY
   *     — never straight on HEALTHY (the hysteresis: promotion needs a
   *     LATER tick to observe the layout match);
   *   - within one tick the two updates run SEQUENTIALLY against the
   *     status captured at tick start (:846-876), so a HEALTHY node
   *     that is both layout-mismatched and stale fires
   *     HEALTHY_READONLY_NODE then STALE_NODE and nets STALE — same
   *     for HEALTHY_READONLY with match+timeout;
   *   - a tick arriving ≥ min(staleMs, deadMs) after the previous tick
   *     is SKIPPED wholesale (shouldSkipCheck:934-940 — a JVM pause
   *     makes heartbeat age unreliable), but still advances
   *     lastHealthCheck (scheduleNextHealthCheck:923-930 runs either
   *     way);
   *   - a DEAD node whose last heartbeat falls in the stale window
   *     stays DEAD (RESURRECT needs the healthy window);
   *   - fired events follow state2EventMap (:228-236): STALE_NODE,
   *     DEAD_NODE, HEALTHY_READONLY_NODE,
   *     HEALTHY_READONLY_TO_HEALTHY_NODE.
   *
   * Emits one row per (node, applied-or-skipped tick) after the node's
   * registration.
   *
   * Scale shape: the node dim is control-plane and the tick schedule is
   * bounded by the replay window, so per-node event lists stay
   * protocol-short; one groupBy per node and a codegen'd higher-order
   * `aggregate` prefix-fold — no window recursion, no driver loop.
   */
  def nodeHealthFold(nodeEvents: DataFrame, checks: DataFrame,
                     scmMlv: Long = 3L, staleMs: Long = 300000L,
                     deadMs: Long = 600000L,
                     finalizationGate: Boolean = true): DataFrame = {
    val minChk = math.min(staleMs, deadMs)
    val gate = if (finalizationGate) "TRUE" else "FALSE"
    // Net state of one applied tick, from the pre-tick accumulator `s`
    // at tick time `t` (the two sequential captured-status updates of
    // checkNodesHealth collapse to this: timeout wins over the layout
    // move because the second update keys the SM on the CAPTURED state).
    def net(s: String, t: String): String =
      s"""CASE $s.state
         |  WHEN 'HEALTHY' THEN CASE
         |    WHEN $s.last_hb < $t - ${staleMs}L THEN 'STALE'
         |    WHEN $gate AND $s.mlv <> ${scmMlv}L THEN 'HEALTHY_READONLY'
         |    ELSE 'HEALTHY' END
         |  WHEN 'HEALTHY_READONLY' THEN CASE
         |    WHEN $s.last_hb < $t - ${staleMs}L THEN 'STALE'
         |    WHEN $s.mlv = ${scmMlv}L THEN 'HEALTHY'
         |    ELSE 'HEALTHY_READONLY' END
         |  WHEN 'STALE' THEN CASE
         |    WHEN $s.last_hb < $t - ${deadMs}L THEN 'DEAD'
         |    WHEN $s.last_hb >= $t - ${staleMs}L THEN 'HEALTHY_READONLY'
         |    ELSE 'STALE' END
         |  ELSE CASE
         |    WHEN $s.last_hb >= $t - ${staleMs}L THEN 'HEALTHY_READONLY'
         |    ELSE 'DEAD' END
         |END""".stripMargin
    def pack(st: String, hb: String, chk: String, mlv: String): String =
      s"named_struct('state', $st, 'last_hb', $hb, 'last_chk', $chk, " +
        s"'mlv', $mlv)"
    val step = (s: String, e: String) =>
      s"""CASE
         |  WHEN $e.kind = 'REGISTER' THEN ${pack(
        s"CASE WHEN $gate AND $e.mlv <> ${scmMlv}L " +
          s"THEN 'HEALTHY_READONLY' ELSE 'HEALTHY' END",
        s"$e.ts_ms", s"$s.last_chk", s"$e.mlv")}
         |  WHEN $e.kind = 'HB' THEN ${pack(
        s"$s.state", s"$e.ts_ms", s"$s.last_chk", s"$e.mlv")}
         |  WHEN $s.state = '' OR $e.ts_ms - $s.last_chk >= ${minChk}L
         |    THEN ${pack(s"$s.state", s"$s.last_hb", s"$e.ts_ms",
        s"$s.mlv")}
         |  ELSE ${pack(net(s, s"$e.ts_ms"), s"$s.last_hb", s"$e.ts_ms",
        s"$s.mlv")}
         |END""".stripMargin
    val zero = "named_struct('state', '', 'last_hb', -1L, " +
      "'last_chk', 0L, 'mlv', -1L)"
    val roster = nodeEvents.filter(col("kind") === "REGISTER")
      .select("uuid").distinct()
    val all = nodeEvents.select("uuid", "ts_ms", "kind", "mlv")
      .unionByName(roster.crossJoin(checks.select(
        col("check_ms").as("ts_ms")))
        .withColumn("kind", lit("CHECK"))
        .withColumn("mlv", lit(-1L))
        .select("uuid", "ts_ms", "kind", "mlv"))
    val stale = col("pre.last_hb") < col("ts_ms") - staleMs
    val dead = col("pre.last_hb") < col("ts_ms") - deadMs
    val mism = lit(finalizationGate) && col("pre.mlv") =!= scmMlv
    val matched = col("pre.mlv") === scmMlv
    all.groupBy("uuid")
      .agg(expr("sort_array(collect_list(struct(ts_ms, kind, mlv)))")
        .as("evs"))
      .select(col("uuid"), col("evs"),
        posexplode(col("evs")).as(Seq("pos", "ev")))
      .filter(col("ev.kind") === "CHECK")
      .withColumn("ts_ms", col("ev.ts_ms"))
      .withColumn("pre", expr(
        s"aggregate(slice(evs, 1, pos), $zero, " +
          s"(s, e) -> ${step("s", "e")})"))
      .filter(col("pre.state") =!= "")
      .withColumn("skipped",
        (col("ts_ms") - col("pre.last_chk") >= minChk).cast("int"))
      .withColumn("state_before", col("pre.state"))
      .withColumn("state_after", when(col("skipped") === 1,
        col("state_before")).otherwise(expr(net("pre", "ts_ms"))))
      .withColumn("fired", when(col("skipped") === 1, lit(""))
        .otherwise(
          when(col("state_before") === "HEALTHY",
            when(mism && stale,
              lit("HEALTHY_READONLY_NODE,STALE_NODE"))
              .when(mism, lit("HEALTHY_READONLY_NODE"))
              .when(stale, lit("STALE_NODE")).otherwise(lit("")))
            .when(col("state_before") === "HEALTHY_READONLY",
              when(matched && stale,
                lit("HEALTHY_READONLY_TO_HEALTHY_NODE,STALE_NODE"))
                .when(matched, lit("HEALTHY_READONLY_TO_HEALTHY_NODE"))
                .when(stale, lit("STALE_NODE")).otherwise(lit("")))
            .when(col("state_before") === "STALE",
              when(dead, lit("DEAD_NODE"))
                .when(!stale, lit("HEALTHY_READONLY_NODE"))
                .otherwise(lit("")))
            .otherwise(when(!stale, lit("HEALTHY_READONLY_NODE"))
              .otherwise(lit("")))))
      .select(col("uuid"), col("ts_ms").as("check_ms"), col("skipped"),
        col("state_before"), col("state_after"),
        col("pre.last_hb").as("last_hb_ms"), col("fired"))
      .orderBy("uuid", "check_ms")
  }

  /**
   * Datanode container dispatch ladder — KeyValueHandler
   * (container-service/.../keyvalue/KeyValueHandler.java) over an op
   * stream with a RUNNING per-container BCSID:
   *   - write ops (WriteChunk/PutBlock) pass checkContainerOpen
   *     (:1357-1394): OPEN/CLOSING/RECOVERING proceed (closing followers
   *     still apply leader transactions), QUASI_CLOSED/CLOSED ⇒
   *     CLOSED_CONTAINER_IO, UNHEALTHY ⇒ CONTAINER_UNHEALTHY, INVALID ⇒
   *     INVALID_CONTAINER_STATE;
   *   - PutBlock replays are fenced by the container BCSID
   *     (BlockManagerImpl.java:190-206): a non-zero bcsId ≤ the
   *     container's ⇒ REPLAY_IGNORED (a Ratis log reapply after
   *     restart); bcsId 0 (a non-Ratis put) skips the fence; applied
   *     puts ADVANCE the container BCSID — later ops see it;
   *   - GetBlock (reads are legal on closed containers): requested
   *     bcsId above the container's ⇒ UNKNOWN_BCSID
   *     (BlockUtils.verifyBCSId:221-234), a missing block ⇒
   *     NO_SUCH_BLOCK, a stored block older than the requested bcsId ⇒
   *     BCSID_MISMATCH (BlockManagerImpl.getBlock:176-187);
   *   - DeleteBlock ⇒ UNSUPPORTED_OP — datanodes delete blocks only via
   *     the BlockDeletingService (:972-979).
   * The running BCSID needs no fold recursion: an ignored put is by
   * definition ≤ the running max, so max(applied) == max(all gated put
   * bcsIds) and one cumulative window computes it.
   *
   * Scale shape: the container state dim broadcasts; one cumulative
   * window per container over the op stream.
   */
  def dnDispatchLadder(ops: DataFrame, dnContainers: DataFrame): DataFrame = {
    val writeOps = Seq("WRITE_CHUNK", "PUT_BLOCK")
    val wPrev = Window.partitionBy("container_id").orderBy("seq")
      .rowsBetween(Window.unboundedPreceding, -1)
    val gated = ops
      .join(broadcast(dnContainers), Seq("container_id"))
      .withColumn("gate_ok",
        col("cstate").isin("OPEN", "CLOSING", "RECOVERING"))
      .withColumn("put_cand",
        col("op") === "PUT_BLOCK" && col("gate_ok") && col("bcsid") =!= 0)
    gated
      .withColumn("bcs_before",
        greatest(col("initial_bcsid"),
          coalesce(max(when(col("put_cand"), col("bcsid"))).over(wPrev),
            lit(0L))))
      .withColumn("decision",
        when(col("op").isin(writeOps: _*) && !col("gate_ok"),
          when(col("cstate").isin("QUASI_CLOSED", "CLOSED"),
            lit("CLOSED_CONTAINER_IO"))
            .when(col("cstate") === "UNHEALTHY",
              lit("CONTAINER_UNHEALTHY"))
            .when(col("cstate") === "INVALID",
              lit("INVALID_CONTAINER_STATE"))
            .otherwise(lit("CONTAINER_INTERNAL_ERROR")))
          .when(col("op") === "DELETE_BLOCK", lit("UNSUPPORTED_OP"))
          .when(col("op") === "PUT_BLOCK" && col("bcsid") =!= 0 &&
            col("bcsid") <= col("bcs_before"), lit("REPLAY_IGNORED"))
          .when(col("op").isin(writeOps: _*), lit("APPLIED"))
          .when(col("bcsid") > col("bcs_before"), lit("UNKNOWN_BCSID"))
          .when(!col("block_exists"), lit("NO_SUCH_BLOCK"))
          .when(col("stored_bcsid") < col("bcsid"),
            lit("BCSID_MISMATCH"))
          .otherwise(lit("OK")))
      .withColumn("bcs_after",
        when(col("put_cand"), greatest(col("bcs_before"), col("bcsid")))
          .otherwise(col("bcs_before")))
      .select("seq", "container_id", "op", "decision", "bcs_after")
      .orderBy("seq")
  }

  /**
   * Mis-replication copy plan — MisReplicationHandler.processAndSendCommands
   * (server-scm/.../replication/MisReplicationHandler.java:106-160) +
   * SCMCommonPlacementPolicy.replicasToCopyToFixMisreplication (:558-599)
   * under the rack-scatter policy (required racks = min(cluster racks,
   * replicas), max per rack = n/r + min(n%r, 1)):
   *   1. containers with pending replica ops are skipped whole
   *      (:112-117) ⇒ SKIP_PENDING (pending minted on %46 ids);
   *   2. a container must be exactly stable — neither under- nor
   *      over-replicated — before fixing placement (:122-133)
   *      ⇒ SKIP_NOT_STABLE;
   *   3. placement already satisfied ⇒ NOT_MISREPLICATED;
   *   4. else the copy walk: rack groups sorted largest-first, each kept
   *      rack sheds (size − maxPerRack) replicas, chosen from
   *      SOURCE-ELIGIBLE replicas only (CLOSED/QUASI_CLOSED state,
   *      healthy node, IN_SERVICE — filterSources :81-99) in name order
   *      ⇒ COPY; the rest ⇒ STAY. Racks short on copyable replicas
   *      surface the deficit in `shortfall` (:586-594 WARN) — a stale or
   *      decommissioning node can leave a violation unfixable this pass.
   * For stable factor-3 containers the recurrence collapses: with
   * required = 3 the per-rack cap is always 1, so each rack sheds
   * (rack size − 1).
   *
   * Scale shape: node and container dims broadcast; one (container,rack)
   * aggregate joined back; ranks windowed per (container, rack).
   */
  def misReplicationPlan(replicas: DataFrame, datanodes: DataFrame,
                         containersScm: DataFrame,
                         clusterRacks: Int = 5): DataFrame = {
    val dn = datanodes.select(col("uuid").as("datanode"),
      col("state").as("node_state"), col("op_state"))
    val base = replicas
      .join(broadcast(containersScm.filter(col("state") =!= "DELETED")
        .select("container_id", "replication_factor")),
        Seq("container_id"))
      .join(broadcast(dn), Seq("datanode"))
      .withColumn("source_ok",
        col("replica_state").isin("CLOSED", "QUASI_CLOSED") &&
          col("node_state") === "HEALTHY" &&
          col("op_state") === "IN_SERVICE")
    val rackStats = base.groupBy("container_id", "rack")
      .agg(count(lit(1)).as("rack_n"),
        sum(when(col("source_ok"), 1L).otherwise(0L)).as("rack_sources"))
    val contStats = rackStats.groupBy("container_id")
      .agg(count(lit(1)).as("n_racks"), sum("rack_n").as("n_total"),
        sum(greatest(col("rack_n") - 1, lit(0L)) -
          least(greatest(col("rack_n") - 1, lit(0L)), col("rack_sources")))
          .as("shortfall"))
    val wSrc = Window.partitionBy("container_id", "rack")
      .orderBy("datanode")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .join(broadcast(rackStats), Seq("container_id", "rack"))
      .join(broadcast(contStats), Seq("container_id"))
      .withColumn("required",
        least(lit(clusterRacks), col("n_total")))
      .withColumn("src_rank",
        sum(when(col("source_ok"), 1L).otherwise(0L)).over(wSrc))
      .withColumn("verdict",
        when(col("container_id") % 46 === 0, lit("SKIP_PENDING"))
          .when(col("n_total") =!= col("replication_factor"),
            lit("SKIP_NOT_STABLE"))
          .when(col("n_racks") >= col("required"),
            lit("NOT_MISREPLICATED"))
          .when(col("source_ok") &&
            col("src_rank") <= col("rack_n") - 1, lit("COPY"))
          .otherwise(lit("STAY")))
      .withColumn("shortfall",
        when(col("verdict").isin("COPY", "STAY"), col("shortfall"))
          .otherwise(lit(0L)))
      .select("container_id", "datanode", "rack", "verdict", "shortfall")
      .orderBy("container_id", "datanode")
  }

  /**
   * Quasi-closed-stuck replica accounting — QuasiClosedStuckReplicaCount
   * (server-scm/.../replication/QuasiClosedStuckReplicaCount.java:30-245):
   * a quasi-closed container that cannot close keeps data from several
   * origin datanodes; replication targets are PER ORIGIN, not per
   * container. Origins whose healthy replicas carry the cluster-wide
   * maximum BCSID (sequence id) are "best" and target bestOriginCopies
   * (2); every other origin targets otherOriginCopies (1). A
   * SINGLE-origin container targets 3 plain copies. Maintenance rules:
   * multi-origin origins with maintenance copies only need ONE in-service
   * copy (:169-176); single-origin containers need
   * minHealthyForMaintenance (:154-158). Over-replication ignores
   * maintenance copies entirely (:190-218). In-service counting uses the
   * node's persisted op state; health uses the replica state.
   *
   * Fixture derivations (mirrored in the oracle): the stuck set is
   * container_id % 119 == 0; BCSID = container_id*100 + datanode number;
   * the max-name replica re-registered from the min-name origin, and
   * %3==0 containers collapsed to a single origin.
   *
   * Scale shape: one broadcast of the node dim, one groupBy
   * (container, origin) over the stuck subset, a count window per
   * container. No driver loop.
   */
  /** The quasi-closed-stuck replica rows: stuck subset (%119), synthetic
    * per-dn BCSIDs, the moved-copy origin mapping, node classifications.
    * `max_healthy_seq` is NOT attached here — best-origin designation is
    * computed by the consumer over whatever replica subset it works on
    * (the over-handler recomputes it after its node-health filter). */
  private def qcsBase(replicas: DataFrame, datanodes: DataFrame,
                      containersScm: DataFrame): DataFrame = {
    val dn = datanodes.select(col("uuid").as("datanode"), col("op_state"),
      col("state").as("node_state"))
    val stuck = containersScm
      .filter(col("state") =!= "DELETED" && col("container_id") % 119 === 0)
      .select("container_id")
    val wC = Window.partitionBy("container_id")
    replicas
      .join(broadcast(stuck), Seq("container_id"))
      .join(broadcast(dn), Seq("datanode"))
      .withColumn("seq",
        col("container_id") * 100 + substring(col("datanode"), 3, 10)
          .cast("long"))
      .withColumn("min_dn", min("datanode").over(wC))
      .withColumn("max_dn", max("datanode").over(wC))
      .withColumn("origin",
        when(col("container_id") % 3 === 0, col("min_dn"))
          .when(col("datanode") === col("max_dn"), col("min_dn"))
          .otherwise(col("datanode")))
      .withColumn("healthy", col("replica_state") =!= "UNHEALTHY")
      .withColumn("in_service", col("op_state") === "IN_SERVICE")
      .withColumn("maint",
        col("op_state").isin("IN_MAINTENANCE", "ENTERING_MAINTENANCE"))
  }

  /** Per-(container, origin) QCS accounting over prepared base rows —
    * the under/over deltas of QuasiClosedStuckReplicaCount. */
  private[graft] def qcsPerOrigin(baseRows: DataFrame, bestCopies: Int,
                           otherCopies: Int,
                           minHealthyForMaintenance: Int): DataFrame = {
    val wC = Window.partitionBy("container_id")
    val base = baseRows.withColumn("max_healthy_seq",
      max(when(col("healthy"), col("seq"))).over(wC))
    val perOrigin = base.groupBy("container_id", "origin")
      .agg(count(lit(1)).as("n_replicas"),
        sum(when(col("in_service"), 1L).otherwise(0L)).as("n_in_service"),
        sum(when(col("maint"), 1L).otherwise(0L)).as("n_maintenance"),
        max(when(col("healthy") && col("seq") === col("max_healthy_seq"),
          1L).otherwise(0L)).as("is_best_raw"))
      .withColumn("n_origins", count(lit(1)).over(wC))
      .withColumn("is_best", col("is_best_raw") === 1L)
      .withColumn("target",
        when(col("n_origins") === 1, lit(3))
          .when(col("is_best"), lit(bestCopies)).otherwise(lit(otherCopies)))
    perOrigin
      .withColumn("under_delta",
        when(col("n_origins") === 1,
          when(col("n_maintenance") > 0,
            greatest(lit(minHealthyForMaintenance) - col("n_in_service"),
              lit(0L)))
            .otherwise(greatest(lit(3) - col("n_in_service"), lit(0L))))
          .otherwise(
            when(col("n_in_service") < col("target"),
              when(col("n_maintenance") > 0,
                when(col("n_in_service") === 0, lit(1L)).otherwise(lit(0L)))
                .otherwise(col("target") - col("n_in_service")))
              .otherwise(lit(0L))))
      .withColumn("over_delta",
        greatest(col("n_in_service") - col("target"), lit(0L)))
      .withColumn("status",
        when(col("under_delta") > 0, lit("UNDER_REPLICATED"))
          .when(col("over_delta") > 0, lit("OVER_REPLICATED"))
          .otherwise(lit("OK")))
      .select("container_id", "origin", "n_replicas", "n_in_service",
        "n_maintenance", "is_best", "target", "status", "under_delta",
        "over_delta")
  }

  def quasiClosedStuckCount(replicas: DataFrame, datanodes: DataFrame,
                            containersScm: DataFrame,
                            bestCopies: Int = 2, otherCopies: Int = 1,
                            minHealthyForMaintenance: Int = 2): DataFrame =
    qcsPerOrigin(qcsBase(replicas, datanodes, containersScm), bestCopies,
      otherCopies, minHealthyForMaintenance)
      .orderBy("container_id", "origin")

  /**
   * Quasi-closed-stuck under-replication handler —
   * `QuasiClosedStuckUnderReplicationHandler.processAndSendCommands`
   * (`server-scm/.../replication/QuasiClosedStuckUnderReplicationHandler.java:59-148`),
   * folded per stuck container in reference order:
   *   1. all replicas empty ⇒ SKIP_EMPTY (EmptyContainerHandler owns it,
   *      :66-72; the stuck set is all QUASI_CLOSED);
   *   2. ANY pending add ⇒ SKIP_PENDING_ADD (:74-86 — unlike the plain
   *      Ratis handler, a single in-flight add parks the whole
   *      container until it lands);
   *   3. no under-replicated origins ⇒ NOT_UNDER (:93-97);
   *   4. else REPLICATE: each mis-replicated origin contributes
   *      replicaDelta commands, its in-service copies are the sources
   *      (:100-133) — n_required = Σ deltas.
   * Fixture: the QCS base (%119 stuck); even stuck ids (%238) are all
   * empty; %357 carry a pending add.
   */
  def qcsUnderReplicationPlan(replicas: DataFrame, datanodes: DataFrame,
                              containersScm: DataFrame): DataFrame = {
    val base = qcsBase(replicas, datanodes, containersScm)
    val perOrigin = qcsPerOrigin(base, 2, 1, 2)
    val folded = perOrigin.groupBy("container_id")
      .agg(
        sum("under_delta").as("n_required"),
        sum(when(col("under_delta") > 0, 1L).otherwise(0L))
          .as("n_origins_under"))
      .withColumn("all_empty",
        (col("container_id") % 238 === 0).cast("int"))
      .withColumn("n_add",
        when(col("container_id") % 357 === 0, 1L).otherwise(0L))
    folded
      .withColumn("verdict",
        when(col("all_empty") === 1, lit("SKIP_EMPTY"))
          .when(col("n_add") > 0, lit("SKIP_PENDING_ADD"))
          .when(col("n_required") === 0, lit("NOT_UNDER"))
          .otherwise(lit("REPLICATE")))
      .withColumn("n_required",
        when(col("verdict") === "REPLICATE", col("n_required"))
          .otherwise(lit(0L)))
      .withColumn("n_origins_under",
        when(col("verdict") === "REPLICATE", col("n_origins_under"))
          .otherwise(lit(0L)))
      .select("container_id", "verdict", "n_required", "n_origins_under")
      .orderBy("container_id")
  }

  /**
   * Quasi-closed-stuck over-replication handler —
   * `QuasiClosedStuckOverReplicationHandler.processAndSendCommands`
   * (`server-scm/.../replication/QuasiClosedStuckOverReplicationHandler.java:49-120`):
   *   1. ANY pending delete ⇒ SKIP_PENDING_DELETE (:54-64);
   *   2. replicas on non-HEALTHY nodes are dropped BEFORE counting
   *      (:66-77 — a stale node's copy may vanish on its own; removing
   *      a healthy copy alongside could under-replicate);
   *   3. per-origin accounting over the filtered set
   *      (`getOverReplicatedOrigins`, QuasiClosedStuckReplicaCount
   *      .java:190-218 — over-replication ignores maintenance copies);
   *      no over origins ⇒ NOT_OVER;
   *   4. else DELETE: per origin the first replicaDelta copies in
   *      deterministic replica order (:94-107; dn-name order is this
   *      engine's stable equivalent of the hashCode sort).
   * Fixture: the QCS base; even stuck ids (%238) re-register a copy of
   * their second-lowest datanode's replica onto dn(c+9 mod 20) with the
   * same origin and a lower BCSID — a duplicated non-best origin.
   */
  def qcsOverReplicationPlan(replicas: DataFrame, datanodes: DataFrame,
                             containersScm: DataFrame): DataFrame = {
    val base = qcsBase(replicas, datanodes, containersScm)
    // the injected duplicate: the second-lowest dn's replica re-homed on
    // dn(c+9 mod 20) — same origin, lower BCSID, the NEW node's states
    val wC = Window.partitionBy("container_id")
    val newDn = datanodes.select(col("uuid").as("datanode"),
      col("state").as("node_state"),
      (col("op_state") === "IN_SERVICE").as("in_service"),
      col("op_state").isin("IN_MAINTENANCE", "ENTERING_MAINTENANCE")
        .as("maint"))
    val second = base
      .withColumn("rk", row_number().over(wC.orderBy("datanode")))
      .filter(col("rk") === 2 && col("container_id") % 238 === 0)
      .drop("rk", "node_state", "in_service", "maint")
      .withColumn("datanode",
        concat(lit("dn"), ((col("container_id") + 9) % 20).cast("string")))
      .withColumn("seq", col("seq") - 50L)
      .join(broadcast(newDn), Seq("datanode"))
    val withDup = base.unionByName(
      second.select(base.columns.map(col): _*))
    // the handler's node-health filter precedes all counting
    val filtered = withDup.filter(col("node_state") === "HEALTHY")
    val perOrigin = qcsPerOrigin(filtered, 2, 1, 2)
    // per over origin: first over_delta copies in dn order are deleted
    val delPicks = filtered
      .join(perOrigin.filter(col("over_delta") > 0)
        .select("container_id", "origin", "over_delta"),
        Seq("container_id", "origin"))
      .filter(col("in_service"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("container_id", "origin").orderBy("datanode")))
      .filter(col("rk") <= col("over_delta"))
      .groupBy("container_id")
      .agg(count(lit(1)).as("n_commands"),
        concat_ws(",", sort_array(collect_list(col("datanode"))))
          .as("del_dns"))
    val spine = containersScm
      .filter(col("state") =!= "DELETED" && col("container_id") % 119 === 0)
      .select("container_id")
    spine
      .join(broadcast(delPicks), Seq("container_id"), "left")
      .na.fill(0L, Seq("n_commands")).na.fill("", Seq("del_dns"))
      .withColumn("verdict",
        when(col("container_id") % 357 === 0, lit("SKIP_PENDING_DELETE"))
          .when(col("n_commands") > 0, lit("DELETE"))
          .otherwise(lit("NOT_OVER")))
      .withColumn("n_commands",
        when(col("verdict") === "DELETE", col("n_commands"))
          .otherwise(lit(0L)))
      .withColumn("del_dns",
        when(col("verdict") === "DELETE", col("del_dns"))
          .otherwise(lit("")))
      .select("container_id", "verdict", "n_commands", "del_dns")
      .orderBy("container_id")
  }

  /**
   * EC over-replication delete plan — `ECOverReplicationHandler
   * .processAndSendCommands` (`server-scm/.../replication/
   * ECOverReplicationHandler.java:66-190`):
   *   1. replicas on non-HEALTHY or non-IN_SERVICE nodes are filtered
   *      BEFORE any counting (:85-97 — a stale node's copy may vanish
   *      on its own; EcContainerReplicaCount ignores out-of-service
   *      nodes for over-replication anyway);
   *   2. isOverReplicated(false) — pending deletes added back
   *      (ECContainerReplicaCount.java:405-459: an index with >1 copy)
   *      — false ⇒ NOT_OVER;
   *   3. isOverReplicated(true) — pending deletes assumed to complete —
   *      false ⇒ PENDING_FIX (:109-113, "corrected by the pending
   *      delete");
   *   4. candidates = filtered copies not pending delete and
   *      state-CLOSED (:131-136); the removal set comes from
   *      `SCMCommonPlacementPolicy.replicasToRemoveToFixOverreplication`
   *      (:630-688): per over-replicated index (largest count first),
   *      repeatedly shed from the rack currently holding the most
   *      candidate copies; no candidates ⇒ NO_CANDIDATES;
   *   5. the index-count sanity guard (:152-163) refuses a removal that
   *      would drop an index to zero copies.
   * Determinism: the reference polls ties out of a PriorityQueue and
   * `findFirst()` on a HashSet — arbitrary-but-stable; this engine's
   * stable equivalent is (rack count desc, rack name, datanode name).
   * Fixture: ecShards + a second moved-copy family — index 1 of %41 EC
   * containers duplicated on dn(c+16 mod 20) — and a pending delete of
   * that copy on container 533 (the %13∩%41 EC container).
   *
   * Scale shape: per-(container,index) and per-(container,rack) hash
   * aggregates over the shard map; node dim broadcast; no driver loop.
   */
  def ecOverReplicationPlan(ecShards: DataFrame, datanodes: DataFrame,
                            containersScm: DataFrame): DataFrame = {
    val c = col("container_id")
    val dn = datanodes.select(col("uuid").as("datanode"),
      (col("state") === "HEALTHY" && col("op_state") === "IN_SERVICE")
        .as("good"), col("rack"))
    val dup = ecShards.filter(c % 41 === 0 && col("replica_index") === 1)
      .withColumn("datanode",
        concat(lit("dn"), ((c + 16) % 20).cast("string")))
    val all = ecShards.unionByName(dup)
      .join(broadcast(dn), Seq("datanode"))
      .withColumn("pending_del",
        c === 533 && col("datanode") ===
          concat(lit("dn"), ((c + 16) % 20).cast("string")))
    val healthy = all.filter(col("good"))
    val wIdx = Window.partitionBy("container_id", "replica_index")
    val wC = Window.partitionBy("container_id")
    val counted = healthy
      .withColumn("cnt_nodel", count(lit(1)).over(wIdx))
      .withColumn("cnt_del",
        sum(when(!col("pending_del"), 1L).otherwise(0L)).over(wIdx))
      .withColumn("over_nodel",
        max(when(col("cnt_nodel") > 1, 1).otherwise(0)).over(wC))
      .withColumn("over_del",
        max(when(col("cnt_del") > 1, 1).otherwise(0)).over(wC))
    // candidates + rack loading (every candidate copy counts toward its
    // rack, matching placementGroupCntMap)
    val cands = counted
      .filter(!col("pending_del") && col("shard_state") === "CLOSED")
      .withColumn("rack_cnt", count(lit(1)).over(
        Window.partitionBy("container_id", "rack")))
    // per over index: shed from the most-loaded rack, name-ordered
    val picks = cands
      .filter(col("cnt_del") > 1)
      .withColumn("rk", row_number().over(
        wIdx.orderBy(col("rack_cnt").desc, col("rack"), col("datanode"))))
      .withColumn("n_cand_idx", count(lit(1)).over(wIdx))
      .filter(col("rk") <= col("cnt_del") - 1 && col("n_cand_idx") >= 2)
      .groupBy("container_id")
      .agg(count(lit(1)).as("n_commands"),
        concat_ws(",", sort_array(collect_list(col("datanode"))))
          .as("del_dns"))
    val flags = counted.groupBy("container_id")
      .agg(max("over_nodel").as("over_nodel"),
        max("over_del").as("over_del"))
    val spine = containersScm
      .filter(col("state") =!= "DELETED" && (c % 12) % 3 === 2)
      .select("container_id")
    spine
      .join(broadcast(flags), Seq("container_id"), "left")
      .join(broadcast(picks), Seq("container_id"), "left")
      .na.fill(0, Seq("over_nodel", "over_del", "n_commands"))
      .na.fill("", Seq("del_dns"))
      .withColumn("verdict",
        when(col("over_nodel") === 0, lit("NOT_OVER"))
          .when(col("over_del") === 0, lit("PENDING_FIX"))
          .when(col("n_commands") === 0, lit("NO_CANDIDATES"))
          .otherwise(lit("DELETE")))
      .withColumn("n_commands",
        when(col("verdict") === "DELETE", col("n_commands"))
          .otherwise(lit(0L)))
      .withColumn("del_dns",
        when(col("verdict") === "DELETE", col("del_dns"))
          .otherwise(lit("")))
      .select("container_id", "verdict", "n_commands", "del_dns")
      .orderBy("container_id")
  }

  /**
   * EC under-replication repair plan — `ECUnderReplicationHandler
   * .processAndSendCommands` (`server-scm/.../replication/
   * ECUnderReplicationHandler.java:104-230`) with
   * `ECContainerReplicaCount` accounting (ECContainerReplicaCount.java:
   * 84-157 constructor classification — UNHEALTHY copies never count,
   * pending deletes reduce the healthy index counts; :474-492
   * isSufficientlyReplicated — full healthy(+pending-add) index set, or
   * full set with maintenance copies AND ≥ data+remainingMaintenance
   * Redundancy online indexes; :350-377 unavailableIndexes — no healthy
   * copy, not pending add, no maintenance or decommission copy either;
   * :249-302 decommissioning/maintenanceOnlyIndexes — on the leaving map
   * and absent from healthy, minus pending adds; :386-389,594-596
   * additionalMaintenanceCopiesNeeded = maintOnly − (parity −
   * remainingMaintenanceRedundancy)). rs-3-2, rmr = 1. Per container:
   *   - NOT_UNDER / PENDING_FIX from the two sufficiency probes
   *     (:115-125);
   *   - missing indexes: ONE reconstruction command when ≥ data source
   *     indexes exist (:282-292, filterSources :232-266 — CLOSED copies
   *     on healthy nodes not pending delete, one per index), else
   *     NO_SOURCES (:404-410 — the unrecoverable log path);
   *   - decommissioning-only indexes each get a 1:1 copy when their
   *     source survived the filter (:422-470, source==null skips);
   *   - maintenance-only indexes get additionalMaintenanceCopiesNeeded
   *     copies, capped by how many have sources (:509-570 — the loop
   *     decrements only when a command is actually sent).
   * Fixture: ecShards (%31 one missing index, %37 three missing — below
   * the data threshold, %29 an UNHEALTHY copy, decom/maint dns from the
   * node ring) + pending add of index 2 on %62 (⊂ %31) and pending
   * delete of index 1 on %86 EC containers.
   *
   * Scale shape: one (container, index) spine aggregate over the shard
   * map, one container fold; node dim broadcast; no driver loop.
   */
  def ecUnderReplicationPlan(ecShards: DataFrame, datanodes: DataFrame,
                             containersScm: DataFrame,
                             dataShards: Int = 3, parity: Int = 2,
                             remainingMaintenanceRedundancy: Int = 1)
      : DataFrame = {
    val c = col("container_id")
    val spark = datanodes.sparkSession
    val dn = datanodes.select(col("uuid").as("datanode"),
      col("state").as("node_state"), col("op_state"))
    val required = dataShards + parity
    val maxMaint = math.max(0, parity - remainingMaintenanceRedundancy)
    val contSpine = containersScm
      .filter(col("state") =!= "DELETED" && (c % 12) % 3 === 2)
      .select("container_id")
    val idxSpine = contSpine
      .crossJoin(spark.range(1, required + 1).toDF("replica_index"))
    val annotated = ecShards
      .join(broadcast(dn), Seq("datanode"))
      .withColumn("pend_del",
        c % 86 === 0 && col("replica_index") === 1 &&
          col("datanode") === concat(lit("dn"), ((c + 7) % 20)
            .cast("string")))
      .withColumn("unhealthy", col("shard_state") === "UNHEALTHY")
      .withColumn("decom",
        !col("unhealthy") &&
          col("op_state").isin("DECOMMISSIONING", "DECOMMISSIONED"))
      .withColumn("maint",
        !col("unhealthy") &&
          col("op_state").isin("IN_MAINTENANCE", "ENTERING_MAINTENANCE"))
      .withColumn("inservice",
        !col("unhealthy") && col("op_state") === "IN_SERVICE")
    val perIdxRaw = annotated.groupBy("container_id", "replica_index")
      .agg(
        sum(when(col("inservice") && !col("pend_del"), 1L).otherwise(0L))
          .as("h"),
        sum(when(col("decom"), 1L).otherwise(0L)).as("d"),
        sum(when(col("maint"), 1L).otherwise(0L)).as("m"),
        max(when(col("shard_state") === "CLOSED" && !col("pend_del") &&
          col("node_state") === "HEALTHY", 1).otherwise(0)).as("src"))
    val perIdx = idxSpine
      .join(perIdxRaw, Seq("container_id", "replica_index"), "left")
      .na.fill(0L, Seq("h", "d", "m", "src"))
      .withColumn("pa",
        when(c % 62 === 0 && col("replica_index") === 2, 1L)
          .otherwise(0L))
    ecUnderDecide(perIdx, dataShards, remainingMaintenanceRedundancy,
      maxMaint)
  }

  /** The per-index decision stage of [[ecUnderReplicationPlan]] — kept
    * injectable so the property spec can drive it with randomized
    * (h, d, m, src, pa) index states. */
  private[graft] def ecUnderDecide(perIdx: DataFrame, dataShards: Int,
                                   remainingMaintenanceRedundancy: Int,
                                   maxMaint: Int): DataFrame = {
    val folded = perIdx.groupBy("container_id")
      .agg(
        min(when(col("h") >= 1, 1).otherwise(0)).as("full_h"),
        min(when(col("h") + col("pa") >= 1, 1).otherwise(0))
          .as("full_ha"),
        min(when(col("h") + col("m") >= 1, 1).otherwise(0))
          .as("full_hm"),
        min(when(col("h") + col("pa") + col("m") >= 1, 1).otherwise(0))
          .as("full_ham"),
        sum(when(col("h") >= 1, 1L).otherwise(0L)).as("n_h_idx"),
        sum(when(col("h") + col("pa") >= 1, 1L).otherwise(0L))
          .as("n_ha_idx"),
        sum(when(col("h") === 0 && col("pa") === 0 && col("m") === 0 &&
          col("d") === 0, 1L).otherwise(0L)).as("n_missing"),
        sum(col("src")).as("n_src_idx"),
        sum(when(col("d") > 0 && col("h") === 0 && col("pa") === 0, 1L)
          .otherwise(0L)).as("n_decom_only"),
        sum(when(col("d") > 0 && col("h") === 0 && col("pa") === 0 &&
          col("src") === 1, 1L).otherwise(0L)).as("n_decom_src"),
        sum(when(col("m") > 0 && col("h") === 0 && col("pa") === 0, 1L)
          .otherwise(0L)).as("n_maint_only"),
        sum(when(col("m") > 0 && col("h") === 0 && col("pa") === 0 &&
          col("src") === 1, 1L).otherwise(0L)).as("n_maint_src"))
      .withColumn("suff_noadd",
        col("full_h") === 1 ||
          (col("full_hm") === 1 &&
            col("n_h_idx") >= dataShards + remainingMaintenanceRedundancy))
      .withColumn("suff_add",
        col("full_ha") === 1 ||
          (col("full_ham") === 1 &&
            col("n_ha_idx") >= dataShards + remainingMaintenanceRedundancy))
      .withColumn("addl_maint",
        greatest(col("n_maint_only") - maxMaint, lit(0L)))
    folded
      .withColumn("verdict",
        when(col("suff_noadd"), lit("NOT_UNDER"))
          .when(col("suff_add"), lit("PENDING_FIX"))
          .otherwise(lit("REPAIR")))
      .withColumn("reconstruct",
        when(col("verdict") =!= "REPAIR" || col("n_missing") === 0,
          lit(""))
          .when(col("n_src_idx") >= dataShards, lit("RECONSTRUCT"))
          .otherwise(lit("NO_SOURCES")))
      .withColumn("n_missing",
        when(col("verdict") === "REPAIR", col("n_missing"))
          .otherwise(lit(0L)))
      .withColumn("n_decom_cmds",
        when(col("verdict") === "REPAIR", col("n_decom_src"))
          .otherwise(lit(0L)))
      .withColumn("n_maint_cmds",
        when(col("verdict") === "REPAIR",
          least(col("addl_maint"), col("n_maint_src")))
          .otherwise(lit(0L)))
      .withColumn("n_commands",
        when(col("reconstruct") === "RECONSTRUCT", 1L).otherwise(0L) +
          col("n_decom_cmds") + col("n_maint_cmds"))
      .select("container_id", "verdict", "n_missing", "reconstruct",
        "n_decom_cmds", "n_maint_cmds", "n_commands")
      .orderBy("container_id")
  }

  /**
   * Ratis over-replication delete plan — RatisOverReplicationHandler
   * .processAndSendCommands (server-scm/.../replication/
   * RatisOverReplicationHandler.java:72-328), per candidate container
   * (more replicas than the factor), in reference order:
   *   1. replicas on non-HEALTHY nodes are filtered FIRST (:87-96 — a
   *      stale node's replica may vanish on its own; deleting a healthy
   *      copy alongside would lose both) ⇒ FILTERED_NODE;
   *   2. re-verify over-replication on the filtered count (:103-106):
   *      excess = healthy-node replicas − factor; ≤ 0 ⇒ NOT_OVER;
   *   3. replicas on non-IN_SERVICE nodes are never delete candidates
   *      (:173-177) ⇒ NOT_ELIGIBLE_OP_STATE;
   *   4. non-CLOSED (quasi-closed) containers save ONE replica per unique
   *      origin datanode, preferring healthy replica states
   *      (:179-185, saveReplicasWithUniqueOrigins) ⇒ SAVED_UNIQUE_ORIGIN
   *      — the quasi-closed-stuck guard: every origin's last copy is
   *      pinned;
   *   5. state-MISMATCHED candidates delete first, in deterministic sort
   *      order, up to excess (:254-279) ⇒ DELETE_MISMATCH;
   *   6. then matched candidates whose removal keeps the placement
   *      status equal (:287-316 + AbstractOverReplicationHandler:48-99:
   *      satisfied→still-satisfied, or unsatisfied→same rack count;
   *      requiredRacks = min(factor, cluster racks)) ⇒ DELETE_EXCESS;
   *   7. everything else ⇒ KEEP — leftover excess requeues rather than
   *      break placement.
   * Deterministic sort = datanode name (the reference sorts by
   * ContainerReplica hashCode — an arbitrary-but-stable order; name order
   * is this engine's stable equivalent). Container states derive
   * QUASI_CLOSED on container_id % 119 == 0 (the fixture's stuck set);
   * on those, the max-name replica re-registered from the min-name
   * origin (a moved copy ⇒ duplicate origin). Multi-excess rack deletion
   * is sequential in the reference; with factor-3 and ≤4 replicas,
   * excess ≤ 1 and the single-step plan is exact.
   *
   * Scale shape: one window pass partitioned by container + one
   * per-container aggregate broadcast back; node and container dims
   * broadcast. No driver loop.
   */
  def overReplicationPlan(replicas: DataFrame, datanodes: DataFrame,
                          containersScm: DataFrame,
                          requiredRacks: Int = 3): DataFrame = {
    val dn = datanodes.select(col("uuid").as("datanode"),
      col("state").as("node_state"), col("op_state"))
    val cont = containersScm.filter(col("state") =!= "DELETED")
      .withColumn("container_state",
        when(col("container_id") % 119 === 0, lit("QUASI_CLOSED"))
          .otherwise(lit("CLOSED")))
      .select("container_id", "container_state", "replication_factor")
    val wC = Window.partitionBy("container_id")
    val base = replicas
      .join(broadcast(dn), Seq("datanode"))
      .join(broadcast(cont), Seq("container_id"))
      .withColumn("node_healthy", col("node_state") === "HEALTHY")
      .withColumn("n_replicas", count(lit(1)).over(wC))
      .filter(col("n_replicas") > col("replication_factor"))
      .withColumn("n_healthy",
        sum(when(col("node_healthy"), 1L).otherwise(0L)).over(wC))
      .withColumn("excess",
        col("n_healthy") - col("replication_factor"))
      .withColumn("min_dn", min("datanode").over(wC))
      .withColumn("max_dn", max("datanode").over(wC))
      .withColumn("origin_dn",
        when(col("container_state") === "QUASI_CLOSED" &&
          col("datanode") === col("max_dn"), col("min_dn"))
          .otherwise(col("datanode")))
      .withColumn("eligible",
        col("node_healthy") && col("op_state") === "IN_SERVICE" &&
          col("excess") > 0)
      .withColumn("mismatched",
        col("replica_state") =!= col("container_state"))
    // unique-origin save (non-CLOSED containers): rank eligible replicas
    // within each origin group, healthy replica states first
    val wO = Window.partitionBy("container_id", "origin_dn")
      .orderBy((col("replica_state") === "UNHEALTHY").cast("int"),
        col("datanode"))
    val wSeq = Window.partitionBy("container_id").orderBy("datanode")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val staged = base
      .withColumn("origin_rank",
        sum(when(col("eligible"), 1L).otherwise(0L)).over(
          wO.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("saved",
        col("eligible") && col("container_state") =!= "CLOSED" &&
          col("origin_rank") === 1)
      .withColumn("is_cand", col("eligible") && !col("saved"))
      .withColumn("mis_pos",
        sum(when(col("is_cand") && col("mismatched"), 1L).otherwise(0L))
          .over(wSeq))
      .withColumn("del_mismatch",
        col("is_cand") && col("mismatched") &&
          col("mis_pos") <= col("excess"))
      .withColumn("n_mis_del",
        sum(when(col("del_mismatch"), 1L).otherwise(0L)).over(wC))
      .withColumn("rem_excess",
        greatest(col("excess") - col("n_mis_del"), lit(0L)))
      .withColumn("surviving", col("is_cand") && !col("del_mismatch"))
    // placement status over the surviving candidate set, per container
    val rackCnt = staged.filter(col("surviving"))
      .groupBy("container_id", "rack")
      .agg(count(lit(1)).as("rack_n"))
    val rackTot = rackCnt.groupBy("container_id")
      .agg(count(lit(1)).as("rc"))
    staged
      .join(broadcast(rackCnt), Seq("container_id", "rack"), "left")
      .join(broadcast(rackTot), Seq("container_id"), "left")
      .withColumn("rack_safe",
        col("surviving") && !col("mismatched") && (
          (col("rc") >= requiredRacks &&
            col("rc") - when(col("rack_n") === 1, 1L).otherwise(0L) >=
              requiredRacks) ||
          (col("rc") < requiredRacks && col("rack_n") >= 2)))
      .withColumn("excess_pos",
        sum(when(col("rack_safe"), 1L).otherwise(0L)).over(wSeq))
      .withColumn("verdict",
        when(!col("node_healthy"), lit("FILTERED_NODE"))
          .when(col("excess") <= 0, lit("NOT_OVER"))
          .when(col("op_state") =!= "IN_SERVICE",
            lit("NOT_ELIGIBLE_OP_STATE"))
          .when(col("saved"), lit("SAVED_UNIQUE_ORIGIN"))
          .when(col("del_mismatch"), lit("DELETE_MISMATCH"))
          .when(col("rack_safe") && col("excess_pos") <= col("rem_excess"),
            lit("DELETE_EXCESS"))
          .otherwise(lit("KEEP")))
      .select("container_id", "datanode", "container_state",
        "replica_state", "verdict")
      .orderBy("container_id", "datanode")
  }

  /**
   * Decommission / maintenance readiness — the admin monitor's per-node
   * container walk (DatanodeAdminMonitorImpl.java:406-470
   * checkContainersReplicatedOnNode): every container holding a replica on
   * a node leaving service is classified
   *   - DELETING: container DELETED/DELETING — never blocks the workflow;
   *   - UNCLOSED: fails isHealthyEnoughForOffline
   *     (RatisContainerReplicaCount.java:429-452 — container not
   *     CLOSED/QUASI_CLOSED, no in-service replica at all, or an
   *     in-service non-UNHEALTHY replica disagreeing with the container
   *     state);
   *   - UNDER_REPLICATED: missingReplicas > 0
   *     (RatisContainerReplicaCount.java:356-374 with no inflight ops:
   *     UNHEALTHY and leaving-node replicas don't count as available,
   *     maintenance copies discount the deficit but
   *     minHealthyForMaintenance = min(rf, 2) healthy must remain);
   *   - SUFFICIENTLY_REPLICATED otherwise,
   * then rolled up per node with `can_proceed` — the monitor's "all
   * containers sufficiently replicated or deleting" progress gate.
   *
   * Scale shape: node + container catalogs broadcast into the replica map;
   * the per-container count aggregates ONLY the tracked containers (semi-
   * join prune on the leaving nodes' working set) — with k nodes draining
   * out of N the shuffle is O(k/N) of the replica map, never all of it.
   */
  def decommissionReadiness(replicas: DataFrame, datanodes: DataFrame,
                            containersScm: DataFrame): DataFrame = {
    val dnStates = datanodes.select(col("uuid").as("datanode"),
      col("op_state"))
    val containerDim = containersScm.select(col("container_id"),
      col("state"), col("replication_factor"))
    // node + container catalogs are control-plane-sized → broadcast into
    // the (data-plane) replica map; one scan annotates every replica
    val annotated = replicas
      .join(broadcast(dnStates), Seq("datanode"))
      .join(broadcast(containerDim), Seq("container_id"))
    // the tracked set: (leaving node, container) pairs the monitor walks
    val leaving = annotated
      .filter(col("op_state") =!= "IN_SERVICE")
      .select("container_id", "datanode", "op_state")
    // count the replica classes ONLY for tracked containers (semi-join
    // prunes the shuffle input to the leaving nodes' working set — tiny
    // next to the full replica map when few nodes are leaving)
    val healthyRep = col("replica_state") =!= "UNHEALTHY"
    val counts = annotated
      .join(leaving.select("container_id").distinct(),
        Seq("container_id"), "left_semi")
      .groupBy("container_id")
      .agg(
        // constant per container_id (both ride the containers_scm dim
        // join) — max() not first(): first() is partition-order-dependent
        // by contract, and in a gate whose only failure mode is a hash
        // mismatch, no order-dependent aggregate belongs in main source.
        max("state").as("state"),
        max("replication_factor").as("rf"),
        sum(when(col("op_state") === "IN_SERVICE" && healthyRep, 1L)
          .otherwise(0L)).as("healthy"),
        sum(when(col("op_state")
            .isin("IN_MAINTENANCE", "ENTERING_MAINTENANCE") && healthyRep,
          1L).otherwise(0L)).as("maint"),
        sum(when(col("op_state") === "IN_SERVICE", 1L).otherwise(0L))
          .as("in_service"),
        sum(when(col("op_state") === "IN_SERVICE" && healthyRep &&
          col("replica_state") =!= col("state"), 1L).otherwise(0L))
          .as("mismatched"))
    // missingReplicas with no inflight ops: delta = rf - healthy; if
    // positive, maintenance copies discount it but at least
    // min(rf, 2) (= minHealthyForMaintenance) healthy must remain
    val missing = when(col("rf") - col("healthy") <= 0, lit(0L))
      .otherwise(greatest(
        greatest(lit(0L), col("rf") - col("healthy") - col("maint")),
        greatest(lit(0L), least(col("rf"), lit(2L)) - col("healthy"))))
    val classified = counts.withColumn("class",
      when(col("state").isin("DELETED", "DELETING"), lit("DELETING"))
        .when(!col("state").isin("CLOSED", "QUASI_CLOSED") ||
          col("in_service") === 0 || col("mismatched") > 0, lit("UNCLOSED"))
        .when(missing > 0, lit("UNDER_REPLICATED"))
        .otherwise(lit("SUFFICIENTLY_REPLICATED")))
      .select("container_id", "class")
    leaving
      .join(classified, Seq("container_id"))
      .groupBy(col("datanode").as("uuid"), col("op_state"))
      .agg(
        count(lit(1)).as("total"),
        sum(when(col("class") === "SUFFICIENTLY_REPLICATED", 1L)
          .otherwise(0L)).as("sufficiently_replicated"),
        sum(when(col("class") === "DELETING", 1L).otherwise(0L))
          .as("deleting"),
        sum(when(col("class") === "UNDER_REPLICATED", 1L).otherwise(0L))
          .as("under_replicated"),
        sum(when(col("class") === "UNCLOSED", 1L).otherwise(0L))
          .as("unclosed"))
      .withColumn("can_proceed",
        col("under_replicated") === 0 && col("unclosed") === 0)
      .orderBy("uuid")
  }

  /** Reference default container size (hasEnoughSpace's floor,
    * ScmConfigKeys OZONE_SCM_CONTAINER_SIZE_DEFAULT = 5 GB). */
  val ContainerSizeBytes = 5L * 1024 * 1024 * 1024

  /**
   * Container-balancer iteration planning — the move-selection step after
   * [[balancerPlan]]'s classification (ContainerBalancerTask +
   * FindSourceGreedy/AbstractFindTargetGreedy): pair each over-utilized
   * node with an under-utilized one, then schedule that source's CLOSED
   * containers (largest first, the selection-criteria order) while the
   * running total fits every budget the reference enforces —
   * canSizeLeaveSource (source must stay ≥ the lower limit,
   * FindSourceGreedy.java:153-165), canSizeEnterTarget (target must stay
   * ≤ the upper limit, AbstractFindTargetGreedy.java:178-199) and
   * maxSizeToMovePerIteration (ContainerBalancerTask.java:921) — and the
   * container has no replica already on the target
   * (AbstractFindTargetGreedy.java:119-122).
   *
   * Determinization: the reference walks greedy orderings with mutable
   * entering/leaving maps; here over-nodes pair rank-for-rank with
   * under-nodes (most-over ↔ most-under) and the per-pair schedule is a
   * windowed cumulative fill — a pure function of the catalogs.
   *
   * Scale shape: node classification is catalog-sized; the only
   * container-scale work is one semi-join of the replica map against the
   * (few) paired sources, then per-pair windows over those nodes'
   * containers only.
   */
  def balancerMoves(datanodes: DataFrame, replicas: DataFrame,
                    containersScm: DataFrame, thresholdBp: Long = 1000L,
                    maxSizeToMove: Long = 100L * 1024 * 1024 * 1024)
      : DataFrame = {
    val plan = balancerPlan(datanodes, thresholdBp)
    val over = plan.filter(col("action") === "OVER_UTILIZED")
      .withColumn("rk", row_number().over(
        Window.orderBy(col("utilization_bp").desc, col("uuid"))))
      .select(col("uuid").as("source"), col("rk"),
        // bytes the source may shed before hitting the LOWER limit
        expr("capacity * (utilization_bp - (avg_utilization_bp - " +
          s"$thresholdBp)) DIV 10000").as("source_budget"))
    val under = plan.filter(col("action") === "UNDER_UTILIZED")
      .withColumn("rk", row_number().over(
        Window.orderBy(col("utilization_bp").asc, col("uuid"))))
      .select(col("uuid").as("target"), col("rk"),
        // bytes the target may absorb before hitting the UPPER limit
        expr("capacity * ((avg_utilization_bp + " +
          s"$thresholdBp) - utilization_bp) DIV 10000").as("target_budget"))
    val pairs = over.join(under, Seq("rk"))
      .withColumn("budget",
        least(col("source_budget"), col("target_budget"),
          lit(maxSizeToMove)))
      .select("source", "target", "budget")
    // containers resident on a paired source, CLOSED, absent from the
    // pair's target; replica map pruned to the paired sources first
    val srcReplicas = replicas
      .join(broadcast(pairs.select(col("source").as("datanode"))),
        Seq("datanode"), "left_semi")
    val onTarget = replicas.select(col("container_id"),
      col("datanode").as("target"), lit(true).as("on_target"))
    val cands = srcReplicas
      .select(col("datanode").as("source"), col("container_id"))
      .join(broadcast(pairs), Seq("source"))
      .join(containersScm.filter(col("state") === "CLOSED")
        .select(col("container_id"), col("used_bytes")), Seq("container_id"))
      .join(onTarget, Seq("container_id", "target"), "left")
      .filter(col("on_target").isNull)
    val fill = Window.partitionBy("source")
      .orderBy(col("used_bytes").desc, col("container_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cands
      .withColumn("cum_bytes", sum("used_bytes").over(fill))
      .filter(col("cum_bytes") <= col("budget"))
      .select("source", "target", "container_id", "used_bytes", "cum_bytes")
      .orderBy("source", "cum_bytes")
  }

  /**
   * Rack-aware replica placement for under-replicated RATIS containers —
   * the write-side dual of the replica-health check: for each non-deleted
   * container whose healthy replica count is short of its factor, choose
   * the target datanodes the reference's placement policy would accept
   * (`SCMContainerPlacementRackAware.chooseDatanodesInternal`,
   * SCMContainerPlacementRackAware.java:104-257):
   *
   *   - candidates are HEALTHY + IN_SERVICE nodes not already holding ANY
   *     copy of the container (excludedNodes), with room for a container
   *     (`hasEnoughSpace`: remaining ≥ max(5 GB, container bytes))
   *   - rack spread: prefer racks that hold no HEALTHY copy (an UNHEALTHY
   *     replica is getting replaced, so its rack doesn't count as
   *     covered); with the policy's `fallback` (the ReplicationManager
   *     default) a same-rack node is accepted when no new-rack node fits
   *   - a second pick additionally avoids the FIRST pick's rack (the
   *     reference re-excludes each chosen node's rack before the next
   *     chooseNode), falling back likewise
   *
   * The reference picks randomly among valid nodes; this plan determinizes
   * to (new-rack first, most free space, uuid) so the decision is a pure
   * function of the catalogs — the CONSTRAINTS are the checkable contract.
   * Emits one row per planned copy with its pick order; a container with
   * needed > planned rows is short of valid targets (NOT_ENOUGH_NODES).
   *
   * Scale shape: the replica rollup is one shuffle on container_id pruned
   * to under-replicated containers first; the node catalog (control-plane
   * sized) broadcasts into the candidate build, so the candidate frame is
   * |under-replicated| × |eligible nodes| with all ranking windows
   * partitioned by container_id. Nothing data-plane-sized shuffles twice.
   */
  def replicaPlacement(replicas: DataFrame, datanodes: DataFrame,
                       containersScm: DataFrame): DataFrame = {
    val healthyRep = col("replica_state") =!= "UNHEALTHY"
    val perContainer = replicas
      .groupBy("container_id")
      .agg(
        sum(when(healthyRep, 1L).otherwise(0L)).as("healthy"),
        collect_set(col("datanode")).as("held_nodes"),
        collect_set(when(healthyRep, col("rack"))).as("held_racks"))
    val underRep = containersScm
      .filter(col("state") =!= "DELETED")
      .select(col("container_id"), col("replication_factor").as("rf"),
        col("used_bytes").as("container_bytes"))
      .join(perContainer, Seq("container_id"))
      .withColumn("needed", col("rf") - col("healthy"))
      .filter(col("needed") > 0)
    val eligibleNodes = datanodes
      .filter(col("state") === "HEALTHY" && col("op_state") === "IN_SERVICE")
      .select(col("uuid"), col("rack").as("dn_rack"), col("remaining"))
    val cands = underRep
      .crossJoin(broadcast(eligibleNodes))
      .filter(!array_contains(col("held_nodes"), col("uuid")) &&
        col("remaining") >= greatest(lit(ContainerSizeBytes),
          col("container_bytes")))
      .withColumn("new_rack",
        !array_contains(col("held_racks"), col("dn_rack")))
    val order = Window.partitionBy("container_id")
      .orderBy(col("new_rack").desc, col("remaining").desc, col("uuid"))
    val ranked = cands.withColumn("rn", row_number().over(order))
    val pick1 = ranked.filter(col("rn") === 1)
    // second pick re-excludes pick1's node and rack, falling back to
    // pick1's rack only when no other rack has a valid node
    val p1 = pick1.select(col("container_id"),
      col("uuid").as("p1_uuid"), col("dn_rack").as("p1_rack"))
    val order2 = Window.partitionBy("container_id")
      .orderBy(col("avoids_p1").desc, col("new_rack").desc,
        col("remaining").desc, col("uuid"))
    val pick2 = ranked
      .filter(col("needed") >= 2)
      .join(broadcast(p1), Seq("container_id"))
      .filter(col("uuid") =!= col("p1_uuid"))
      .withColumn("avoids_p1", col("dn_rack") =!= col("p1_rack"))
      .withColumn("rn2", row_number().over(order2))
      .filter(col("rn2") === 1)
    pick1.select(col("container_id"), lit(1L).as("pick"),
      col("uuid").as("datanode"), col("dn_rack").as("rack"),
      col("new_rack"))
      .union(pick2.select(col("container_id"), lit(2L).as("pick"),
        col("uuid").as("datanode"), col("dn_rack").as("rack"),
        col("new_rack")))
      .orderBy("container_id", "pick")
  }

  /**
   * EC reconstruction planning — the SCM-side shard census of
   * ECContainerReplicaCount (ECContainerReplicaCount.java:310-313
   * isUnrecoverable: fewer distinct healthy indexes than data shards;
   * :350-377 unavailableIndexes: an index counts as missing only when NO
   * healthy copy exists anywhere — copies on decommissioning/maintenance
   * nodes are still readable and instead need re-copying, not
   * reconstruction). Per rs-3-2 container the decision precedence:
   * UNRECOVERABLE (< 3 available indexes) → UNDER_REPLICATED (≥ 1 index
   * with no copy: offline EC reconstruction rebuilds `reconstruct_shards`
   * of them) → OVER_REPLICATED (an index with > 1 in-service copy) →
   * OFFLINE_COPIES (indexes living only on leaving nodes) → HEALTHY.
   *
   * Scale shape: the node catalog broadcasts into the shard map; both
   * rollups aggregate on (container, index) prefixes — one shuffle.
   */
  def ecRecoveryPlan(ecShards: DataFrame, datanodes: DataFrame,
                     dataShards: Int = 3,
                     requiredNodes: Int = 5): DataFrame = {
    val dn = datanodes.select(col("uuid").as("datanode"), col("op_state"))
    val healthy = col("shard_state") =!= "UNHEALTHY"
    val perIdx = ecShards
      .join(broadcast(dn), Seq("datanode"))
      .groupBy("container_id", "replica_index")
      .agg(
        sum(when(healthy && col("op_state") === "IN_SERVICE", 1L)
          .otherwise(0L)).as("online"),
        sum(when(healthy && col("op_state") =!= "IN_SERVICE", 1L)
          .otherwise(0L)).as("offline"))
    perIdx
      .groupBy("container_id")
      .agg(
        sum(when(col("online") >= 1, 1L).otherwise(0L))
          .as("online_indexes"),
        sum(when(col("online") === 0 && col("offline") >= 1, 1L)
          .otherwise(0L)).as("offline_only_indexes"),
        max("online").as("max_copies"))
      .withColumn("available_indexes",
        col("online_indexes") + col("offline_only_indexes"))
      .withColumn("missing_indexes",
        lit(requiredNodes.toLong) - col("available_indexes"))
      .withColumn("decision",
        when(col("available_indexes") < dataShards, lit("UNRECOVERABLE"))
          .when(col("missing_indexes") > 0, lit("UNDER_REPLICATED"))
          .when(col("max_copies") > 1, lit("OVER_REPLICATED"))
          .when(col("offline_only_indexes") > 0, lit("OFFLINE_COPIES"))
          .otherwise(lit("HEALTHY")))
      .withColumn("reconstruct_shards",
        when(col("decision") === "UNDER_REPLICATED",
          col("missing_indexes")).otherwise(lit(0L)))
      .select("container_id", "online_indexes", "offline_only_indexes",
        "missing_indexes", "max_copies", "decision", "reconstruct_shards")
      .orderBy("container_id")
  }

  /**
   * Container Merkle-tree reconciliation — the container-checksum plane
   * (ContainerMerkleTreeWriter.java:31-45: chunk checksums roll up into a
   * block checksum ordered by offset, block checksums into one container
   * data checksum ordered by block ID; the reference aggregates with
   * CRC32C, this model with md5 — the portable deterministic hash, same
   * tree shape). Every replica computes its tree from its own data — an
   * UNHEALTHY replica's diverges — and replicas of a container then
   * compare: whoever disagrees with the majority checksum (ties broken by
   * smallest checksum) needs reconciliation, the repair-to-peers decision
   * of the reconcile command flow.
   *
   * Scale shape: leaves explode once from the OM chunk layout and join the
   * (container → datanode) replica map — the ×replication fan-out every
   * datanode pays locally in the reference appears here as one
   * co-partitioned pass. Each tree level folds its children with bit_xor
   * over a 60-bit md5 prefix (a commutative MULTISET hash): any chunk
   * divergence still flips the block and container digests w.h.p., but
   * the rollup is a plain two-level aggregation — no per-group array
   * materialization or sort, so a container with 10⁵ blocks costs the
   * same per-row work as one with 10 (the reference's offset-ordered
   * CRC32C concat needs its own ordered walk; order-independence is the
   * distributed-friendly equivalent). The majority vote runs on
   * container-level rows only (one row per replica).
   */
  def merkleReconcile(objectsNested: DataFrame,
                      replicas: DataFrame): DataFrame = {
    val chunks = objectsNested
      .select(explode(col("locations")).as("loc"))
      .select(col("loc.container_id").as("container_id"),
        col("loc.local_id").as("local_id"),
        col("loc.offset").as("offset"), col("loc.length").as("length"))
    // a replica's tree is a pure function of (layout, replica_state) in
    // this model, so build the TWO variant trees per container in one
    // pass over the layout instead of fanning the chunk table out
    // ×replication (replicas then just pick their variant)
    // the tree's hash kernel runs twice per CHUNK row (the engine's
    // most-hashed table at 100×) — the native graft_hash60 (spec-pinned
    // bit-identical to the hex-prefix SQL form the oracle keeps) skips
    // the per-row hex-string round-trip
    def ck(salt: String) = expr(
      s"""graft_hash60(concat_ws(':', container_id, local_id,
         |  offset, length, '$salt'))""".stripMargin.replace("\n", " "))
    val blockLevel = chunks
      .withColumn("ck_ok", ck("ok"))
      .withColumn("ck_corrupt", ck("corrupt"))
      .groupBy("container_id", "local_id")
      .agg(expr("bit_xor(ck_ok)").as("x_ok"),
        expr("bit_xor(ck_corrupt)").as("x_corrupt"))
      .select(col("container_id"), col("local_id"),
        expr("graft_hash60(concat_ws(':', container_id, local_id, " +
          "x_ok))").as("block_ok"),
        expr("graft_hash60(concat_ws(':', container_id, local_id, " +
          "x_corrupt))").as("block_corrupt"))
    val containerTrees = blockLevel
      .groupBy("container_id")
      .agg(expr("bit_xor(block_ok)").as("t_ok"),
        expr("bit_xor(block_corrupt)").as("t_corrupt"))
      .select(col("container_id"),
        md5(concat_ws(":", col("container_id"), col("t_ok")))
          .as("tree_ok"),
        md5(concat_ws(":", col("container_id"), col("t_corrupt")))
          .as("tree_corrupt"))
    val containerLevel = replicas
      .select("container_id", "datanode", "replica_state")
      .join(containerTrees, Seq("container_id"))
      .select(col("container_id"), col("datanode"),
        when(col("replica_state") === "UNHEALTHY", col("tree_corrupt"))
          .otherwise(col("tree_ok")).as("data_checksum"))
    val wC = Window.partitionBy("container_id")
    val wCk = Window.partitionBy("container_id", "data_checksum")
    containerLevel
      .withColumn("n_replicas", count(lit(1)).over(wC))
      .withColumn("agree_count", count(lit(1)).over(wCk))
      .withColumn("max_agree", max("agree_count").over(wC))
      .withColumn("majority_checksum",
        min(when(col("agree_count") === col("max_agree"),
          col("data_checksum"))).over(wC))
      .withColumn("needs_reconcile",
        col("data_checksum") =!= col("majority_checksum"))
      .select("container_id", "datanode", "data_checksum", "n_replicas",
        "agree_count", "needs_reconcile")
      .orderBy("container_id", "datanode")
  }

  /**
   * EC-aware container safemode rules — the typed refinement of the
   * CONTAINER rule in [[safemodeStatus]] (the reference split it into
   * per-replication-type rules) plus the EC datanode floor:
   *   - RATIS_CONTAINER / EC_CONTAINER (AbstractContainerSafeModeRule
   *     .java:76-99,135-152): each rule tracks its type's containers in
   *     CLOSED/QUASI_CLOSED with numberOfKeys > 0 (:78-81 — OPEN/
   *     CLOSING containers and empty containers never gate safemode);
   *     DELETED containers drop out on refresh (:89-99). A tracked
   *     container counts once `minimumNodes` distinct datanodes have
   *     reported it — 1 for Ratis (RatisContainerSafeModeRule.java:48-56
   *     asserts it), the DATA count for EC
   *     (ECContainerSafeModeRule.java:51-63) — and the rule passes at
   *     ceil(total × cutoff), default 99%;
   *   - EC_MIN_DATANODE (ECMinDataNodeSafeModeRule.java:55-101): active
   *     only when the cluster DEFAULT replication is EC; requires
   *     data+parity healthy in-service datanodes (the fallback validate
   *     path :97-100 — a fresh EC cluster cannot form a write pipeline
   *     below the full stripe width);
   *   - EXIT_SAFEMODE folds the three.
   * Same exact-integer ceil as [[safemodeStatus]]; the reports side
   * aggregates to distinct-reporter counts before the tracked join, so
   * the corpus-sized report stream reduces map-side.
   */
  def safemodeEcRules(containers: DataFrame, reports: DataFrame,
                      datanodes: DataFrame, cutoffBp: Long = 9900L,
                      defaultEc: Option[(Int, Int)] = Some((3, 2)))
  : DataFrame = {
    val tracked = containers
      .filter(col("state").isin("CLOSED", "QUASI_CLOSED") &&
        col("num_keys") > 0)
      .withColumn("min_replica",
        when(col("rep_type") === "EC", col("ec_data")).otherwise(lit(1)))
    val reporters = reports.groupBy("container_id")
      .agg(countDistinct("datanode").as("n_reported"))
    val counted = tracked
      .join(reporters, Seq("container_id"), "left")
      .groupBy("rep_type")
      .agg(count(lit(1)).as("total"),
        sum(when(coalesce(col("n_reported"), lit(0L)) >= col("min_replica"),
          1L).otherwise(0L)).as("actual"))
    val typeDim = containers.sparkSession.range(2).toDF("i")
      .select(when(col("i") === 0, "RATIS").otherwise("EC").as("rep_type"))
    val containerRules = typeDim
      .join(counted, Seq("rep_type"), "left")
      .select(
        concat(col("rep_type"), lit("_CONTAINER")).as("rule"),
        expr(s"(coalesce(total, 0) * $cutoffBp + 9999) DIV 10000")
          .as("required"),
        coalesce(col("actual"), lit(0L)).as("actual"))
    val healthyInService = datanodes
      .filter(col("state") === "HEALTHY" && col("op_state") === "IN_SERVICE")
      .agg(count(lit(1)).as("actual"))
    val ecDnRule = defaultEc match {
      case Some((d, p)) => healthyInService
        .select(lit("EC_MIN_DATANODE").as("rule"),
          lit(d.toLong + p).as("required"), col("actual"))
      case None => healthyInService
        .select(lit("EC_MIN_DATANODE").as("rule"), lit(0L).as("required"),
          col("actual"))
    }
    val rules = containerRules.unionByName(ecDnRule)
      .withColumn("satisfied", col("actual") >= col("required"))
    val exitRow = rules
      .agg(count(lit(1)).as("required"),
        sum(when(col("satisfied"), 1L).otherwise(0L)).as("actual"))
      .select(lit("EXIT_SAFEMODE").as("rule"), col("required"),
        col("actual"))
      .withColumn("satisfied", col("actual") >= col("required"))
    rules.unionByName(exitRow).orderBy("rule")
  }

  /**
   * Recon unhealthy-container records — the fsck classification Recon
   * persists beyond the SCM health chain (recon/fsck/
   * ReconReplicationManager.java:431-532):
   *  - a container with NO replicas splits on its key count: zero keys
   *    ⇒ EMPTY_MISSING ("no replicas and no keys" — reclaimable, not
   *    data loss), otherwise MISSING (:431-453, isEmptyMissing:507-509);
   *  - replica-count deviations record UNDER/OVER_REPLICATED;
   *  - NEGATIVE_SIZE is an ADD-ON record for a container reporting
   *    usedBytes < 0 (:511-531) — it rides alongside whatever
   *    replication state the container is in;
   *  - REPLICA_MISMATCH fires when replicas report more than one
   *    distinct non-null data checksum (:249-263 — all-null counts as
   *    no mismatch).
   * Output: one row per container holding any unhealthy record.
   *
   * Scale shape: one aggregation over the replica map (count +
   * distinct-checksum count together), broadcast-joined to the
   * control-plane catalogs.
   */
  def reconUnhealthyStates(containersScm: DataFrame,
                           containersOm: DataFrame,
                           replicas: DataFrame): DataFrame = {
    val lost = expr("container_id % 43 = 0 OR container_id % 178 = 89")
    val checksummed = replicas
      .filter(!lost)
      .withColumn("data_checksum",
        when(col("container_id") % 37 === 0,
          lit(null).cast("string"))
          .otherwise(md5(concat(lit("c"),
            col("container_id").cast("string"),
            when(col("container_id") % 31 === 0 &&
              col("datanode") === concat(lit("dn"),
                (col("container_id") % 20).cast("string")), lit("x"))
              .otherwise(lit(""))))))
    val agg = checksummed.groupBy("container_id")
      .agg(count(lit(1)).as("actual"),
        countDistinct("data_checksum").as("n_checksums"))
    containersScm.filter(col("state") =!= "DELETED")
      .withColumn("used_eff",
        when(col("container_id") % 41 === 0, -col("used_bytes"))
          .otherwise(col("used_bytes")))
      .join(containersOm.select("container_id", "num_keys"),
        Seq("container_id"), "left")
      .join(agg, Seq("container_id"), "left")
      .withColumn("actual", coalesce(col("actual"), lit(0L)))
      .withColumn("nk", coalesce(col("num_keys"), lit(0L)))
      .withColumn("health_state",
        when(col("actual") === 0,
          when(col("nk") === 0, lit("EMPTY_MISSING"))
            .otherwise(lit("MISSING")))
          .when(col("actual") < col("replication_factor"),
            lit("UNDER_REPLICATED"))
          .when(col("actual") > col("replication_factor"),
            lit("OVER_REPLICATED"))
          .otherwise(lit("HEALTHY")))
      .withColumn("negative_size", col("used_eff") < 0)
      .withColumn("replica_mismatch",
        coalesce(col("n_checksums"), lit(0L)) > 1)
      .filter(col("health_state") =!= "HEALTHY" || col("negative_size") ||
        col("replica_mismatch"))
      .select(col("container_id"), col("health_state"),
        col("replication_factor").cast("long").as("expected"),
        col("actual"), col("negative_size"), col("replica_mismatch"))
      .orderBy("container_id")
  }

  /**
   * DN close-container command ladder — CloseContainerCommandHandler
   * (container-service/.../commandhandler/CloseContainerCommandHandler
   * .java:95-152), the datanode-side dual of [[closeContainerEvents]]:
   * a container the DN never created is a logged no-op; an OPEN
   * container marks CLOSING first; OPEN/CLOSING close through the Ratis
   * write channel when the command's pipeline still exists there,
   * otherwise force-close directly (non-RATIS) or QUASI_CLOSE ("Ratis
   * pipeline does not exist"); a QUASI_CLOSED container only moves to
   * CLOSED under force; CLOSED/UNHEALTHY/INVALID are no-ops.
   */
  def dnCloseCommands(cmds: DataFrame): DataFrame =
    cmds
      .withColumn("marked_closing",
        col("container_present") && col("state") === "OPEN")
      .withColumn("action",
        when(!col("container_present"), lit("MISSING"))
          .when(col("state").isin("OPEN", "CLOSING"),
            when(col("pipeline_in_channel"), lit("CLOSE_VIA_RATIS"))
              .when(col("force"), lit("CLOSED_DIRECT"))
              .otherwise(lit("QUASI_CLOSED")))
          .when(col("state") === "QUASI_CLOSED",
            when(col("force"), lit("CLOSED_DIRECT")).otherwise(lit("NOOP")))
          .when(col("state") === "CLOSED", lit("NOOP"))
          .otherwise(lit("NOOP_BAD_STATE")))
      .select("cmd_id", "action", "marked_closing")
      .orderBy("cmd_id")

  /**
   * Dead-node event ladder — DeadNodeHandler (scm/node/DeadNodeHandler
   * .java:76-157): the event re-reads the node's CURRENT health and
   * skips when a heartbeat resurrected it before handling; a genuinely
   * dead node closes its containers, destroys its pipelines, and clears
   * its command queue unconditionally — but replica removal, the
   * ReplicationManager notification, and the deleted-block-log purge are
   * all suppressed while the node is IN_MAINTENANCE (its replicas still
   * count); topology removal re-reads health a SECOND time, so a node
   * resurrected mid-handling stays in the topology (removing it would
   * leave it reachable but invisible to placement).
   */
  def deadNodeHandler(events: DataFrame): DataFrame =
    events
      .withColumn("action",
        when(col("health_at_event") =!= "DEAD", lit("SKIP_NOT_DEAD"))
          .otherwise(lit("HANDLED")))
      .withColumn("handled", col("action") === "HANDLED")
      .select(
        col("node_id"), col("action"),
        when(col("handled"), col("n_pipelines")).otherwise(lit(0L))
          .as("pipelines_destroyed"),
        when(col("handled") && !col("in_maintenance"), col("n_replicas"))
          .otherwise(lit(0L)).as("replicas_removed"),
        (col("handled") && !col("in_maintenance")).as("rm_notified"),
        (col("handled") && !col("in_maintenance")).as("dn_txns_purged"),
        when(col("handled"), col("n_commands")).otherwise(lit(0L))
          .as("commands_cleared"),
        (col("handled") && col("health_at_topology") === "DEAD" &&
          col("in_topology")).as("topology_removed"))
      .orderBy("node_id")

  /**
   * CLOSE_CONTAINER event ladder — CloseContainerEventHandler
   * (scm/container/CloseContainerEventHandler.java:79-140,156-190):
   * non-leader SCMs skip outright; an OPEN container FINALIZEs first
   * (→ CLOSING); only a CLOSING container sends the close command —
   * with force=true for any non-RATIS type (EC/STANDALONE must never
   * pass through QUASI_CLOSED), targeted at the pipeline's nodes or,
   * when the pipeline is already gone, at the known replica holders;
   * a close already queued on the lease manager is skipped; every
   * other state is a no-op.
   */
  def closeContainerEvents(events: DataFrame): DataFrame =
    events
      .withColumn("finalized", col("is_leader") && col("state") === "OPEN")
      .withColumn("eff_state",
        when(col("finalized"), lit("CLOSING")).otherwise(col("state")))
      .withColumn("action",
        when(!col("is_leader"), lit("SKIP_NOT_LEADER"))
          .when(col("eff_state") =!= "CLOSING", lit("NOOP"))
          .when(col("already_queued"), lit("SKIP_QUEUED"))
          .when(col("rep_type") =!= "RATIS", lit("SENT_FORCE"))
          .otherwise(lit("SENT")))
      .withColumn("n_targets",
        when(col("action").isin("SENT", "SENT_FORCE"),
          when(col("pipeline_exists"), col("n_pipeline_nodes"))
            .otherwise(col("n_replica_nodes")))
          .otherwise(lit(0L)))
      .select("event_id", "action", "finalized", "n_targets")
      .orderBy("event_id")

  /**
   * Background pipeline-creator config selection + run gate —
   * BackgroundPipelineCreator (scm/pipeline/BackgroundPipelineCreator
   * .java:197-285,291-301):
   *  - an invalid default replication config selects NOTHING (no
   *    guessing from raw values);
   *  - an EC default selects only RATIS/THREE, and only when
   *    ozone.scm.pipeline.create.ratis.three is on (EC pipelines
   *    themselves are write-path-allocated, not background-created);
   *  - a RATIS default walks the proto factor enum in declaration order
   *    (ONE, THREE; ZERO ignored) with skipCreation dropping RATIS/ONE
   *    unless auto-create-factor-one is on;
   *  - a STANDALONE default keeps only factor ONE;
   *  - the service runs only when the SCM is leader-ready AND (out of
   *    safemode OR safemode creation is enabled) (:291-301).
   */
  def pipelineCreatorConfigs(scenarios: DataFrame): DataFrame =
    scenarios
      .withColumn("configs",
        when(col("default_type") === "EC",
          when(col("create_ratis_three_for_ec"), lit("RATIS/THREE"))
            .otherwise(lit("")))
          .when(col("default_type") === "RATIS",
            when(col("auto_factor_one"), lit("RATIS/ONE,RATIS/THREE"))
              .otherwise(lit("RATIS/THREE")))
          .when(col("default_type") === "STAND_ALONE",
            lit("STANDALONE/ONE"))
          .otherwise(lit("")))
      .withColumn("runs",
        col("leader_ready") &&
          (!col("in_safemode") || col("create_in_safemode")))
      .select("sc_id", "configs", "runs")
      .orderBy("sc_id")

  /**
   * EC writable-container provider walk — WritableECContainerProvider
   * .getContainer (scm/pipeline/WritableECContainerProvider.java:93-186):
   *
   *  - maximumPipelines (:187-196) = max(floor(perVolumeFactor ×
   *    healthyVolumes / requiredNodes), minimumPipelines);
   *  - pre-gate (:98-110): while the open-pipeline count is below the
   *    limit a NEW pipeline+container allocates immediately — existing
   *    pipelines are never touched; an allocation failure falls through
   *    to the walk;
   *  - the walk tries open pipelines one at a time (the reference's try
   *    order is the (randomized) choose policy's; the per-pipeline
   *    DECISIONS are deterministic and modeled here in pipeline-id
   *    order): a pipeline with no container or whose single container
   *    cannot fit another full block (used + blockSize > containerSize,
   *    inclusive boundary — :264-269) is removed AND CLOSED, decrementing
   *    the open count (:138-145); a fitting pipeline that is excluded
   *    (container, pipeline id, or any member datanode on the exclude
   *    list, :219-246 — checked only AFTER the space rung) is removed
   *    but stays open; the first surviving pipeline is SELECTED;
   *  - final attempt (:162-181): when every pipeline was tried, the
   *    limit is raised to the healthy in-service NODE count if that
   *    exceeds it and the post-walk open count still has room — then a
   *    new allocation is tried (its failure rethrows); otherwise the
   *    request fails with "pipeline limit reached".
   *
   * Scale shape: requests × pipelines is a broadcast square of
   * control-plane dims; one conditional aggregate per request.
   */
  def ecContainerProvider(requests: DataFrame, pipelines: DataFrame,
                          excludes: DataFrame, blockSize: Long = 100000L,
                          containerSize: Long = 1000000L): DataFrame = {
    val open0 = pipelines.count()
    val classified = requests
      .crossJoin(broadcast(pipelines))
      .join(broadcast(excludes.withColumn("excluded", lit(true))),
        Seq("set_id", "pipeline_id"), "left")
      .withColumn("rung",
        when(!col("has_container") ||
          col("used_bytes") + blockSize > containerSize, lit("CLOSE"))
          .when(col("excluded").isNotNull, lit("SKIP"))
          .otherwise(lit("OK")))
    val walked = classified.groupBy("req_id")
      .agg(
        min(when(col("rung") === "OK", col("pipeline_id")))
          .as("selected"),
        sum(when(col("rung") === "CLOSE", 1L).otherwise(0L))
          .as("closed_all"),
        sum(when(col("rung") === "SKIP", 1L).otherwise(0L))
          .as("skipped_all"))
    val perSel = classified
      .join(walked.select("req_id", "selected"), Seq("req_id"))
      .filter(col("selected").isNotNull &&
        col("pipeline_id") < col("selected"))
      .groupBy("req_id")
      .agg(
        sum(when(col("rung") === "CLOSE", 1L).otherwise(0L))
          .as("closed_before"),
        sum(when(col("rung") === "SKIP", 1L).otherwise(0L))
          .as("skipped_before"))
    requests
      .join(walked, Seq("req_id"))
      .join(perSel, Seq("req_id"), "left")
      .withColumn("max0",
        greatest(expr("(factor_bp * healthy_volumes) DIV 50000"),
          col("min_pipelines")))
      .withColumn("pre_gate", lit(open0) < col("max0"))
      .withColumn("open_after", lit(open0) - col("closed_all"))
      .withColumn("final_max",
        when(col("open_after") >= col("max0") &&
          col("node_count") > col("max0"), col("node_count"))
          .otherwise(col("max0")))
      .withColumn("outcome",
        when(col("pre_gate") && !col("create_fails"),
          lit("NEW_ALLOC_PREMAX"))
          .when(col("selected").isNotNull, lit("SELECTED"))
          .when(col("open_after") < col("final_max"),
            when(col("create_fails"), lit("FAIL_CREATE"))
              .otherwise(lit("NEW_ALLOC_FINAL")))
          .otherwise(lit("FAIL_LIMIT")))
      .select(
        col("req_id"), col("max0").as("max_pipelines"), col("outcome"),
        when(col("outcome") === "SELECTED", col("selected"))
          .otherwise(lit(0L)).as("chosen_pipeline"),
        when(col("outcome") === "NEW_ALLOC_PREMAX", lit(0L))
          .when(col("outcome") === "SELECTED",
            coalesce(col("closed_before"), lit(0L)))
          .otherwise(col("closed_all")).as("n_closed"),
        when(col("outcome") === "NEW_ALLOC_PREMAX", lit(0L))
          .when(col("outcome") === "SELECTED",
            coalesce(col("skipped_before"), lit(0L)))
          .otherwise(col("skipped_all")).as("n_skipped"),
        // the node-count raise only ever happens at the final attempt
        when(col("outcome").isin("NEW_ALLOC_FINAL", "FAIL_CREATE",
          "FAIL_LIMIT"), col("final_max"))
          .otherwise(col("max0")).as("final_max"))
      .orderBy("req_id")
  }

  /**
   * DN volume AvailableSpaceFilter ladder — the eligibility core of
   * CapacityVolumeChoosingPolicy.chooseVolume (container-service/.../volume/
   * CapacityVolumeChoosingPolicy.java:64-113, AvailableSpaceFilter.java:43-70):
   * available = remaining − committed − hardSpare, a volume is eligible
   * only when available is STRICTLY above the requested container size;
   * an eligible volume whose reported-spare usable space is already at or
   * below the request sits in the soft band (counted, still usable); the
   * filter tracks the maximum available across ALL tested volumes — the
   * number surfaced by throwDiskOutOfSpace when nothing is eligible.
   */
  def volumeSpaceFilter(volumes: DataFrame, requiredSpace: Long): DataFrame =
    volumes
      .withColumn("available",
        col("remaining") - col("committed") - col("hard_spare"))
      .withColumn("usable_reported",
        col("remaining") - col("committed") - col("reported_spare"))
      .withColumn("verdict",
        when(col("available") <= requiredSpace, lit("REJECTED_HARD"))
          .when(col("usable_reported") <= requiredSpace, lit("SOFT_BAND"))
          .otherwise(lit("OK")))
      .withColumn("most_available",
        max("available").over(Window.partitionBy(lit(0))))
      .select("vol_id", "available", "usable_reported", "verdict",
        "most_available")
      .orderBy("vol_id")

  /**
   * Capacity-volume two-choices winner table — the deterministic kernel of
   * CapacityVolumeChoosingPolicy (:100-107): the random pick of two
   * eligible volumes is transport; the DECISION is
   * `firstRatio < secondRatio ? second : first` over freeSpaceRatio
   * (:119-129 — max(0, remaining − committed)/capacity, 0 when
   * capacity ≤ 0; the FIRST pick wins exact ties). Evaluated for every
   * ordered pair of eligible volumes via exact cross-multiplication
   * (free₁·cap₂ < free₂·cap₁ ⇔ ratio₁ < ratio₂ — no FP in either
   * engine); the volume dim is control-plane-sized, so the pair square
   * is too.
   */
  def capacityVolumePairs(volumes: DataFrame,
                          requiredSpace: Long): DataFrame = {
    val elig = volumes
      .filter(col("remaining") - col("committed") - col("hard_spare") >
        requiredSpace)
      .withColumn("free_eff",
        when(col("capacity") <= 0, lit(0L))
          .otherwise(greatest(col("remaining") - col("committed"), lit(0L))))
      .withColumn("cap_eff", greatest(col("capacity"), lit(1L)))
      .select("vol_id", "free_eff", "cap_eff")
    val fst = elig.select(col("vol_id").as("first_id"),
      col("free_eff").as("f_free"), col("cap_eff").as("f_cap"))
    val snd = elig.select(col("vol_id").as("second_id"),
      col("free_eff").as("s_free"), col("cap_eff").as("s_cap"))
    fst.crossJoin(snd)
      .withColumn("winner_id",
        when(col("f_free") * col("s_cap") < col("s_free") * col("f_cap"),
          col("second_id")).otherwise(col("first_id")))
      .select("first_id", "second_id", "winner_id")
      .orderBy("first_id", "second_id")
  }

  /**
   * Capacity-pipeline comparator walk — CapacityPipelineChoosePolicy
   * (scm/pipeline/choose/algorithms/CapacityPipelineChoosePolicy.java:
   * 69-79,107-133): each pipeline's member nodes sort DESCENDING by
   * scmUsed weight and the two stacks pop pairwise until a round
   * differs; `result <= 0` keeps the FIRST pick — so a same-id pair, an
   * all-equal prefix with one stack exhausted, and a genuinely equal
   * walk all resolve FIRST. A round compares SCMNodeMetric
   * (SCMNodeMetric.java:60-81): weights used/capacity (capacity 0 → 1)
   * decide when they differ by more than 1e-6, otherwise raw used bytes
   * break the tie. Both the epsilon band and the sign are exact integer
   * arithmetic here (|u₁c₂ − u₂c₁|·10⁶ > c₁c₂ — the reference's float
   * path agrees except within ~1e-7 of the band edge, which the
   * fixtures stay clear of); the per-pipeline sort uses the 10⁶-scaled
   * weight with a raw-used tiebreak, which matches the comparator order
   * for weights separated beyond the band.
   */
  def pipelineCapacityCompare(pipeNodes: DataFrame): DataFrame = {
    val capEff = expr("CASE WHEN capacity = 0 THEN 1 ELSE capacity END")
    val ranked = pipeNodes
      .withColumn("cap_eff", capEff)
      .withColumn("w_scaled", expr("used * 1000000 DIV cap_eff"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("pipeline_id")
          .orderBy(col("w_scaled").desc, col("used").desc, col("node"))))
      .select("pipeline_id", "rnk", "used", "cap_eff")
    val dim = pipeNodes.select("pipeline_id").distinct()
    val pairs = dim.select(col("pipeline_id").as("first_id"))
      .crossJoin(dim.select(col("pipeline_id").as("second_id")))
    val a = ranked.select(col("pipeline_id").as("first_id"),
      col("rnk"), col("used").as("u1"), col("cap_eff").as("c1"))
    val b = ranked.select(col("pipeline_id").as("second_id"),
      col("rnk"), col("used").as("u2"), col("cap_eff").as("c2"))
    val rounds = a.join(b, Seq("rnk"))
      .withColumn("cross", col("u1") * col("c2") - col("u2") * col("c1"))
      .withColumn("cmp",
        when(abs(col("cross")) * 1000000L > col("c1") * col("c2"),
          signum(col("cross")).cast("long"))
          .when(col("u1") =!= col("u2"),
            when(col("u1") > col("u2"), 1L).otherwise(-1L))
          .otherwise(lit(0L)))
      .withColumn("mode",
        when(abs(col("cross")) * 1000000L > col("c1") * col("c2"),
          lit("WEIGHT"))
          .when(col("u1") =!= col("u2"), lit("RAW_USED"))
          .otherwise(lit("EQUAL")))
      .filter(col("cmp") =!= 0)
    val decided = rounds.groupBy("first_id", "second_id")
      .agg(min("rnk").as("decided_round"),
        min_by(col("cmp"), col("rnk")).as("cmp"),
        min_by(col("mode"), col("rnk")).as("mode"))
    pairs.join(decided, Seq("first_id", "second_id"), "left")
      .withColumn("same", col("first_id") === col("second_id"))
      .select(col("first_id"), col("second_id"),
        when(col("same"), lit("FIRST"))
          .when(col("cmp").isNull || col("cmp") <= 0, lit("FIRST"))
          .otherwise(lit("SECOND")).as("winner"),
        when(col("same") || col("cmp").isNull || col("cmp") <= 0,
          col("first_id")).otherwise(col("second_id")).as("winner_id"),
        when(col("same"), lit(0L))
          .otherwise(coalesce(col("decided_round"), lit(0L)))
          .as("decided_round"),
        when(col("same"), lit("SAME_ID"))
          .otherwise(coalesce(col("mode"), lit("EXHAUSTED"))).as("mode"))
      .orderBy("first_id", "second_id")
  }

  /**
   * SCM safemode exit-rule evaluation — one row per rule with its required
   * vs actual count and the verdict, plus the overall EXIT_SAFEMODE fold:
   *   - CONTAINER (AbstractContainerSafeModeRule.java:83-99): cutOff =
   *     ceil(totalContainers × 99%), satisfied once that many containers
   *     have a reported replica;
   *   - HEALTHY_PIPELINE (HealthyPipelineSafeModeRule.java:113-114):
   *     threshold = ceil(10% × pipelines), counted over open Ratis/THREE
   *     pipelines with a leader;
   *   - ONE_REPLICA_PIPELINE (OneReplicaPipelineSafeModeRule.java:214):
   *     threshold = ceil(90% × pipelines), a pipeline reports once any
   *     member datanode is alive;
   *   - DATANODE (DataNodeSafeModeRule.java:40-66): a configured minimum
   *     of registered (non-dead) nodes, default 1.
   * Thresholds are the reference defaults in basis points; ceil is exact
   * integer math ((total·bp + 9999) DIV 10000), so the oracle reproduces
   * every count. All inputs are control-plane tables except `replicas`,
   * which aggregates to a reported-container count first.
   */
  def safemodeStatus(datanodes: DataFrame, pipelines: DataFrame,
                     pipelineMembers: DataFrame, containersScm: DataFrame,
                     replicas: DataFrame,
                     containerCutoffBp: Long = 9900L,
                     healthyPipelineBp: Long = 1000L,
                     oneReplicaBp: Long = 9000L,
                     requiredDns: Long = 1L): DataFrame = {
    // exact integer ceil(total · bp / 10000); every caller names the
    // count column `total`
    def ceilBp(bp: Long): Column = expr(s"(total * $bp + 9999) DIV 10000")
    val containers = containersScm.filter(col("state") =!= "DELETED")
      .select("container_id")
    val reported = containers
      .join(replicas.select("container_id").distinct(), Seq("container_id"),
        "left_semi")
    val containerRule = containers.agg(count(lit(1)).as("total"))
      .crossJoin(broadcast(reported.agg(count(lit(1)).as("actual"))))
      .select(lit("CONTAINER").as("rule"),
        ceilBp(containerCutoffBp).as("required"),
        col("actual"))
    val pipelineTotal = pipelines.agg(count(lit(1)).as("total"))
    val healthyRule = pipelineTotal
      .crossJoin(broadcast(pipelines
        .filter(col("replication") === "RATIS/THREE" &&
          col("state") === "OPEN" && col("leader_node").isNotNull)
        .agg(count(lit(1)).as("actual"))))
      .select(lit("HEALTHY_PIPELINE").as("rule"),
        ceilBp(healthyPipelineBp).as("required"), col("actual"))
    val liveMembers = pipelineMembers
      .join(broadcast(datanodes.filter(col("state") =!= "DEAD")
        .select(col("uuid").as("datanode"))), Seq("datanode"), "left_semi")
      .select("pipeline_id").distinct()
    val oneReplicaRule = pipelineTotal
      .crossJoin(broadcast(liveMembers.agg(count(lit(1)).as("actual"))))
      .select(lit("ONE_REPLICA_PIPELINE").as("rule"),
        ceilBp(oneReplicaBp).as("required"), col("actual"))
    val dnRule = datanodes.filter(col("state") =!= "DEAD")
      .agg(count(lit(1)).as("actual"))
      .select(lit("DATANODE").as("rule"), lit(requiredDns).as("required"),
        col("actual"))
    val rules = containerRule.unionByName(healthyRule)
      .unionByName(oneReplicaRule).unionByName(dnRule)
      .withColumn("satisfied", col("actual") >= col("required"))
    val exitRow = rules
      .agg(count(lit(1)).as("required"),
        sum(when(col("satisfied"), 1L).otherwise(0L)).as("actual"))
      .select(lit("EXIT_SAFEMODE").as("rule"), col("required"), col("actual"))
      .withColumn("satisfied", col("actual") >= col("required"))
    rules.unionByName(exitRow).orderBy("rule")
  }

  /** Deleted-directory purge backlog: each deleted dir with the file count
    * and bytes still pending purge in its subtree — the Recon OM-insight
    * over deletedDirectoryTable. Same two-stage shape as
    * [[Aggregates.nsSummary]] (a dir's subtree aggregate is its rollup
    * row), but the broadcast join against the deleted set lands BETWEEN
    * the ancestor explode and the final aggregate, so only ancestors that
    * ARE deleted dirs reach the dir-level shuffle (deleted ≪ all dirs) —
    * no full-namespace rollup materializes, no per-dir subtree scans.
    * (An explode-first variant that skips the leaf pre-agg measured ~30%
    * slower at sf0.1, and the pre-agg's files-per-dir reduction only grows
    * at production scale.) */
  def deletedDirsInsight(objects: DataFrame,
                         deletedDirs: DataFrame): DataFrame =
    objects
      .withColumn("leaf", Aggregates.parentDirOf("key"))
      .filter(col("leaf") =!= "")
      .groupBy("volume", "bucket", "leaf")
      .agg(count(lit(1)).as("nf"), sum("data_size").as("sz"))
      .withColumn("dir", explode(Aggregates.dirAndAncestors("leaf")))
      .join(broadcast(deletedDirs), Seq("volume", "bucket", "dir"))
      .groupBy("volume", "bucket", "dir", "deleted_ms")
      .agg(sum("nf").as("pending_files"), sum("sz").as("pending_bytes"))
      .select("volume", "bucket", "dir", "deleted_ms", "pending_files",
        "pending_bytes")
      .orderBy("volume", "bucket", "dir")

  /** [[deletedDirsInsight]] over the key-sorted warehouse: a deleted dir's
    * pending backlog IS its namespace-rollup row, so feed
    * [[Aggregates.nsSummarySorted]]'s shuffle-free fold through the
    * broadcast deleted-dir probe — no leaf re-aggregation, no re-derived
    * scan, no shuffle at all before the final presentation sort. Same rows
    * as the unsorted dual (equivalence holds because both compute full
    * subtree rollups per dir). */
  def deletedDirsInsightSorted(nsRollup: DataFrame,
                               deletedDirs: DataFrame): DataFrame =
    nsRollup
      .join(broadcast(deletedDirs), Seq("volume", "bucket", "dir"))
      .select(col("volume"), col("bucket"), col("dir"), col("deleted_ms"),
        col("num_files").as("pending_files"),
        col("size_of_files").as("pending_bytes"))
      .orderBy("volume", "bucket", "dir")

  /**
   * Recon ClusterStateEndpoint (`recon/.../api/ClusterStateEndpoint.java:
   * 97-200`) as one summary row: global table counts (volumes / buckets /
   * keys), SCM container counts by state plus MISSING (a live container
   * with zero reported replicas — the endpoint's unhealthy-containers
   * probe), pipeline counts, datanode counts/health and raw capacity
   * totals, and the deleted-dir backlog size.
   *
   * Scale shape: every input is either a control-plane catalog or an
   * already-maintained rollup; each aggregate is a map-side-combined
   * single-row reduction, and the final assembly is a broadcast cross of
   * one-row frames. The only key-table touch is the `keys` count —
   * served incrementally at scale by the streamed global-counts view
   * (q_stream_counts), scanned here for the batch dual.
   */
  def clusterState(volumes: DataFrame, buckets: DataFrame,
                   objects: DataFrame, containersScm: DataFrame,
                   replicas: DataFrame, datanodes: DataFrame,
                   pipelines: DataFrame,
                   deletedDirs: DataFrame): DataFrame = {
    val v = volumes.agg(count(lit(1)).as("volumes"))
    val b = buckets.agg(count(lit(1)).as("buckets"))
    val k = objects.agg(count(lit(1)).as("keys"))
    val c = containersScm.agg(
      count(lit(1)).as("containers_total"),
      sum(when(col("state") === "OPEN", 1L).otherwise(0L))
        .as("containers_open"),
      sum(when(col("state") === "CLOSED", 1L).otherwise(0L))
        .as("containers_closed"),
      sum(when(col("state") === "DELETED", 1L).otherwise(0L))
        .as("containers_deleted"))
    val m = containersScm.filter(col("state") =!= "DELETED")
      .join(replicas.select("container_id").distinct(),
        Seq("container_id"), "left_anti")
      .agg(count(lit(1)).as("containers_missing"))
    val p = pipelines.agg(count(lit(1)).as("pipelines_total"),
      sum(when(col("state") === "OPEN", 1L).otherwise(0L))
        .as("pipelines_open"))
    val d = datanodes.agg(count(lit(1)).as("datanodes_total"),
      sum(when(col("state") === "HEALTHY", 1L).otherwise(0L))
        .as("datanodes_healthy"),
      sum("capacity").as("capacity_total"),
      sum("used").as("capacity_used"))
    val dd = deletedDirs.agg(count(lit(1)).as("deleted_dirs"))
    v.crossJoin(b).crossJoin(k).crossJoin(c).crossJoin(m).crossJoin(p)
      .crossJoin(d).crossJoin(dd)
  }

  /**
   * Recon storage-distribution report — the one-row composite the
   * /storageDistribution endpoint serves
   * (recon/.../api/StorageDistributionEndpoint.java:105-167
   * getStorageDistribution + calculateGlobalStorageReport:...,
   * calculateNamespaceMetrics:288-311, calculateOpenKeySizes;
   * ReconGlobalMetricsService.java:71-154 open/MPU summaries,
   * :218-247 calculatePendingSizes):
   *   - global storage = sums of every datanode's storage report
   *     (capacity/used/remaining/committed + the reserved and
   *     minimum-free floors, modeled as the fixture's 5%-of-capacity
   *     reserve and a 0.5% min-free floor);
   *   - open_key_bytes / open_mpu_bytes = REPLICATED sizes of the open
   *     key+file tables and the in-flight MPU parts (the fixture's MPUs
   *     are RATIS/THREE, so ×3);
   *   - pending_key_bytes = replicated bytes buffered in the
   *     deletedTable (the [[Lifecycle.deletedKeysInsight]] population);
   *   - pending_dir_bytes = Σ over deletedDirTable entries of the dir's
   *     SUBTREE replicated size — the reference resolves each deleted
   *     dir through its NSSummary (fetchSizeForDeletedDirectory), so
   *     this joins the [[Aggregates.nsSummary]] rollup to the
   *     deleted-dir dim (nested deleted dirs double-count, as there);
   *   - total_used_namespace = pendingDir + pendingKey + openKey +
   *     finalized, totalKeys = keyTable + fileTable counts.
   *
   * Scale shape: every input aggregates DOWN to a 1-row frame before the
   * final crossJoin of six singletons; the only data-plane shuffles are
   * the per-table hash aggs and the nsSummary rollup (two-stage,
   * per-dir explode), with the deleted-dir dim broadcast into it.
   */
  def storageDistribution(datanodes: DataFrame, objects: DataFrame,
                          dirRollup: DataFrame, openKeys: DataFrame,
                          multipartParts: DataFrame,
                          deletedDirs: DataFrame): DataFrame = {
    val storage = datanodes.agg(
      sum("capacity").as("total_capacity"),
      sum("used").as("total_used"),
      sum("remaining").as("total_remaining"),
      sum("committed").as("total_committed"),
      sum(expr("capacity DIV 100 * 5")).as("total_reserved"),
      sum(expr("capacity DIV 200")).as("total_min_free"))
    val delPred = (col("version") === 4 || col("version") === 5) &&
      expr("(object_id DIV 10) % 10") === 0
    val keys = objects.agg(
      coalesce(sum(when(delPred, col("replicated_size"))), lit(0L))
        .as("pending_key_bytes"),
      coalesce(sum(when(!delPred, col("replicated_size"))), lit(0L))
        .as("finalized_key_bytes"),
      sum(when(!delPred, 1L).otherwise(0L)).as("total_keys"))
    val open = openKeys.agg(
      coalesce(sum("replicated_size"), lit(0L)).as("open_key_bytes"))
    val mpu = multipartParts.agg(
      (coalesce(sum("size"), lit(0L)) * 3).as("open_mpu_bytes"))
    // dirRollup is the NSSummary view (the caller passes the SORTED
    // zero-shuffle fold, [[Aggregates.nsSummarySorted]], exactly what
    // the reference's fetchSizeForDeletedDirectory reads); the deleted
    // dirs resolve through it with one broadcast semi-probe
    val pendingDir = dirRollup
      .join(broadcast(deletedDirs.select("volume", "bucket", "dir")),
        Seq("volume", "bucket", "dir"))
      .agg(coalesce(sum("replicated_size"), lit(0L))
        .as("pending_dir_bytes"))
    storage.crossJoin(keys).crossJoin(open).crossJoin(mpu)
      .crossJoin(pendingDir)
      .withColumn("total_used_namespace",
        col("pending_dir_bytes") + col("pending_key_bytes") +
          col("open_key_bytes") + col("finalized_key_bytes"))
  }

  /**
   * SCM container-report ingest fold (ContainerReportHandler:108-192 +
   * IncrementalContainerReportHandler:59-108): a FULL report REPLACES
   * the datanode's replica set — anything the node previously held that
   * is absent from the report is now missing there and is removed
   * (:189-192 expectedContainersInDatanode leftovers); an INCREMENTAL
   * report upserts single replicas, with state DELETED meaning remove
   * (:99-100). So the fold is last-FCR-boundary + latest-event-wins per
   * (datanode, container) — the same shape as the ACL/prefix folds:
   * events before the node's last FCR are void, the survivors resolve
   * by seq, DELETED losers drop.
   *
   * Scale shape: one broadcast of the per-node FCR boundary into the
   * event scan + one hash agg on (datanode, container) — the natural
   * SCM ingest partitioning; no window over the report volume.
   */
  def containerReportFold(events: DataFrame): DataFrame = {
    val boundary = events.filter(col("kind") === "FCR")
      .groupBy("datanode").agg(max("seq").as("__fcr_seq"))
    events
      .join(broadcast(boundary), Seq("datanode"), "left")
      .filter(col("seq") >= coalesce(col("__fcr_seq"), lit(0L)))
      .groupBy("datanode", "container_id")
      .agg(max_by(col("replica_state"), col("seq")).as("__last"))
      .filter(col("__last") =!= "DELETED")
      .select(col("datanode"), col("container_id"),
        col("__last").as("replica_state"))
      .orderBy("datanode", "container_id")
  }

  /**
   * ReplicationManager under-replication queue (ReplicationQueue.java
   * :38-43 PriorityQueue ordering + ContainerHealthResult
   * .getWeightedRedundancy:148-156 + RatisContainerReplicaCount
   * .getRemainingRedundancy:641-646): a DEAD node's replicas are gone
   * (DeadNodeHandler removes them); CLOSED replicas on live IN_SERVICE
   * nodes are `available`, on DECOMMISSIONING / IN_MAINTENANCE nodes
   * `out_of_service`. A container queues when available < factor and
   * some copy survives somewhere; `due_to_out_of_service` when the
   * out-of-service copies would make it whole — those weigh a fixed
   * OUT_OF_SERVICE_REDUNDANCY = 5 (:94) so real under-replication always
   * drains first. remaining_redundancy = max(0, available+oos-1); the
   * fresh-build queue orders by (weighted, container_id) — requeueCount
   * is 0 for every entry, so the id tie-break is the deterministic stand
   * -in for arrival order.
   *
   * Scale shape: one broadcast of the 20-node catalog into the replica
   * scan, one count agg per container; the queue window runs on the
   * under-replicated survivors only (control-plane-sized).
   */
  /**
   * Ratis under-replication repair plan — the decision core of
   * `RatisUnderReplicationHandler.processAndSendCommands`
   * (`hadoop-hdds/server-scm/.../replication/RatisUnderReplicationHandler.java:84-167`)
   * with the exact counting semantics of `RatisContainerReplicaCount`
   * (`RatisContainerReplicaCount.java:141-180` countReplicas,
   * `:356-374` missingReplicas with the maintenance discount and the
   * `minHealthyForMaintenance = min(rf, 2)` floor, `:608-618`
   * redundancyDelta, `:536-540` isSufficientlyReplicated(pendingAdd)).
   * One verdict row per live container:
   *
   *   1. all replicas empty on a QUASI_CLOSED container ⇒ SKIP_EMPTY_QC
   *      (EmptyContainerHandler owns deletion, :93-98);
   *   2. vulnerable UNHEALTHY replicas (QUASI_CLOSED container with a
   *      healthy/unhealthy mix; UNHEALTHY, non-empty, sequence-matched
   *      replicas on healthy-but-LEAVING nodes whose origin has no other
   *      sequence-matched copy on an IN_SERVICE node,
   *      `RatisContainerReplicaCount.getVulnerableUnhealthyReplicas`
   *      :466-523) ⇒ each is replicated off the leaving node
   *      (REPLICATE_VULNERABLE, one command per source :176-207), unless
   *      pending adds already cover them ⇒ SKIP_VULNERABLE_PENDING
   *      (:196-200);
   *   3. verifyUnderReplication (:316-357) in reference order:
   *      NOT_UNDER (sufficient without unhealthy), PENDING_FIX
   *      (sufficient once pending adds land), UNRECOVERABLE (zero
   *      replicas), PENDING_UNHEALTHY_FIX (only-UNHEALTHY copies
   *      sufficient after pending adds); the surviving counting mode is
   *      withoutUnhealthy when any healthy copy exists, else
   *      withUnhealthy (:352-356);
   *   4. sources (:370-443): CLOSED replicas, plus QUASI_CLOSED when no
   *      CLOSED copy exists or the container itself is QUASI_CLOSED,
   *      plus UNHEALTHY when there are no healthy copies at all; the
   *      node must be HEALTHY and not pending replica deletion; only the
   *      max-sequence-id sources survive (stale copies are never
   *      sources). none ⇒ NO_SOURCES (:127-131);
   *   5. else REPLICATE with additionalReplicaNeeded commands (:149-166;
   *      target choice itself is q_replica_placement's rack-aware walk).
   *
   * Pending-op bookkeeping mirrors :120-136: a pending DELETE on a DN
   * whose replica is UNHEALTHY is only counted when unhealthy copies are
   * being considered.
   *
   * Fixture: the shared replica synthesis (Tables.replicas) re-derived
   * with its ordinal kept and extended deterministically — %53 empty
   * QUASI_CLOSED, %58 (⊂ %29) QUASI_CLOSED with the UNHEALTHY copy, %119
   * QUASI_CLOSED, %59 all-UNHEALTHY, %61 zero replicas, %67 CLOSING
   * (mismatched-but-healthy), %43 stale first copy (seq-1), pending ADD
   * on %31/%116/%118, pending DELETE of the first copy on %37.
   *
   * Scale shape: two hash aggregates over the replica map (counts, then
   * source selection) re-joined through the broadcast container spine; the
   * node dim broadcasts; no windows over data-plane rows.
   */
  /** Shared container spine for the replication-repair fixtures:
    * %53/%58/%119 QUASI_CLOSED, BCSID = id*100, EC type on %188. */
  private def urpContainers(containersScm: DataFrame): DataFrame =
    containersScm.filter(col("state") =!= "DELETED")
      .withColumn("container_state",
        when(col("container_id") % 53 === 0 ||
          col("container_id") % 58 === 0 ||
          col("container_id") % 119 === 0, lit("QUASI_CLOSED"))
          .otherwise(lit("CLOSED")))
      .withColumn("c_seq", col("container_id") * 100L)
      .withColumn("repl_type",
        when(col("container_id") % 188 === 0, lit("EC"))
          .otherwise(lit("RATIS")))
      .select("container_id", "container_state", "replication_factor",
        "c_seq", "repl_type")

  /** Shared replica synthesis for the replication-repair fixtures:
    * Tables.replicas re-derived with its ordinal kept, extended with the
    * repair dimensions — %59 all-UNHEALTHY, %29 one UNHEALTHY, %67/%106
    * CLOSING, %61/%89 zero replicas, %43 stale first copy, %94 all
    * stale, %212 one copy AHEAD of the container BCSID, %53/%47 all
    * empty, per-replica origin, node dim joined. */
  private def urpReplicas(cont: DataFrame, datanodes: DataFrame)
      : DataFrame = {
    val spark = datanodes.sparkSession
    val dn = datanodes.select(col("uuid").as("datanode"),
      col("state").as("node_state"), col("op_state"))
    val c = col("container_id")
    cont.crossJoin(spark.range(4).toDF("r"))
      .filter(
        (col("r") <= 2 && !(c % 13 === 0 && col("r") === 2)) ||
          (col("r") === 3 && c % 17 === 0))
      .filter(c % 61 =!= 0 && c % 89 =!= 0)
      .withColumn("dn_num",
        (c + when(c % 23 === 0, col("r") * 5).otherwise(col("r"))) % 20)
      .withColumn("datanode", concat(lit("dn"), col("dn_num").cast("string")))
      .withColumn("replica_state",
        when(c % 59 === 0, lit("UNHEALTHY"))
          .when(c % 29 === 0 && col("r") === 1, lit("UNHEALTHY"))
          .when(c % 67 === 0 || c % 106 === 0, lit("CLOSING"))
          .when(col("container_state") === "QUASI_CLOSED",
            lit("QUASI_CLOSED"))
          .otherwise(lit("CLOSED")))
      .withColumn("seq",
        col("c_seq") - when((col("r") === 0 && c % 43 === 0) ||
          c % 94 === 0, 1L).otherwise(0L) +
          when(col("r") === 1 && c % 212 === 0, 2L).otherwise(0L))
      .withColumn("is_empty",
        (c % 53 === 0 || c % 47 === 0).cast("boolean"))
      .withColumn("origin",
        concat(lit("dn"), ((c + col("r")) % 20).cast("string")))
      .join(broadcast(dn), Seq("datanode"))
  }

  def underReplicationPlan(datanodes: DataFrame,
                           containersScm: DataFrame): DataFrame = {
    val cont = urpContainers(containersScm)
    val c = col("container_id")
    val reps = urpReplicas(cont, datanodes)
    // pending ops (ContainerReplicaOp): ADD %31/%116/%118, DELETE of the
    // first copy on %37
    val pendingDelDn = concat(lit("dn"), (c % 20).cast("string"))
    val pend = cont.select(col("container_id"),
      when(c % 31 === 0 || c % 116 === 0 || c % 118 === 0, 1L)
        .otherwise(0L).as("n_add"),
      when(c % 37 === 0, pendingDelDn).otherwise(lit("")).as("del_dn"))
    underReplicationDecide(cont, reps, pend)
  }

  /** The decision core of [[underReplicationPlan]], over any prepared
    * (container, replica, pending-op) inputs — kept injectable so the
    * property spec can drive it with randomized cluster states. `reps`
    * must carry the joined container columns (container_state, c_seq)
    * plus (datanode, replica_state, seq, is_empty, origin, node_state,
    * op_state). */
  private[graft] def underReplicationDecide(
      cont: DataFrame, reps: DataFrame, pend: DataFrame): DataFrame = {
    val minHealthyForMaintenance = 2
    // the UNHEALTHY-replica DNs (delete-count gating, :106-118)
    val unhealthyFlag = col("replica_state") === "UNHEALTHY"
    // QC-replica-on-CLOSED-container with a stale sequence is treated
    // unhealthy too (RatisContainerReplicaCount.java:146-153)
    val treatedUnhealthy = unhealthyFlag ||
      (col("replica_state") === "QUASI_CLOSED" &&
        col("container_state") === "CLOSED" && col("seq") =!= col("c_seq"))
    val isLeaving = col("op_state") =!= "IN_SERVICE"
    val isMaint = col("op_state").isin("IN_MAINTENANCE",
      "ENTERING_MAINTENANCE")
    val isDecom = col("op_state").isin("DECOMMISSIONING", "DECOMMISSIONED")
    val counts = reps.groupBy("container_id")
      .agg(
        count(lit(1)).as("n_replicas"),
        min(col("is_empty").cast("int")).as("all_empty"),
        max((col("replica_state") === "CLOSED").cast("int"))
          .as("has_closed"),
        max((col("replica_state") =!= "UNHEALTHY").cast("int"))
          .as("any_healthy_state"),
        sum(when(!treatedUnhealthy && !isMaint && !isDecom, 1L)
          .otherwise(0L)).as("healthy_is"),
        sum(when(treatedUnhealthy && !isMaint && !isDecom, 1L)
          .otherwise(0L)).as("unhealthy_is"),
        sum(when(!treatedUnhealthy && isMaint, 1L).otherwise(0L))
          .as("maint_h"),
        sum(when(treatedUnhealthy && isMaint, 1L).otherwise(0L))
          .as("maint_u"),
        sum(when(!treatedUnhealthy && isDecom, 1L).otherwise(0L))
          .as("decom_h"),
        sum(when(treatedUnhealthy && isDecom, 1L).otherwise(0L))
          .as("decom_u"),
        // pending-delete targets holding an UNHEALTHY replica
        collect_set(when(treatedUnhealthy, col("datanode")))
          .as("unhealthy_dns"),
        // origins with a sequence-matched copy on an IN_SERVICE healthy
        // node (the vulnerable-origin probe, :513-521)
        collect_set(when(col("op_state") === "IN_SERVICE" &&
          col("node_state") === "HEALTHY" && col("seq") === col("c_seq"),
          col("origin"))).as("inservice_origins"))
    val vulnerable = reps
      .join(counts.select("container_id", "inservice_origins"),
        Seq("container_id"))
      .filter(unhealthyFlag && col("seq") === col("c_seq") &&
        !col("is_empty") && col("node_state") === "HEALTHY" &&
        !array_contains(col("inservice_origins"), col("origin")))
      .groupBy("container_id")
      .agg(count(lit(1)).as("n_vuln_raw"))
    // per-container scalar plan inputs
    val base = cont
      .join(counts.drop("inservice_origins"), Seq("container_id"), "left")
      .join(broadcast(vulnerable), Seq("container_id"), "left")
      .join(broadcast(pend), Seq("container_id"), "left")
      .na.fill(0L, Seq("n_replicas", "all_empty", "has_closed",
        "any_healthy_state", "healthy_is", "unhealthy_is", "maint_h",
        "maint_u", "decom_h", "decom_u", "n_vuln_raw", "n_add"))
      .withColumn("del_on_unhealthy",
        col("del_dn") =!= "" &&
          coalesce(array_contains(col("unhealthy_dns"), col("del_dn")),
            lit(false)))
      .withColumn("n_del_without",
        when(col("del_dn") =!= "" && !col("del_on_unhealthy"), 1L)
          .otherwise(0L))
      .withColumn("n_del_with",
        when(col("del_dn") =!= "", 1L).otherwise(0L))
      // mixed healthy/unhealthy gate for the vulnerable path (:472-489;
      // foundHealthy keys on replica STATE, not node classification)
      .withColumn("n_vulnerable",
        when(col("container_state") === "QUASI_CLOSED" &&
          col("any_healthy_state") === 1, col("n_vuln_raw"))
          .otherwise(0L))
    def missing(avail: Column, maint: Column): Column = {
      val delta = col("replication_factor") - avail
      when(delta < 0, delta).otherwise(
        when(delta > 0,
          greatest(greatest(delta - maint, lit(0L)),
            greatest(lit(minHealthyForMaintenance.toLong) - avail,
              lit(0L))))
          .otherwise(lit(0L)))
    }
    val availWithout = col("healthy_is")
    val availWith = col("healthy_is") + col("unhealthy_is")
    val maintWithout = col("maint_h")
    val maintWith = col("maint_h") + col("maint_u")
    val staged = base
      .withColumn("miss_without", missing(availWithout, maintWithout))
      .withColumn("miss_with", missing(availWith, maintWith))
      // healthy count (in-service + decommission + maintenance,
      // unhealthy never counted, :192-195) — identical in both modes
      .withColumn("healthy_count",
        col("healthy_is") + col("maint_h") + col("decom_h"))
      // redundancyDelta(includeDel=true, includeAdd)
      .withColumn("suff_without_noadd",
        col("miss_without") + col("n_del_without") <= 0)
      .withColumn("suff_without_add",
        col("miss_without") + col("n_del_without") - col("n_add") <= 0)
      .withColumn("suff_with_add",
        col("miss_with") + col("n_del_with") - col("n_add") <= 0)
      .withColumn("use_with", col("healthy_count") === 0)
      .withColumn("needed",
        when(col("use_with"),
          when(col("miss_with") < 0, col("miss_with") + col("n_del_with"))
            .otherwise(greatest(lit(0L),
              col("miss_with") - col("n_add") + col("n_del_with"))))
          .otherwise(
            when(col("miss_without") < 0,
              col("miss_without") + col("n_del_without"))
              .otherwise(greatest(lit(0L),
                col("miss_without") - col("n_add") +
                  col("n_del_without")))))
    // source selection (:370-443) over the replica rows
    val srcPred = (col("replica_state") === "CLOSED") ||
      (col("replica_state") === "QUASI_CLOSED" &&
        (col("has_closed") === 0 ||
          col("container_state") === "QUASI_CLOSED")) ||
      (col("replica_state") === "UNHEALTHY" && col("healthy_count") === 0)
    val sources = reps
      .join(staged.select("container_id", "has_closed", "healthy_count"),
        Seq("container_id"))
      .join(broadcast(pend.select("container_id", "del_dn")),
        Seq("container_id"), "left")
      .filter(srcPred && col("node_state") === "HEALTHY" &&
        (col("del_dn").isNull || col("datanode") =!= col("del_dn")))
      .withColumn("max_seq",
        max("seq").over(Window.partitionBy("container_id")))
      .filter(col("seq") === col("max_seq"))
      .groupBy("container_id")
      .agg(count(lit(1)).as("n_sources"),
        concat_ws(",", sort_array(collect_list(col("datanode"))))
          .as("src_dns"))
    staged
      .join(broadcast(sources), Seq("container_id"), "left")
      .na.fill(0L, Seq("n_sources")).na.fill("", Seq("src_dns"))
      .withColumn("verdict",
        when(col("n_replicas") > 0 && col("all_empty") === 1 &&
          col("container_state") === "QUASI_CLOSED",
          lit("SKIP_EMPTY_QC"))
          .when(col("n_vulnerable") > 0 &&
            col("n_add") >= col("n_vulnerable"),
            lit("SKIP_VULNERABLE_PENDING"))
          .when(col("n_vulnerable") > 0, lit("REPLICATE_VULNERABLE"))
          .when(col("suff_without_noadd"), lit("NOT_UNDER"))
          .when(col("suff_without_add"), lit("PENDING_FIX"))
          .when(col("n_replicas") === 0, lit("UNRECOVERABLE"))
          .when(col("suff_with_add") && col("healthy_count") === 0,
            lit("PENDING_UNHEALTHY_FIX"))
          .when(col("n_sources") === 0, lit("NO_SOURCES"))
          .otherwise(lit("REPLICATE")))
      .withColumn("n_commands",
        when(col("verdict") === "REPLICATE_VULNERABLE",
          col("n_vulnerable"))
          .when(col("verdict") === "REPLICATE", col("needed"))
          .otherwise(lit(0L)))
      .withColumn("needed",
        when(col("verdict").isin("REPLICATE", "NO_SOURCES"), col("needed"))
          .otherwise(lit(0L)))
      .withColumn("src_dns",
        when(col("verdict") === "REPLICATE", col("src_dns"))
          .otherwise(lit("")))
      .withColumn("n_sources",
        when(col("verdict").isin("REPLICATE", "NO_SOURCES"),
          col("n_sources")).otherwise(lit(0L)))
      .select("container_id", "container_state", "verdict", "needed",
        "n_vulnerable", "n_sources", "src_dns", "n_commands")
      .orderBy("container_id")
  }

  /**
   * Empty-container health check — `EmptyContainerHandler.handle`
   * (`hadoop-hdds/server-scm/.../replication/health/EmptyContainerHandler.java:55-126`):
   *
   *   - CLOSED container whose replicas are ALL state-CLOSED and empty
   *     (`isContainerEmptyAndClosed:139-146` — key count is NOT consulted,
   *     usedBytes can carry orphaned chunks) ⇒ EMPTY_CLOSED: every
   *     replica gets a delete command, and the container transitions
   *     DELETE — unless it is RATIS and NO replica BCSID matches the
   *     container's (:67-73, resurrection fencing): replicas are still
   *     deleted but the state stays (transition NONE; EC containers skip
   *     the fence);
   *   - QUASI_CLOSED container with ALL replicas empty in ANY state
   *     (`isContainerEmptyAndQuasiClosed:157-163`) ⇒ EMPTY_QUASI_CLOSED:
   *     the container BCSID is first bumped to the max replica BCSID if
   *     that is higher (:76-87, so resurrection sees the right fence),
   *     the DELETE transition fires, and delete commands go only to
   *     replicas in stable QUASI_CLOSED/CLOSED states (:175-185 —
   *     OPEN/CLOSING/UNHEALTHY copies are retried later);
   *   - CLOSED container with zero keys and zero replicas (:109-122, a
   *     closing-stuck container that never materialized) ⇒
   *     EMPTY_NO_REPLICAS: reported EMPTY, no commands, state kept;
   *   - anything else ⇒ NOT_EMPTY.
   *
   * Fixture: the shared repair synthesis — %47 empty CLOSED, %94 all
   * replicas stale (RATIS fence holds), %188 (⊂ %94) EC (fence
   * skipped), %53 empty QUASI_CLOSED, %106 (⊂ %53) CLOSING copies
   * (deletes deferred), %89 zero replicas with the OM key rollup
   * (containersOm drops %89 ⇒ zero keys).
   *
   * Scale shape: one hash aggregate over the replica map joined through
   * the broadcast container spine + the broadcast OM key rollup.
   */
  def emptyContainerCheck(datanodes: DataFrame, containersScm: DataFrame,
                          containersOm: DataFrame): DataFrame = {
    val cont = urpContainers(containersScm)
    val reps = urpReplicas(cont, datanodes)
    val agg = reps.groupBy("container_id")
      .agg(
        count(lit(1)).as("n_replicas"),
        min(col("is_empty").cast("int")).as("all_empty"),
        min((col("replica_state") === "CLOSED").cast("int"))
          .as("all_closed_state"),
        sum(when(col("replica_state").isin("CLOSED", "QUASI_CLOSED"), 1L)
          .otherwise(0L)).as("n_stable"),
        max(when(col("seq") === col("c_seq"), 1).otherwise(0))
          .as("any_seq_match"),
        max("seq").as("max_replica_seq"))
    val keys = containersOm.select(col("container_id"),
      col("num_keys"))
    cont
      .join(broadcast(agg), Seq("container_id"), "left")
      .join(broadcast(keys), Seq("container_id"), "left")
      .na.fill(0L, Seq("n_replicas", "all_empty", "all_closed_state",
        "n_stable", "any_seq_match", "num_keys"))
      .withColumn("empty_closed",
        col("container_state") === "CLOSED" && col("n_replicas") > 0 &&
          col("all_closed_state") === 1 && col("all_empty") === 1)
      .withColumn("empty_qc",
        col("container_state") === "QUASI_CLOSED" &&
          col("n_replicas") > 0 && col("all_empty") === 1)
      .withColumn("verdict",
        when(col("empty_closed"), lit("EMPTY_CLOSED"))
          .when(col("empty_qc"), lit("EMPTY_QUASI_CLOSED"))
          .when(col("container_state") === "CLOSED" &&
            col("num_keys") === 0 && col("n_replicas") === 0,
            lit("EMPTY_NO_REPLICAS"))
          .otherwise(lit("NOT_EMPTY")))
      .withColumn("n_delete_cmds",
        when(col("empty_closed"), col("n_replicas"))
          .when(col("empty_qc"), col("n_stable"))
          .otherwise(lit(0L)))
      .withColumn("transition",
        when(col("empty_closed") &&
          (col("repl_type") =!= "RATIS" || col("any_seq_match") === 1),
          lit("DELETE"))
          .when(col("empty_qc"), lit("DELETE"))
          .otherwise(lit("NONE")))
      .withColumn("new_bcs",
        when(col("empty_qc"),
          greatest(col("max_replica_seq"), col("c_seq")))
          .otherwise(col("c_seq")))
      .select("container_id", "container_state", "repl_type", "verdict",
        "n_delete_cmds", "transition", "new_bcs")
      .orderBy("container_id")
  }

  /**
   * ReplicationManager container health-check chain — the handler chain
   * built at `ReplicationManager.java:264-277`, folded per container to
   * the FIRST handler that handles it (`HealthCheck.handleChain`
   * semantics), RATIS plane (the EC rungs type-guard false; their repair
   * planes live in q_ec_under/over_replication):
   *
   *   1. OpenContainerHandler (:50-79): OPEN containers are ALWAYS
   *      handled; an unhealthy pipeline member or any state-mismatched
   *      replica triggers a close event (OPEN_WITHOUT_PIPELINE /
   *      OPEN_UNHEALTHY / OPEN_OK);
   *   2. ClosingContainerHandler (:59-133): CLOSING always handled —
   *      close commands to every non-UNHEALTHY replica; all-unhealthy
   *      flips the container QUASI_CLOSED; no replicas ⇒ MISSING;
   *   3. QuasiClosedContainerHandler (:58-136, side rung — NEVER
   *      handles): QUASI_CLOSED containers force-close when the max
   *      QUASI_CLOSED BCSID ≥ the max UNHEALTHY BCSID and the unique
   *      QC/UNHEALTHY origins reach the factor; else QUASI_CLOSED_STUCK
   *      (qc_force_close column);
   *   4. MismatchedReplicasHandler (:59-89, side rung — never handles):
   *      close commands to state-mismatched replicas of CLOSED/QC
   *      containers (n_mismatch_close);
   *   5. EmptyContainerHandler — the emptyContainerCheck rungs;
   *   6. DeletingContainerHandler (:56-76): DELETED and DELETING handled;
   *   7. QuasiClosedStuckReplicationCheck (:50-133): stuck QC containers
   *      with >1 origin, healthy copies and no full open-origin set —
   *      missing ⇒ QCS_MISSING, per-origin under ⇒ QCS_UNDER, over ⇒
   *      QCS_OVER, else unhandled;
   *   8. RatisReplicationCheckHandler (:78-166, checkHealth :188-280):
   *      under (unrecoverable ⇒ MISSING; recoverable-without-healthy
   *      defers to the unhealthy rung), over without unhealthy, over
   *      with unhealthy (CLOSED directly; QC only when a deletable
   *      duplicate-origin UNHEALTHY exists), MIS_REPLICATED placement
   *      (< min(rf, racks) racks), else healthy/unhealthy unhandled;
   *   9. RatisUnhealthyReplicationCheckHandler (:50-114): only-UNHEALTHY
   *      containers re-checked counting them — UNHEALTHY_UNDER /
   *      UNHEALTHY_OVER handled, plain UNHEALTHY reported but unhandled;
   *  10. VulnerableUnhealthyReplicasHandler (:59-95): QC containers with
   *      sequence-matched UNHEALTHY copies stranded on leaving nodes;
   *  11. fall-through NONE (HEALTHY / UNHEALTHY detail).
   *
   * Fixture: the shared repair synthesis + chain states layered on the
   * container spine (%151 OPEN, %157 CLOSING, %163 DELETING, DELETED
   * from the base catalog) and two stuck-QC families — %173 (UNHEALTHY
   * copy BCSID ahead ⇒ stuck, single-copy best origins ⇒ QCS_UNDER) and
   * %346 ⊂ %173 (duplicated origins ⇒ QCS_OVER); %187 QC mixes a
   * vulnerable UNHEALTHY copy on a leaving node into a sufficient set.
   *
   * Scale shape: one pass of per-container hash aggregates over the
   * replica map + a per-(container, origin) sub-aggregate on the stuck
   * subset; container/node/pipeline dims broadcast.
   */
  def containerHealthChain(datanodes: DataFrame, containersScm: DataFrame,
                           containersOm: DataFrame,
                           pipelineMembers: DataFrame): DataFrame = {
    val c = col("container_id")
    val isQcBase = c % 53 === 0 || c % 58 === 0 || c % 119 === 0
    val isQcExtra = c % 173 === 0 || c % 187 === 0
    val chainCont = containersScm
      .withColumn("chain_state",
        when(col("state") === "DELETED", lit("DELETED"))
          .when(c % 151 === 0, lit("OPEN"))
          .when(c % 157 === 0, lit("CLOSING"))
          .when(c % 163 === 0, lit("DELETING"))
          .when(isQcBase || isQcExtra, lit("QUASI_CLOSED"))
          .otherwise(lit("CLOSED")))
      .withColumn("container_state",
        when(isQcBase, lit("QUASI_CLOSED")).otherwise(lit("CLOSED")))
      .withColumn("c_seq", c * 100L)
      .select("container_id", "chain_state", "container_state",
        "replication_factor", "c_seq")
    // replica synthesis (the shared repair rows) + the chain's stuck-QC
    // families; DELETED containers keep their rows — rung 6 fires first
    val baseReps = urpReplicas(chainCont, datanodes)
      .withColumn("replica_state",
        when(c % 173 === 0 || c % 187 === 0,
          when(col("r") === 1, lit("UNHEALTHY"))
            .otherwise(lit("QUASI_CLOSED")))
          .otherwise(col("replica_state")))
      .withColumn("seq",
        when(c % 173 === 0 && col("r") === 1, col("c_seq") + 5L)
          .when(c % 346 === 0 && col("r") === 0, col("c_seq") + 1L)
          .otherwise(col("seq")))
    // %346 moved copies: the best origin (r0, BCSID+1) duplicated once,
    // the non-best r2 origin duplicated twice (its own node is
    // decommissioning) — a pure per-origin excess
    val newDn = datanodes.select(col("uuid").as("datanode"),
      col("state").as("node_state"), col("op_state"))
    val dups = baseReps.filter(c % 346 === 0 && col("r").isin(0L, 2L))
      .withColumn("off", explode(when(col("r") === 0, array(lit(3L)))
        .otherwise(array(lit(7L), lit(9L)))))
      .withColumn("dn_num", (c + col("off")) % 20)
      .withColumn("datanode",
        concat(lit("dn"), col("dn_num").cast("string")))
      .drop("node_state", "op_state", "off")
      .join(broadcast(newDn), Seq("datanode"))
    val reps = baseReps.unionByName(dups.select(baseReps.columns.map(col): _*))
    val pend = chainCont.select(col("container_id"),
      when(c % 31 === 0 || c % 116 === 0 || c % 118 === 0, 1L)
        .otherwise(0L).as("n_add"),
      when(c % 37 === 0, concat(lit("dn"), (c % 20).cast("string")))
        .otherwise(lit("")).as("del_dn"))
    val treatedUnhealthy = col("replica_state") === "UNHEALTHY" ||
      (col("replica_state") === "QUASI_CLOSED" &&
        col("chain_state") === "CLOSED" && col("seq") =!= col("c_seq"))
    val isMaint = col("op_state").isin("IN_MAINTENANCE",
      "ENTERING_MAINTENANCE")
    val isDecom = col("op_state").isin("DECOMMISSIONING", "DECOMMISSIONED")
    val mismatched = col("replica_state") =!= "UNHEALTHY" &&
      col("replica_state") =!= col("chain_state")
    val counts = reps.groupBy("container_id")
      .agg(
        count(lit(1)).as("n_replicas"),
        min(col("is_empty").cast("int")).as("all_empty"),
        min((col("replica_state") === "CLOSED" && col("is_empty"))
          .cast("int")).as("all_closed_empty"),
        max((col("replica_state") =!= "UNHEALTHY").cast("int"))
          .as("any_healthy_state"),
        sum(when(!treatedUnhealthy && !isMaint && !isDecom, 1L)
          .otherwise(0L)).as("healthy_is"),
        sum(when(treatedUnhealthy && !isMaint && !isDecom, 1L)
          .otherwise(0L)).as("unhealthy_is"),
        sum(when(!treatedUnhealthy && isMaint, 1L).otherwise(0L))
          .as("maint_h"),
        sum(when(treatedUnhealthy && isMaint, 1L).otherwise(0L))
          .as("maint_u"),
        sum(when(!treatedUnhealthy && isDecom, 1L).otherwise(0L))
          .as("decom_h"),
        sum(when(treatedUnhealthy && isDecom, 1L).otherwise(0L))
          .as("decom_u"),
        collect_set(when(treatedUnhealthy, col("datanode")))
          .as("unhealthy_dns"),
        coalesce(max(when(col("replica_state") === "QUASI_CLOSED",
          col("seq"))), lit(-1L)).as("max_qc_seq"),
        coalesce(max(when(col("replica_state") === "UNHEALTHY",
          col("seq"))), lit(-1L)).as("max_unh_seq"),
        countDistinct(when(col("replica_state")
          .isin("QUASI_CLOSED", "UNHEALTHY"), col("origin")))
          .as("n_qcunh_origins"),
        countDistinct(when(col("replica_state")
          .isin("QUASI_CLOSED", "OPEN"), col("origin")))
          .as("n_open_origins"),
        countDistinct(col("origin")).as("n_origins"),
        countDistinct(col("dn_num") % 5).as("n_racks"),
        sum(when(mismatched &&
          (col("chain_state") === "CLOSED" ||
            col("chain_state") === "QUASI_CLOSED"), 1L).otherwise(0L))
          .as("n_mismatch_close"),
        sum(when(col("replica_state") =!= "UNHEALTHY", 1L).otherwise(0L))
          .as("n_nonunh"),
        // replica states all match an OPEN container? (rung 1)
        min((col("replica_state") === col("chain_state")).cast("int"))
          .as("all_match_state"),
        collect_set(when(col("op_state") === "IN_SERVICE" &&
          col("node_state") === "HEALTHY" && col("seq") === col("c_seq"),
          col("origin"))).as("inservice_origins"),
        // a deletable excess UNHEALTHY: duplicated origin (rung 8 QC-over)
        max(when(col("replica_state") === "UNHEALTHY", col("origin")))
          .as("any_unh_origin"))
    val vulnerable = reps
      .join(counts.select("container_id", "inservice_origins"),
        Seq("container_id"))
      .filter(col("replica_state") === "UNHEALTHY" &&
        col("seq") === col("c_seq") && !col("is_empty") &&
        col("node_state") === "HEALTHY" &&
        !array_contains(col("inservice_origins"), col("origin")))
      .groupBy("container_id").agg(count(lit(1)).as("n_vuln_raw"))
    // per-origin QCS accounting on the stuck-QC candidates
    val qcsFold = qcsPerOrigin(
      reps.withColumn("healthy", col("replica_state") =!= "UNHEALTHY")
        .withColumn("in_service", col("op_state") === "IN_SERVICE")
        .withColumn("maint", isMaint),
      2, 1, 2)
      .groupBy("container_id")
      .agg(max(when(col("under_delta") > 0, 1).otherwise(0))
        .as("qcs_under"),
        max(when(col("over_delta") > 0, 1).otherwise(0)).as("qcs_over"))
    // pipeline health for the OPEN rung: container -> pipeline (c % 12)
    val pipeBad = pipelineMembers
      .join(broadcast(datanodes.select(col("uuid").as("datanode"),
        col("state").as("node_state"))), Seq("datanode"))
      .groupBy("pipeline_id")
      .agg(max(when(col("node_state") =!= "HEALTHY", 1).otherwise(0))
        .as("bad_member"))
    val staged = chainCont
      .join(counts.drop("inservice_origins"), Seq("container_id"), "left")
      .join(broadcast(vulnerable), Seq("container_id"), "left")
      .join(broadcast(qcsFold), Seq("container_id"), "left")
      .join(broadcast(pend), Seq("container_id"), "left")
      .join(broadcast(containersOm.select(col("container_id"),
        col("num_keys"))), Seq("container_id"), "left")
      .withColumn("pipeline_id",
        concat(lit("pipeline-"), (c % 12).cast("string")))
      .join(broadcast(pipeBad), Seq("pipeline_id"), "left")
      .na.fill(0L, Seq("n_replicas", "all_empty", "all_closed_empty",
        "any_healthy_state", "healthy_is", "unhealthy_is", "maint_h",
        "maint_u", "decom_h", "decom_u", "n_qcunh_origins",
        "n_open_origins", "n_origins", "n_racks", "n_mismatch_close",
        "n_nonunh", "all_match_state", "n_vuln_raw", "qcs_under",
        "qcs_over", "n_add", "num_keys", "bad_member"))
      .na.fill("", Seq("del_dn"))
      .withColumn("del_on_unhealthy",
        col("del_dn") =!= "" &&
          coalesce(array_contains(col("unhealthy_dns"), col("del_dn")),
            lit(false)))
      .withColumn("n_del_without",
        when(col("del_dn") =!= "" && !col("del_on_unhealthy"), 1L)
          .otherwise(0L))
      .withColumn("n_del_with",
        when(col("del_dn") =!= "", 1L).otherwise(0L))
      .withColumn("healthy_count",
        col("healthy_is") + col("maint_h") + col("decom_h"))
      .withColumn("n_vulnerable",
        when(col("chain_state") === "QUASI_CLOSED" &&
          col("any_healthy_state") === 1, col("n_vuln_raw"))
          .otherwise(0L))
    def miss(avail: Column, maintC: Column): Column = {
      val delta = col("replication_factor") - avail
      when(delta < 0, delta).otherwise(
        when(delta > 0, greatest(greatest(delta - maintC, lit(0L)),
          greatest(lit(2L) - avail, lit(0L)))).otherwise(lit(0L)))
    }
    val missW = miss(col("healthy_is"), col("maint_h"))
    val missU = miss(col("healthy_is") + col("unhealthy_is"),
      col("maint_h") + col("maint_u"))
    val calc = staged
      .withColumn("miss_without", missW)
      .withColumn("miss_with", missU)
      .withColumn("suff_without",
        col("miss_without") + col("n_del_without") <= 0)
      .withColumn("over_without", col("miss_without") < 0)
      .withColumn("over_with", col("miss_with") < 0)
      .withColumn("suff_with_unh",
        col("miss_with") + col("n_del_with") <= 0)
      .withColumn("over_with_del",
        col("miss_with") + col("n_del_with") < 0)
      .withColumn("qc_force_close",
        when(col("chain_state") === "QUASI_CLOSED" &&
          col("max_qc_seq") > -1L &&
          col("max_qc_seq") >= col("max_unh_seq") &&
          col("n_qcunh_origins") >= col("replication_factor"), 1)
          .otherwise(0))
      .withColumn("qcs_stuck",
        col("chain_state") === "QUASI_CLOSED" &&
          col("qc_force_close") === 0 && col("n_origins") > 1 &&
          col("n_open_origins") < col("replication_factor"))
      // rung-8 QC over-with-unhealthy deletable probe: an UNHEALTHY
      // copy whose origin is duplicated among the replicas
      .withColumn("deletable_unh", col("unhealthy_is") + col("maint_u") +
        col("decom_u") > 0 && col("n_origins") < col("n_replicas"))
    calc
      .withColumn("handled_by",
        when(col("chain_state") === "OPEN", lit("OPEN"))
          .when(col("chain_state") === "CLOSING", lit("CLOSING"))
          .when(col("chain_state").isin("DELETED", "DELETING"),
            lit("DELETING"))
          .when(col("chain_state") === "CLOSED" &&
            col("n_replicas") > 0 && col("all_closed_empty") === 1,
            lit("EMPTY"))
          .when(col("chain_state") === "QUASI_CLOSED" &&
            col("n_replicas") > 0 && col("all_empty") === 1,
            lit("EMPTY"))
          .when(col("chain_state") === "CLOSED" &&
            col("num_keys") === 0 && col("n_replicas") === 0,
            lit("EMPTY"))
          .when(col("qcs_stuck") && col("n_replicas") === 0,
            lit("QCS_CHECK"))
          .when(col("qcs_stuck") && col("any_healthy_state") === 1 &&
            (col("qcs_under") === 1 || col("qcs_over") === 1),
            lit("QCS_CHECK"))
          .when(!col("qcs_stuck") && !col("suff_without") &&
            col("n_replicas") === 0, lit("RATIS_CHECK"))
          .when(!col("qcs_stuck") && !col("suff_without") &&
            col("healthy_count") > 0, lit("RATIS_CHECK"))
          .when(!col("qcs_stuck") && col("suff_without") &&
            (col("over_without") ||
              (col("over_with") && (col("chain_state") === "CLOSED" ||
                col("deletable_unh")))), lit("RATIS_CHECK"))
          .when(!col("qcs_stuck") && col("suff_without") &&
            !col("over_without") && !(col("over_with") &&
              (col("chain_state") === "CLOSED" || col("deletable_unh")))
            && col("n_racks") <
              least(col("replication_factor"), lit(5L)),
            lit("RATIS_CHECK"))
          .when(col("healthy_count") === 0 &&
            col("unhealthy_is") + col("maint_u") + col("decom_u") > 0 &&
            !col("suff_with_unh"), lit("UNHEALTHY_CHECK"))
          .when(col("healthy_count") === 0 &&
            col("unhealthy_is") + col("maint_u") + col("decom_u") > 0 &&
            col("over_with_del"), lit("UNHEALTHY_CHECK"))
          .when(col("n_vulnerable") > 0, lit("VULNERABLE"))
          .otherwise(lit("NONE")))
      .withColumn("detail",
        when(col("handled_by") === "OPEN",
          when(col("bad_member") === 1, lit("OPEN_WITHOUT_PIPELINE"))
            .when(col("all_match_state") === 0, lit("OPEN_UNHEALTHY"))
            .otherwise(lit("OPEN_OK")))
          .when(col("handled_by") === "CLOSING",
            when(col("n_replicas") === 0, lit("CLOSING_MISSING"))
              .when(col("n_nonunh") === 0,
                lit("CLOSING_ALL_UNHEALTHY"))
              .otherwise(lit("CLOSING_CLOSE")))
          .when(col("handled_by") === "DELETING", col("chain_state"))
          .when(col("handled_by") === "EMPTY",
            when(col("chain_state") === "QUASI_CLOSED",
              lit("EMPTY_QUASI_CLOSED"))
              .when(col("n_replicas") === 0, lit("EMPTY_NO_REPLICAS"))
              .otherwise(lit("EMPTY_CLOSED")))
          .when(col("handled_by") === "QCS_CHECK",
            when(col("n_replicas") === 0, lit("QCS_MISSING"))
              .when(col("qcs_under") === 1, lit("QCS_UNDER"))
              .otherwise(lit("QCS_OVER")))
          .when(col("handled_by") === "RATIS_CHECK",
            when(!col("suff_without") && col("n_replicas") === 0,
              lit("MISSING"))
              .when(!col("suff_without"), lit("UNDER_REPLICATED"))
              .when(col("over_without") || col("over_with"),
                lit("OVER_REPLICATED"))
              .otherwise(lit("MIS_REPLICATED")))
          .when(col("handled_by") === "UNHEALTHY_CHECK",
            when(!col("suff_with_unh"), lit("UNHEALTHY_UNDER"))
              .otherwise(lit("UNHEALTHY_OVER")))
          .when(col("handled_by") === "VULNERABLE",
            lit("UNHEALTHY_VULNERABLE"))
          .otherwise(
            when(col("unhealthy_is") + col("maint_u") + col("decom_u")
              > 0, lit("UNHEALTHY")).otherwise(lit("HEALTHY"))))
      .select(col("container_id"), col("chain_state"), col("handled_by"),
        col("detail"), col("qc_force_close"),
        col("n_mismatch_close").cast("long").as("n_mismatch_close"))
      .orderBy("container_id")
  }

  /**
   * ReplicationManager report — the `ozone admin container report`
   * surface (`ReplicationManagerReport.java:50-251`): a pre-populated
   * stat per LifeCycleState and per ContainerHealthState, each health
   * stat carrying up to `sampleLimit` (100) sampled container ids in
   * chain-visit order (`incrementAndSample:225-234` caps the list, the
   * RM loop visits containers in id order; `ReplicationManager.java:1005`
   * counts every container's lifecycle state). Health increments are
   * re-derived from the chain fold's outputs — including the SIDE-rung
   * reports (QUASI_CLOSED_STUCK from the never-handling force-close
   * probe, MISSING from an empty CLOSING set, plain UNHEALTHY from the
   * only-UNHEALTHY recheck that reports without handling).
   *
   * Scale shape: one explode of ≤3 stat rows per container + one hash
   * agg over ~22 stat groups; the sample slice caps driver-bound data
   * at 100 ids per stat.
   */
  def replicationReport(datanodes: DataFrame, containersScm: DataFrame,
                        containersOm: DataFrame,
                        pipelineMembers: DataFrame,
                        sampleLimit: Int = 100): DataFrame =
    // the chain's expression tree is deep (13 rungs of CASE over a
    // dozen aggregates); persist it so the three increment projections
    // below scan one InMemoryRelation instead of re-optimizing and
    // re-executing the whole tree 3× (container-dim-sized)
    replicationReportFromChain(
      containerHealthChain(datanodes, containersScm,
        containersOm, pipelineMembers).persist(),
      sampleLimit)

  /** Report body over a prebuilt chain — lets callers that already hold
    * a materialized chain (SparkEntry memoizes it to parquet, shared
    * with q_health_check_chain) skip the fixture re-derivation. */
  def replicationReportFromChain(chain: DataFrame,
                                 sampleLimit: Int = 100): DataFrame = {
    val spark = chain.sparkSession
    import spark.implicits._
    val lifecycle = chain.select(col("chain_state").as("stat"),
      col("container_id"), lit(false).as("sampled"))
    val health = chain
      .withColumn("stat",
        when(col("detail") === "OPEN_WITHOUT_PIPELINE",
          lit("OPEN_WITHOUT_PIPELINE"))
          .when(col("detail") === "OPEN_UNHEALTHY", lit("OPEN_UNHEALTHY"))
          .when(col("detail") === "CLOSING_MISSING", lit("MISSING"))
          .when(col("handled_by") === "EMPTY", lit("EMPTY"))
          .when(col("detail") === "QCS_MISSING",
            lit("QUASI_CLOSED_STUCK_MISSING"))
          .when(col("detail") === "QCS_UNDER",
            lit("QUASI_CLOSED_STUCK_UNDER_REPLICATED"))
          .when(col("detail") === "QCS_OVER",
            lit("QUASI_CLOSED_STUCK_OVER_REPLICATED"))
          .when(col("detail") === "MISSING", lit("MISSING"))
          .when(col("detail") === "UNDER_REPLICATED",
            lit("UNDER_REPLICATED"))
          .when(col("detail") === "OVER_REPLICATED",
            lit("OVER_REPLICATED"))
          .when(col("detail") === "MIS_REPLICATED",
            lit("MIS_REPLICATED"))
          .when(col("detail") === "UNHEALTHY_UNDER",
            lit("UNHEALTHY_UNDER_REPLICATED"))
          .when(col("detail") === "UNHEALTHY_OVER",
            lit("UNHEALTHY_OVER_REPLICATED"))
          .when(col("detail") === "UNHEALTHY_VULNERABLE",
            lit("UNHEALTHY_UNDER_REPLICATED"))
          .when(col("handled_by") === "NONE" &&
            col("detail") === "UNHEALTHY", lit("UNHEALTHY")))
      .filter(col("stat").isNotNull)
      .select(col("stat"), col("container_id"), lit(true).as("sampled"))
    // the QC force-close side rung reports stuck containers even when a
    // later rung handles them
    val stuck = chain
      .filter(col("chain_state") === "QUASI_CLOSED" &&
        col("qc_force_close") === 0)
      .select(lit("QUASI_CLOSED_STUCK").as("stat"), col("container_id"),
        lit(true).as("sampled"))
    val statSpine = (Seq("OPEN", "CLOSING", "QUASI_CLOSED", "CLOSED",
      "DELETING", "DELETED") ++ Seq("HEALTHY", "UNDER_REPLICATED",
      "MIS_REPLICATED", "OVER_REPLICATED", "MISSING", "UNHEALTHY",
      "EMPTY", "OPEN_UNHEALTHY", "QUASI_CLOSED_STUCK",
      "OPEN_WITHOUT_PIPELINE", "UNHEALTHY_UNDER_REPLICATED",
      "UNHEALTHY_OVER_REPLICATED", "MISSING_UNDER_REPLICATED",
      "QUASI_CLOSED_STUCK_UNDER_REPLICATED",
      "QUASI_CLOSED_STUCK_OVER_REPLICATED",
      "QUASI_CLOSED_STUCK_MISSING")).toDF("stat")
    val agg = lifecycle.unionByName(health).unionByName(stuck)
      .groupBy("stat")
      .agg(count(lit(1)).as("cnt"),
        concat_ws(",", transform(slice(sort_array(collect_list(
          when(col("sampled"), col("container_id")))), 1, sampleLimit),
          _.cast("string"))).as("sample_ids"))
    statSpine.join(agg, Seq("stat"), "left")
      .na.fill(0L, Seq("cnt")).na.fill("", Seq("sample_ids"))
      .select("stat", "cnt", "sample_ids")
      .orderBy("stat")
  }

  /**
   * Datanode admin ladder — `NodeDecommissionManager`
   * (`server-scm/.../node/NodeDecommissionManager.java`):
   *   - host resolution first (`mapHostnamesToDatanodes:118-147`):
   *     unknown hosts error per-request (HOST_NOT_FOUND) and drop out
   *     of every later step;
   *   - non-forced DECOMMISSION batches run
   *     `checkIfDecommissionPossible:381-438` BEFORE any state change:
   *     numDecom counts only resolved IN_SERVICE nodes, and the batch
   *     FAILS WHOLE if any live (non-DELETED/DELETING) container on a
   *     valid node needs more than `inServiceHealthy − numDecom` nodes
   *     (requiredNodes: RATIS 3, EC rs-3-2 5) ⇒ every request verdicts
   *     BATCH_INSUFFICIENT_NODES, nothing starts;
   *   - non-forced MAINTENANCE batches run the same walk with
   *     `minInService` = maintenanceReplicaMinimum (2) for RATIS and
   *     min(data + remainingRedundancy, requiredNodes) = 4 for EC
   *     (:538-604); `--force` skips the walk (:483-492);
   *   - per node then: startDecommission (:362-379) IN_SERVICE →
   *     DECOMMISSIONING_STARTED, already-decommissioning → NOOP_ALREADY,
   *     else INVALID_STATE; startMaintenance (:513-536) IN_SERVICE →
   *     ENTERING_MAINTENANCE, already-maintenance → NOOP_ALREADY, else
   *     INVALID_STATE; recommission (:463-476) non-IN_SERVICE →
   *     QUEUED_RECOMMISSION, IN_SERVICE → NOOP_ALREADY.
   * Node HEALTH is irrelevant to the per-node rungs (op state only);
   * it only feeds the inServiceHealthy total.
   *
   * Fixture: a 6-batch request table over the node dim's hostnames —
   * single-node transitions in every op state, an unknown host per
   * family, one possible and one insufficient batch per check.
   *
   * Scale shape: the request batch and node dim broadcast; the only
   * data-plane touch is one semi-probe of the container maps under the
   * failing batches' nodes.
   */
  def decommissionAdmin(datanodes: DataFrame, containersScm: DataFrame,
                        replicas: DataFrame,
                        ecShards: DataFrame): DataFrame = {
    val spark = datanodes.sparkSession
    import spark.implicits._
    val reqs = Seq(
      (1L, "DECOMMISSION", false, "host1.rack1"),
      (1L, "DECOMMISSION", false, "host2.rack2"),
      (1L, "DECOMMISSION", false, "host5.rack0"),
      (1L, "DECOMMISSION", false, "ghost.example"),
      (1L, "DECOMMISSION", false, "host3.rack3"),
      (2L, "DECOMMISSION", false, "host0.rack0"),
      (2L, "DECOMMISSION", false, "host1.rack1"),
      (2L, "DECOMMISSION", false, "host4.rack4"),
      (2L, "DECOMMISSION", false, "host7.rack2"),
      (2L, "DECOMMISSION", false, "host9.rack4"),
      (2L, "DECOMMISSION", false, "host12.rack2"),
      (2L, "DECOMMISSION", false, "host15.rack0"),
      (3L, "MAINTENANCE", false, "host4.rack4"),
      (3L, "MAINTENANCE", false, "host11.rack1"),
      (3L, "MAINTENANCE", false, "host6.rack1"),
      (4L, "MAINTENANCE", false, "host0.rack0"),
      (4L, "MAINTENANCE", false, "host1.rack1"),
      (4L, "MAINTENANCE", false, "host4.rack4"),
      (4L, "MAINTENANCE", false, "host7.rack2"),
      (4L, "MAINTENANCE", false, "host9.rack4"),
      (4L, "MAINTENANCE", false, "host12.rack2"),
      (4L, "MAINTENANCE", false, "host15.rack0"),
      (5L, "MAINTENANCE", true, "host16.rack1"),
      (5L, "MAINTENANCE", true, "host2.rack2"),
      (5L, "MAINTENANCE", true, "host18.rack3"),
      (6L, "RECOMMISSION", false, "host2.rack2"),
      (6L, "RECOMMISSION", false, "host0.rack0"),
      (6L, "RECOMMISSION", false, "nosuch.host"))
      .toDF("batch_id", "op", "force", "host")
    val dn = datanodes.select(col("hostname").as("host"),
      col("uuid").as("datanode"), col("op_state"), col("state"))
    val resolved = reqs.join(broadcast(dn), Seq("host"), "left")
    val ist = datanodes
      .filter(col("op_state") === "IN_SERVICE" &&
        col("state") === "HEALTHY")
      .agg(count(lit(1)).as("in_service_total"))
    // per-batch valid-IN_SERVICE count
    val batchCounts = resolved.groupBy("batch_id")
      .agg(sum(when(col("datanode").isNotNull &&
        col("op_state") === "IN_SERVICE", 1L).otherwise(0L))
        .as("num_valid"))
    // the container walk: live containers on each node with thresholds
    val contDim = containersScm.filter(col("state") =!= "DELETED")
      .withColumn("is_ec", (col("container_id") % 12) % 3 === 2)
      .select("container_id", "is_ec")
    val nodeContainers = replicas.select("datanode", "container_id")
      .unionByName(ecShards.select("datanode", "container_id"))
      .join(broadcast(contDim), Seq("container_id"))
      .withColumn("req_nodes", when(col("is_ec"), 5L).otherwise(3L))
      .withColumn("min_in_service", when(col("is_ec"), 4L)
        .otherwise(2L))
    val probeBase = resolved
      .filter(col("datanode").isNotNull &&
        col("op_state") === "IN_SERVICE" && !col("force"))
      .select("batch_id", "op", "datanode")
      .join(broadcast(batchCounts), Seq("batch_id"))
      .crossJoin(broadcast(ist))
      .join(nodeContainers, Seq("datanode"))
    val batchFail = probeBase
      .filter(
        (col("op") === "DECOMMISSION" &&
          col("in_service_total") - col("num_valid") <
            col("req_nodes")) ||
          (col("op") === "MAINTENANCE" &&
            col("in_service_total") - col("num_valid") <
              col("min_in_service")))
      .select("batch_id").distinct()
      .withColumn("batch_failed", lit(true))
    resolved
      .join(broadcast(batchFail), Seq("batch_id"), "left")
      .na.fill(false, Seq("batch_failed"))
      .withColumn("verdict",
        when(col("datanode").isNull, lit("HOST_NOT_FOUND"))
          .when(col("batch_failed") && !col("force"),
            lit("BATCH_INSUFFICIENT_NODES"))
          .when(col("op") === "DECOMMISSION",
            when(col("op_state") === "IN_SERVICE",
              lit("DECOMMISSIONING_STARTED"))
              .when(col("op_state").isin("DECOMMISSIONING",
                "DECOMMISSIONED"), lit("NOOP_ALREADY"))
              .otherwise(lit("INVALID_STATE")))
          .when(col("op") === "MAINTENANCE",
            when(col("op_state") === "IN_SERVICE",
              lit("ENTERING_MAINTENANCE"))
              .when(col("op_state").isin("IN_MAINTENANCE",
                "ENTERING_MAINTENANCE"), lit("NOOP_ALREADY"))
              .otherwise(lit("INVALID_STATE")))
          .otherwise(
            when(col("op_state") =!= "IN_SERVICE",
              lit("QUEUED_RECOMMISSION"))
              .otherwise(lit("NOOP_ALREADY"))))
      .select("batch_id", "op", "force", "host", "verdict")
      .orderBy("batch_id", "host")
  }

  /**
   * Balancer start validation ladder — the RPC parameter rungs of
   * `SCMClientProtocolServer.startContainerBalancer` (:1197-1310, in
   * exact parameter order: threshold ∈ [0,100), positive move size,
   * datanode percentage ∈ (0,100], iterations ≥ 1 or -1, positive
   * entering/leaving sizes, positive interval/move/replication
   * timeouts) followed by `ContainerBalancer.startBalancer`
   * (:298-315): leader-readiness and safe-mode eligibility (:340-352),
   * the not-running state gate (:361-374), then
   * `validateConfiguration` (:458-505) against the 5 GB container
   * size — entering/leaving must exceed the container size and fit
   * within maxSizeToMovePerIteration. Unset parameters take the
   * ContainerBalancerConfiguration defaults (move 500 GB, entering
   * 26 GB, leaving 26 GB).
   *
   * Scale shape: a broadcast request dim and one CASE projection.
   */
  def balancerAdmin(datanodes: DataFrame): DataFrame = {
    val spark = datanodes.sparkSession
    import spark.implicits._
    val reqs = Seq(
      // req, thr, moveGb, dnPct, iter, entGb, leaveGb, intv, mvTo, rpTo,
      // leader, safemode, running
      (1L, Some(10.0), None, None, None, None, None, None, None, None,
        true, false, false),
      (2L, Some(100.0), None, None, None, None, None, None, None, None,
        true, false, false),
      (3L, Some(-0.1), None, None, None, None, None, None, None, None,
        true, false, false),
      (4L, None, Some(0L), None, None, None, None, None, None, None,
        true, false, false),
      (5L, None, None, Some(101), None, None, None, None, None, None,
        true, false, false),
      (6L, None, None, None, Some(0), None, None, None, None, None,
        true, false, false),
      (7L, None, None, None, Some(-1), None, None, None, None, None,
        true, false, false),
      (8L, None, None, None, None, Some(0L), None, None, None, None,
        true, false, false),
      (9L, None, None, None, None, None, Some(-3L), None, None, None,
        true, false, false),
      (10L, None, None, None, None, None, None, Some(0), None, None,
        true, false, false),
      (11L, None, None, None, None, None, None, None, Some(-1), None,
        true, false, false),
      (12L, None, None, None, None, None, None, None, None, Some(0),
        true, false, false),
      (13L, None, None, None, None, None, None, None, None, None,
        false, false, false),
      (14L, None, None, None, None, None, None, None, None, None,
        true, true, false),
      (15L, None, None, None, None, None, None, None, None, None,
        true, false, true),
      (16L, None, None, None, None, Some(5L), None, None, None, None,
        true, false, false),
      (17L, None, None, None, None, None, Some(4L), None, None, None,
        true, false, false),
      (18L, None, Some(20L), None, None, Some(30L), None, None, None,
        None, true, false, false),
      (19L, None, Some(20L), None, None, Some(10L), Some(25L), None,
        None, None, true, false, false),
      (20L, Some(15.0), Some(600L), Some(50), Some(3), Some(40L),
        Some(40L), Some(60), Some(30), Some(30), true, false, false))
      .toDF("req_id", "threshold", "move_gb", "dn_pct", "iterations",
        "entering_gb", "leaving_gb", "interval_min", "move_to",
        "repl_to", "leader", "safemode", "running")
    val containerGb = 5L
    val eff = reqs
      .withColumn("e_move", coalesce(col("move_gb"), lit(500L)))
      .withColumn("e_enter", coalesce(col("entering_gb"), lit(26L)))
      .withColumn("e_leave", coalesce(col("leaving_gb"), lit(26L)))
    eff
      .withColumn("verdict",
        when(col("threshold").isNotNull &&
          (col("threshold") < 0.0 || col("threshold") >= 100.0),
          lit("THRESHOLD_RANGE"))
          .when(col("move_gb").isNotNull && col("move_gb") <= 0,
            lit("MOVE_SIZE_NOT_POSITIVE"))
          .when(col("dn_pct").isNotNull &&
            (col("dn_pct") <= 0 || col("dn_pct") > 100),
            lit("DN_PERCENT_RANGE"))
          .when(col("iterations").isNotNull &&
            (col("iterations") < -1 || col("iterations") === 0),
            lit("ITERATIONS_INVALID"))
          .when(col("entering_gb").isNotNull && col("entering_gb") <= 0,
            lit("ENTERING_NOT_POSITIVE"))
          .when(col("leaving_gb").isNotNull && col("leaving_gb") <= 0,
            lit("LEAVING_NOT_POSITIVE"))
          .when(col("interval_min").isNotNull &&
            col("interval_min") <= 0, lit("INTERVAL_NOT_POSITIVE"))
          .when(col("move_to").isNotNull && col("move_to") <= 0,
            lit("MOVE_TIMEOUT_NOT_POSITIVE"))
          .when(col("repl_to").isNotNull && col("repl_to") <= 0,
            lit("REPL_TIMEOUT_NOT_POSITIVE"))
          .when(!col("leader"), lit("NOT_LEADER_READY"))
          .when(col("safemode"), lit("IN_SAFE_MODE"))
          .when(col("running"), lit("ALREADY_RUNNING"))
          .when(col("e_enter") <= containerGb,
            lit("ENTERING_LE_CONTAINER_SIZE"))
          .when(col("e_leave") <= containerGb,
            lit("LEAVING_LE_CONTAINER_SIZE"))
          .when(col("e_enter") > col("e_move"),
            lit("ENTERING_GT_MAX_MOVE"))
          .when(col("e_leave") > col("e_move"),
            lit("LEAVING_GT_MAX_MOVE"))
          .otherwise(lit("STARTED")))
      .select("req_id", "verdict")
      .orderBy("req_id")
  }

  /**
   * DN replication-supervisor admission + run fold —
   * `ReplicationSupervisor` (`container-service/.../replication/
   * ReplicationSupervisor.java`): a command burst processed in arrival
   * order under the worst case (nothing completes mid-burst):
   *   1. `queueHasRoomFor` runs FIRST (:270-286): once the in-flight
   *      set reaches maxQueueSize (100), every later command — even a
   *      duplicate of an admitted task — is QUEUE_FULL;
   *   2. the `inFlight` identity set dedups (class, container) (:100-105,
   *      :306-309): a re-issued command for a queued task is silently
   *      dropped ⇒ DEDUPED;
   *   3. TaskRunner.run (:535-580): an expired deadline ⇒ TIMEOUT
   *      (:541-547); a task term behind the current SCM leader term ⇒
   *      STALE_TERM (:549-557); otherwise the task outcome —
   *      DONE / FAILED / SKIPPED — feeds the per-metric counters.
   * Fixture: one command per %7 container (kind by %3: replicate /
   * EC-reconstruct / delete), every 5th re-issued right after its
   * original (DEDUPED while the queue has room, QUEUE_FULL once it
   * doesn't — the reference's check order), deadlines
   * expired on %11, stale terms on %13, outcomes cycling by an md5
   * nibble. The admission window is a single ordered pass over the
   * burst — the DN command queue is control-plane-sized by definition
   * (maxQueueSize bounds it).
   */
  def replicationSupervisorFold(containersScm: DataFrame,
                                maxQueueSize: Int = 100,
                                currentTerm: Long = 5L): DataFrame = {
    val c = col("container_id")
    val base = containersScm.filter(col("state") =!= "DELETED" &&
      c % 7 === 0)
      .withColumn("kind",
        when(c % 3 === 0, lit("REPLICATE"))
          .when(c % 3 === 1, lit("RECONSTRUCT"))
          .otherwise(lit("DELETE")))
      .withColumn("seq", c * 2)
    val dups = base.filter(c % 5 === 0)
      .withColumn("seq", c * 2 + 1)
    val events = base.unionByName(dups)
      .withColumn("deadline_passed", c % 11 === 0)
      .withColumn("task_term",
        when(c % 13 === 0, currentTerm - 1).otherwise(currentTerm))
      .withColumn("outcome",
        when(ascii(substring(md5(c.cast("string")), 1, 1)) % 5 === 0,
          lit("FAILED"))
          .when(ascii(substring(md5(c.cast("string")), 1, 1)) % 5 === 1,
            lit("SKIPPED"))
          .otherwise(lit("DONE")))
    val wSeq = Window.orderBy("seq")
    val wTask = Window.partitionBy("kind", "container_id")
      .orderBy("seq")
    events
      .withColumn("first_occ",
        when(row_number().over(wTask) === 1, 1).otherwise(0))
      .withColumn("cum_uniques",
        sum("first_occ").over(
          wSeq.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)))
      .withColumn("prior_uniques", col("cum_uniques") - col("first_occ"))
      .withColumn("verdict",
        when(col("prior_uniques") >= maxQueueSize, lit("QUEUE_FULL"))
          .when(col("first_occ") === 0, lit("DEDUPED"))
          .when(col("deadline_passed"), lit("TIMEOUT"))
          .when(col("task_term") < currentTerm, lit("STALE_TERM"))
          .otherwise(col("outcome")))
      .select("seq", "kind", "container_id", "verdict")
      .orderBy("seq")
  }

  /**
   * EC placement validation — `SCMCommonPlacementPolicy
   * .validateContainerPlacement` (:441-510) with the rack-scatter
   * required-rack override (`SCMContainerPlacementRackScatter
   * .getRequiredRackCount:541-550` = min(cluster racks, requiredNodes))
   * and `ContainerPlacementStatusDefault` (:55-94):
   *   - requiredRacks = min(5 racks, 5 shards) for rs-3-2;
   *   - maxReplicasPerRack = ⌈replicas / requiredRacks⌉ PLUS the
   *     over-replication allowance max(0, copies − replicas)
   *     (:498-506 — excess copies from decommission/maintenance must
   *     not read as mis-replication until over-replication is fixed;
   *     under this allowance a same-rack duplicate can never overload
   *     a full-rack-spread container, by construction);
   *   - satisfied ⟺ racks-spanned ≥ min(total, required) AND every
   *     rack count ≤ maxReplicasPerRack;
   *   - misReplicationCount = max(rack deficit, Σ per-rack excess);
   *     the reason reports the rack deficit FIRST (:63-74).
   */
  def ecPlacementValidate(ecShards: DataFrame,
                          clusterRacks: Int = 5,
                          requiredNodes: Int = 5): DataFrame = {
    val requiredRacks = math.min(clusterRacks, requiredNodes)
    val basePerRack = requiredNodes / requiredRacks +
      math.min(requiredNodes % requiredRacks, 1)
    val rackCnt = ecShards
      .withColumn("rack",
        substring(col("datanode"), 3, 10).cast("int") % 5)
      .groupBy("container_id", "rack")
      .agg(count(lit(1)).as("cnt"))
    rackCnt.groupBy("container_id")
      .agg(sum("cnt").as("n_copies"),
        count(lit(1)).as("n_racks"),
        max("cnt").as("max_rack_cnt"),
        collect_list("cnt").as("cnts"))
      .withColumn("max_per_rack",
        lit(basePerRack.toLong) +
          greatest(col("n_copies") - requiredNodes, lit(0L)))
      .withColumn("satisfied",
        col("n_racks") >= requiredRacks &&
          col("max_rack_cnt") <= col("max_per_rack"))
      .withColumn("mis_count",
        when(col("satisfied"), lit(0L)).otherwise(
          greatest(lit(requiredRacks.toLong) - col("n_racks"),
            aggregate(col("cnts"), lit(0L),
              (acc, c) => acc +
                greatest(c - col("max_per_rack"), lit(0L))))))
      .withColumn("reason",
        when(col("satisfied"), lit("SATISFIED"))
          .when(col("n_racks") < requiredRacks, lit("TOO_FEW_RACKS"))
          .otherwise(lit("RACK_OVERLOADED")))
      .select("container_id", "n_copies", "n_racks", "max_per_rack",
        "satisfied", "mis_count", "reason")
      .orderBy("container_id")
  }

  /**
   * DN volume-checker fold — `StorageVolumeChecker` + the throttled
   * async checker (`container-service/.../volume/StorageVolumeChecker
   * .java:80-201`): per-volume check ticks folded in time order:
   *   1. a volume that has already failed left the volume set — later
   *      ticks never check it (NOT_CHECKED_FAILED_VOLUME;
   *      MutableVolumeSet#handleVolumeFailures removes it);
   *   2. a tick inside minDiskCheckGap of the last COMPLETED check is
   *      throttled (:168-177, SKIPPED_MIN_GAP — the gap keys on
   *      completion, and the skip does not advance it);
   *   3. a check running past maxAllowedTimeForCheck times out
   *      (TIMED_OUT ⇒ volume failed);
   *   4. a FAILED result fails the volume; otherwise HEALTHY and the
   *      completion time (tick + duration) re-arms the gap.
   * The per-volume state is a packed string folded over the event
   * prefix — the exact shape the DuckDB oracle replays with
   * list_reduce (same-type accumulator), so the two folds cannot
   * diverge structurally. Fixture: 12 volumes × 6 ticks with jittered
   * gaps, durations crossing the timeout, and (v+k) % 11 failures.
   */
  def volumeCheckFold(spark: org.apache.spark.sql.SparkSession,
                      minGapMs: Long = 10000L,
                      maxAllowedMs: Long = 20000L): DataFrame = {
    import spark.implicits._
    val events = (0 until 12).flatMap { v =>
      (0 until 6).map { k =>
        val ts = k * 9000L + (v * 531) % 3000
        val dur = ((v * 7 + k * 13) % 9) * 3000L
        val res = if ((v + k) % 11 == 0) "FAILED" else "HEALTHY"
        (s"vol-$v", ts, dur, res)
      }
    }.toDF("volume", "ts", "dur", "res")
    val step =
      s"""CASE
         |  WHEN split(s, '\\\\|')[1] = '1' THEN s
         |  WHEN CAST(split(e, '\\\\|')[0] AS BIGINT) -
         |    CAST(split(s, '\\\\|')[0] AS BIGINT) < $minGapMs THEN s
         |  WHEN CAST(split(e, '\\\\|')[1] AS BIGINT) > $maxAllowedMs
         |    THEN concat(split(s, '\\\\|')[0], '|1')
         |  WHEN split(e, '\\\\|')[2] = 'FAILED'
         |    THEN concat(split(s, '\\\\|')[0], '|1')
         |  ELSE concat(CAST(CAST(split(e, '\\\\|')[0] AS BIGINT) +
         |    CAST(split(e, '\\\\|')[1] AS BIGINT) AS STRING), '|0')
         |  END""".stripMargin
    events
      .groupBy("volume")
      .agg(sort_array(collect_list(struct(col("ts"), col("dur"),
        col("res")))).as("evs"))
      .withColumn("sevs", expr(
        "transform(evs, x -> concat(x.ts, '|', x.dur, '|', x.res))"))
      .select(col("volume"), col("sevs").as("sevs_all"),
        posexplode(col("sevs")).as(Seq("i", "ev")))
      .withColumn("pre", expr(
        s"""aggregate(slice(sevs_all, 1, i), '-999999|0',
           |  (s, e) -> $step)""".stripMargin))
      .select("volume", "i", "ev", "pre")
      .withColumn("verdict", expr(
        s"""CASE
           |  WHEN split(pre, '\\\\|')[1] = '1'
           |    THEN 'NOT_CHECKED_FAILED_VOLUME'
           |  WHEN CAST(split(ev, '\\\\|')[0] AS BIGINT) -
           |    CAST(split(pre, '\\\\|')[0] AS BIGINT) < $minGapMs
           |    THEN 'SKIPPED_MIN_GAP'
           |  WHEN CAST(split(ev, '\\\\|')[1] AS BIGINT) > $maxAllowedMs
           |    THEN 'TIMED_OUT'
           |  WHEN split(ev, '\\\\|')[2] = 'FAILED' THEN 'FAILED'
           |  ELSE 'HEALTHY' END""".stripMargin))
      .withColumn("ts", expr("CAST(split(ev, '\\\\|')[0] AS BIGINT)"))
      .select(col("volume"), col("ts"), col("verdict"))
      .orderBy("volume", "ts")
  }

  /**
   * EC-plane health checks — the EC legs the Ratis chain type-guards
   * away, in chain order (`ReplicationManager.java:272,274-275`):
   *
   *   1. `ECReplicationCheckHandler` (:47-175): under-replication
   *      classified by `ECContainerReplicaCount` — recoverable ⇒
   *      UNDER_REPLICATED; unrecoverable (< data healthy indexes) splits
   *      on unreplicated offline indexes and `isMissing` (healthy +
   *      UNHEALTHY indexes < data) into MISSING /
   *      MISSING_UNDER_REPLICATED / UNHEALTHY /
   *      UNHEALTHY_UNDER_REPLICATED (:66-91); else any index with more
   *      than one in-service copy ⇒ OVER_REPLICATED;
   *   2. `ClosedWithUnhealthyReplicasHandler` (:71-116): CLOSED EC
   *      containers delete UNHEALTHY copies, but ONLY when every
   *      unhealthy index also has a CLOSED copy (an index without one is
   *      under-replicated and defers) ⇒ UNHEALTHY_OVER_REPLICATED with
   *      one delete per unhealthy copy;
   *   3. `ECMisReplicationCheckHandler` (:56-83): the rack-scatter
   *      placement validation of [[ecPlacementValidate]] ⇒
   *      MIS_REPLICATED;
   *   4. fall-through HEALTHY.
   *
   * Fixture: ecShards with two chain-only families — %47 EC containers
   * all-UNHEALTHY (unrecoverable but not missing), %53 EC containers
   * with an extra UNHEALTHY copy of index 2 (deletable), and %43 EC
   * containers collapsed onto one rack (dn = c + 5·idx — mis-replicated
   * with a full index set). remainingMaintenanceRedundancy = 1.
   */
  def ecHealthCheck(ecShards: DataFrame, datanodes: DataFrame,
                    containersScm: DataFrame,
                    dataShards: Int = 3, parity: Int = 2): DataFrame = {
    val c = col("container_id")
    val required = dataShards + parity
    val spark = datanodes.sparkSession
    val dn = datanodes.select(col("uuid").as("datanode"), col("op_state"))
    val shaped = ecShards
      .withColumn("datanode",
        when(c % 43 === 0, concat(lit("dn"),
          ((c + col("replica_index") * 5) % 20).cast("string")))
          .otherwise(col("datanode")))
      .withColumn("shard_state",
        when(c % 47 === 0, lit("UNHEALTHY"))
          .otherwise(col("shard_state")))
    val extraUnh = ecShards.filter(c % 53 === 0 &&
      col("replica_index") === 2)
      .withColumn("datanode",
        concat(lit("dn"), ((c + 11) % 20).cast("string")))
      .withColumn("shard_state", lit("UNHEALTHY"))
    val all = shaped.unionByName(extraUnh)
      .join(broadcast(dn), Seq("datanode"))
      .withColumn("unhealthy", col("shard_state") === "UNHEALTHY")
      .withColumn("decom", !col("unhealthy") &&
        col("op_state").isin("DECOMMISSIONING", "DECOMMISSIONED"))
      .withColumn("maint", !col("unhealthy") &&
        col("op_state").isin("IN_MAINTENANCE", "ENTERING_MAINTENANCE"))
      .withColumn("inservice", !col("unhealthy") &&
        col("op_state") === "IN_SERVICE")
    val perIdxRaw = all.groupBy("container_id", "replica_index")
      .agg(sum(when(col("inservice"), 1L).otherwise(0L)).as("h"),
        sum(when(col("decom"), 1L).otherwise(0L)).as("d"),
        sum(when(col("maint"), 1L).otherwise(0L)).as("m"),
        sum(when(col("unhealthy"), 1L).otherwise(0L)).as("u"),
        max(when(col("shard_state") === "CLOSED", 1).otherwise(0))
          .as("has_closed"))
    val spine = containersScm
      .filter(col("state") =!= "DELETED" && (c % 12) % 3 === 2)
      .select("container_id")
      .crossJoin(spark.range(1, required + 1).toDF("replica_index"))
    val folded = spine
      .join(perIdxRaw, Seq("container_id", "replica_index"), "left")
      .na.fill(0L, Seq("h", "d", "m", "u", "has_closed"))
      .groupBy("container_id")
      .agg(
        min(when(col("h") >= 1, 1).otherwise(0)).as("full_h"),
        min(when(col("h") + col("m") >= 1, 1).otherwise(0))
          .as("full_hm"),
        sum(when(col("h") >= 1, 1L).otherwise(0L)).as("n_h_idx"),
        sum(when(col("h") + col("d") + col("m") >= 1, 1L).otherwise(0L))
          .as("n_avail_idx"),
        sum(when(col("h") + col("d") + col("m") + col("u") >= 1, 1L)
          .otherwise(0L)).as("n_any_idx"),
        max(when(col("h") > 1, 1).otherwise(0)).as("any_over"),
        sum(when(col("d") > 0 && col("h") === 0, 1L).otherwise(0L))
          .as("n_decom_only"),
        sum(when(col("m") > 0 && col("h") === 0, 1L).otherwise(0L))
          .as("n_maint_only"),
        sum(col("u")).as("n_unh_copies"),
        max(when(col("u") > 0 && col("has_closed") === 0, 1)
          .otherwise(0)).as("unh_without_closed"))
      .withColumn("suff",
        col("full_h") === 1 ||
          (col("full_hm") === 1 && col("n_h_idx") >= dataShards + 1))
      .withColumn("unrecoverable", col("n_avail_idx") < dataShards)
      .withColumn("is_missing", col("n_any_idx") < dataShards)
      .withColumn("has_offline",
        col("n_decom_only") + col("n_maint_only") > 0)
    val placement = ecPlacementValidate(
      shaped.unionByName(extraUnh), 5, required)
      .select(col("container_id"), col("satisfied"))
    folded
      .join(broadcast(placement), Seq("container_id"), "left")
      .na.fill(true, Seq("satisfied"))
      .withColumn("handled_by",
        when(!col("suff"), lit("EC_CHECK"))
          .when(col("any_over") === 1, lit("EC_CHECK"))
          .when(col("n_unh_copies") > 0 &&
            col("unh_without_closed") === 0, lit("CLOSED_UNHEALTHY"))
          .when(!col("satisfied"), lit("EC_MIS_CHECK"))
          .otherwise(lit("NONE")))
      .withColumn("detail",
        when(col("handled_by") === "EC_CHECK" && !col("suff"),
          when(!col("unrecoverable"), lit("UNDER_REPLICATED"))
            .when(col("has_offline") && col("is_missing"),
              lit("MISSING_UNDER_REPLICATED"))
            .when(col("has_offline"),
              lit("UNHEALTHY_UNDER_REPLICATED"))
            .when(col("is_missing"), lit("MISSING"))
            .otherwise(lit("UNHEALTHY")))
          .when(col("handled_by") === "EC_CHECK",
            lit("OVER_REPLICATED"))
          .when(col("handled_by") === "CLOSED_UNHEALTHY",
            lit("UNHEALTHY_OVER_REPLICATED"))
          .when(col("handled_by") === "EC_MIS_CHECK",
            lit("MIS_REPLICATED"))
          .otherwise(lit("HEALTHY")))
      .withColumn("n_delete_cmds",
        when(col("handled_by") === "CLOSED_UNHEALTHY",
          col("n_unh_copies")).otherwise(lit(0L)))
      .select("container_id", "handled_by", "detail", "n_delete_cmds")
      .orderBy("container_id")
  }

  /**
   * DN container-import admission — `ContainerImporter`
   * (`container-service/.../replication/ContainerImporter.java:85-130,
   * 149-206`): per tarball, in reference order — a concurrent import of
   * the same container refuses CONTAINER_EXISTS (:93-99, the
   * importContainerProgress set), an already-present container refuses
   * CONTAINER_EXISTS (:102-107), the descriptor checksum must verify
   * (:117), and a volume must hold 2× the container size (tmp + dest,
   * `requiredReplicationSpace` :177-189) — none ⇒ NO_VOLUME_SPACE,
   * else the import lands on the most-spacious eligible volume (the
   * deterministic stand-in for the capacity-weighted random choice).
   * Fixture: %59 containers with admission classes by %10 over 6
   * volumes of (v+1)·2 GB available; 5 GB container size except the
   * 20 GB oversize class. One-shot admission-time view (no depletion).
   */
  def containerImportCheck(containersScm: DataFrame): DataFrame = {
    val spark = containersScm.sparkSession
    import spark.implicits._
    val gb = 1000000000L
    val volumes = (0 until 6).map(v => (s"vol-$v", (v + 1) * 2 * gb))
      .toDF("volume", "available")
    val reqs = containersScm
      .filter(col("state") =!= "DELETED" && col("container_id") % 59 === 0)
      .withColumn("cls", col("container_id") % 10)
      .withColumn("size_bytes",
        when(col("cls") === 4, 20L * gb).otherwise(5L * gb))
      .withColumn("required", col("size_bytes") * 2)
    val best = volumes.orderBy(col("available").desc, col("volume"))
      .limit(1).select(col("volume").as("best_volume"),
        col("available").as("best_avail"))
    reqs.crossJoin(broadcast(best))
      .withColumn("verdict",
        when(col("cls") === 2, lit("IMPORT_IN_PROGRESS"))
          .when(col("cls") === 1, lit("CONTAINER_EXISTS"))
          .when(col("cls") === 3, lit("CHECKSUM_MISMATCH"))
          .when(col("best_avail") < col("required"),
            lit("NO_VOLUME_SPACE"))
          .otherwise(lit("IMPORTED")))
      .withColumn("target_volume",
        when(col("verdict") === "IMPORTED", col("best_volume"))
          .otherwise(lit("")))
      .select("container_id", "verdict", "target_volume")
      .orderBy("container_id")
  }

  /**
   * Recon task-status endpoint — the `/taskstatus` table
   * (`recon-codegen/.../ReconTaskSchemaDefinition.java:59-68`:
   * task_name, last_updated_timestamp, last_updated_seq_number,
   * last_task_run_status, is_current_task_running) over this engine's
   * registered incremental views. The watermark is the REAL change-log
   * head (the seq-dense event log over the namespace); per-task
   * checkpoints trail it by a deterministic task lag (this engine
   * checkpoints per micro-batch, so a task's lag is its batch
   * in-flight window), timestamps derive from the seq watermark.
   */
  def reconTaskStatus(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val tasks = Seq(
      ("FileSizeCountTask", 0), ("OmTableInsightTask", 1),
      ("NSSummaryTask", 2), ("ContainerKeyMapperTask", 3),
      ("ContainerHealthTask", 4), ("PipelineSyncTask", 5),
      ("OmDeltaRequest", 6)).toDF("task_name", "task_idx")
    val head = events.agg(max("seq").as("head_seq"))
    tasks.crossJoin(broadcast(head))
      .withColumn("last_updated_seq_number",
        greatest(col("head_seq") - col("task_idx") * 3, lit(0L)))
      .withColumn("last_updated_timestamp",
        lit(1700000000000L) + col("last_updated_seq_number") * 10L)
      .withColumn("last_task_run_status",
        when(col("task_idx") === 4, lit(-1)).otherwise(lit(0)))
      .withColumn("is_current_task_running",
        when(col("task_idx") % 3 === 0, lit(1)).otherwise(lit(0)))
      .select("task_name", "last_updated_timestamp",
        "last_updated_seq_number", "last_task_run_status",
        "is_current_task_running")
      .orderBy("task_name")
  }

  /**
   * Recon datanode-remove ladder — NodeEndpoint.removeDatanodes
   * (recon/.../api/NodeEndpoint.java:201-262) + preChecksSuccess
   * (:264-290): per requested uuid, IN REQUEST ORDER —
   *
   *  - an unknown uuid → NOT_FOUND (the response row carries hostname ""
   *    and a DEAD placeholder, :228-234);
   *  - a known node whose health is anything but DEAD refuses with
   *    "DataNode should be in DEAD node status." (NodeStatus.isDead ⇔
   *    health == DEAD, server-scm/.../NodeStatus.java:235-237);
   *  - a DEAD node with ANY container in LifeCycleState OPEN on the
   *    Recon container manager refuses "Open Containers/Pipelines"
   *    (:306-320 checkContainers; container ids the manager does not
   *    track are SKIPPED);
   *  - then the same error over its pipelines (Pipeline.isOpen ⇔ state
   *    OPEN, common/.../Pipeline.java:319-321; unmanaged pipeline ids
   *    skipped, :292-305);
   *  - else REMOVED — nodeManager.removeNode runs mid-walk (:223), so a
   *    LATER occurrence of the same uuid in the request list reads
   *    NOT_FOUND, while re-requesting a FAILED node just fails again.
   *
   * open_containers / open_pipelines are diagnostic counts of the
   * pinning refs (the reference logs them per ref); the verdict only
   * needs existence. Scale shape: the request list and both manager
   * catalogs are control-plane dims — everything broadcasts, two tiny
   * hash aggs, one projection.
   */
  def datanodeRemove(requests: DataFrame, nodes: DataFrame,
                     containerRefs: DataFrame, containerStates: DataFrame,
                     pipelineRefs: DataFrame,
                     pipelineStates: DataFrame): DataFrame = {
    val openC = containerRefs
      .join(broadcast(containerStates), Seq("container_id"))
      .filter(col("cstate") === "OPEN")
      .groupBy("uuid").agg(count(lit(1)).as("open_containers"))
    val openP = pipelineRefs
      .join(broadcast(pipelineStates), Seq("pipeline_id"))
      .filter(col("pstate") === "OPEN")
      .groupBy("uuid").agg(count(lit(1)).as("open_pipelines"))
    val occ = Window.partitionBy("uuid").orderBy("req_seq")
    requests
      .join(broadcast(nodes), Seq("uuid"), "left")
      .join(broadcast(openC), Seq("uuid"), "left")
      .join(broadcast(openP), Seq("uuid"), "left")
      .withColumn("open_containers",
        coalesce(col("open_containers"), lit(0L)))
      .withColumn("open_pipelines",
        coalesce(col("open_pipelines"), lit(0L)))
      .withColumn("base_verdict",
        when(col("health").isNull, lit("NOT_FOUND"))
          .when(col("health") =!= "DEAD", lit("FAILED"))
          .when(col("open_containers") > 0 || col("open_pipelines") > 0,
            lit("FAILED"))
          .otherwise(lit("REMOVED")))
      .withColumn("verdict",
        when(row_number().over(occ) > 1 &&
          col("base_verdict") === "REMOVED", lit("NOT_FOUND"))
          .otherwise(col("base_verdict")))
      .withColumn("error",
        when(col("verdict") =!= "FAILED", lit(""))
          .when(col("health") =!= "DEAD",
            lit("DataNode should be in DEAD node status."))
          .otherwise(lit("Open Containers/Pipelines")))
      .select("req_seq", "uuid", "verdict", "error", "open_containers",
        "open_pipelines")
      .orderBy("req_seq")
  }

  /**
   * DN block-deleting selection — BlockDeletingService.getTasks
   * (container-service/.../background/BlockDeletingService.java:
   * 171-306) + TopNOrderedContainerDeletionChoosingPolicy +
   * ContainerDeletionChoosingPolicyTemplate:62-86. Per container,
   * the eligibility ladder in reference order:
   *
   *  - pending deletion blocks must be > 0 (:240-242);
   *  - container type must be valid for the policy (KeyValue only);
   *  - only CLOSED / QUASI_CLOSED containers delete (:250-253);
   *  - Ratis fences (:256-305): an EMPTY origin pipeline id allows
   *    (the EC path), an unparseable id refuses, a GONE Ratis group
   *    allows, and a live group refuses while minReplicatedIndex <
   *    the container's BCSID (the close entry not yet replicated to
   *    every peer — deleting blocks now could break replay);
   *
   * then the TopN fill: eligible containers ordered by pending blocks
   * DESC (ties determinized by container id — the reference iterates a
   * HashMap, so its tie order is incidental), each taking
   * min(remaining, pending) off the per-interval block budget; the
   * boundary container gets a PARTIAL count, later ones wait for the
   * next interval. Scale shape: one projection + one control-plane
   * sort — the per-DN container map is bounded (10^3-10^4).
   */
  def dnBlockDeleteChoose(containers: DataFrame,
                          blockLimit: Long = 180L): DataFrame = {
    val skip =
      when(col("pending_blocks") <= 0, lit("SKIP_NO_PENDING"))
        .when(col("ctype") =!= "KeyValueContainer", lit("SKIP_TYPE"))
        .when(!col("cstate").isin("CLOSED", "QUASI_CLOSED"),
          lit("SKIP_STATE"))
        .when(col("origin_pipeline") =!= "" &&
          !col("pipeline_parseable"), lit("SKIP_BAD_PIPELINE"))
        .when(col("origin_pipeline") =!= "" &&
          col("ratis_group_exists") &&
          col("min_replicated_index") < col("bcsid"),
          lit("SKIP_LOG_NOT_REPLICATED"))
    val wTop = Window.partitionBy(lit(0))
      .orderBy(col("pending_blocks").desc, col("container_id"))
    val wPrev = wTop.rowsBetween(Window.unboundedPreceding, -1)
    val eligible = containers
      .withColumn("skip_reason", skip)
      .filter(col("skip_reason").isNull)
      .withColumn("pick_rank", row_number().over(wTop))
      .withColumn("taken_before",
        coalesce(sum("pending_blocks").over(wPrev), lit(0L)))
      .withColumn("blocks_to_delete",
        greatest(least(col("pending_blocks"),
          lit(blockLimit) - col("taken_before")), lit(0L)))
      .withColumn("verdict",
        when(col("blocks_to_delete") === 0, lit("NOT_CHOSEN"))
          .when(col("blocks_to_delete") < col("pending_blocks"),
            lit("CHOSEN_PARTIAL"))
          .otherwise(lit("CHOSEN")))
    containers
      .join(eligible.select("container_id", "verdict",
        "blocks_to_delete", "pick_rank"), Seq("container_id"), "left")
      .withColumn("verdict",
        coalesce(col("verdict"), skip))
      .withColumn("blocks_to_delete",
        coalesce(col("blocks_to_delete"), lit(0L)))
      .withColumn("pick_rank",
        when(col("verdict").startsWith("CHOSEN"), col("pick_rank"))
          .otherwise(lit(0)).cast("long"))
      .select("container_id", "verdict", "blocks_to_delete", "pick_rank")
      .orderBy("container_id")
  }

  /**
   * SCM deleted-block DISPATCH fold — SCMBlockDeletingService's
   * DeletedBlockTransactionScanner (server-scm/.../SCMBlockDeletingService
   * .java:179-243) + DeletedBlockLogImpl.getTransactions (:339-459)
   * with getTransaction (:270-296) and checkInadequateReplica
   * (:298-328): the txn log walked in CIRCULAR order from
   * lastProcessedTransactionId (strictly after it, wrapping, the
   * cursor row itself examined LAST), under the per-interval global
   * block budget (checked at loop top — once spent, later positions
   * are NOT_REACHED) and the per-datanode cap maxDeleteBlocksPerDn =
   * min(limit, limit DIV (includedDns DIV deletionFactorPerDatanode)):
   *
   *  - DELETED or missing containers complete + drop the txn (no
   *    budget charge);
   *  - OPEN containers skip;
   *  - ANY replica on a non-included datanode, or a non-HEALTHY
   *    replication-health verdict, skips (HDDS "all replicas get the
   *    command together" rule);
   *  - the txn dispatches only if EVERY replica datanode is still
   *    under the per-DN cap; then each NON-duplicate datanode gets the
   *    txn — the global counter grows by blocks × datanodes (replica
   *    copies count separately, DatanodeDeletedBlockTransactions:39-41);
   *  - all replica DNs already holding the txn (duplication) → nothing
   *    sent, no charge.
   *
   * The packed fold state is the per-datanode dispatched-block map
   * (the global counter is its sum). Scale shape: one control-plane
   * fold per SCM; the stateless rungs precompute per txn with
   * broadcast dims.
   */
  def scmBlockDispatch(txns: DataFrame, containers: DataFrame,
                       replicas: DataFrame, included: DataFrame,
                       dups: DataFrame, blockLimit: Long = 100L,
                       deletionFactorPerDatanode: Long = 2L,
                       lastProcessed: Long = 2L): DataFrame = {
    val nDns = included.count()
    val factor = nDns / deletionFactorPerDatanode
    val maxPerDn =
      if (factor > 0) math.min(blockLimit, blockLimit / factor)
      else blockLimit
    def ents(s: String) =
      s"filter(split($s, '\\\\|'), x -> x != '')"
    def cntOf(s: String, d: String) =
      s"""aggregate(${ents(s)}, CAST(0 AS BIGINT), (a, x) ->
         |  IF(split(x, ':')[0] = $d,
         |    CAST(split(x, ':')[1] AS BIGINT), a))""".stripMargin
    def globOf(s: String) =
      s"""aggregate(${ents(s)}, CAST(0 AS BIGINT), (a, x) ->
         |  a + CAST(split(x, ':')[1] AS BIGINT))""".stripMargin
    def allArr(e: String) =
      s"filter(split(split($e, ';')[3], ','), x -> x != '')"
    def ndArr(e: String) =
      s"filter(split(split($e, ';')[4], ','), x -> x != '')"
    def blocksOf(e: String) = s"CAST(split($e, ';')[1] AS BIGINT)"
    def capBad(s: String, e: String) =
      s"size(filter(${allArr(e)}, d -> (${cntOf(s, "d")}) >= $maxPerDn))"
    def bump(s: String, e: String) =
      s"""aggregate(${ndArr(e)}, $s, (s2, d) ->
         |  IF(size(filter(${ents("s2")},
         |      x -> split(x, ':')[0] = d)) > 0,
         |    array_join(transform(${ents("s2")}, x ->
         |      IF(split(x, ':')[0] = d,
         |        concat(d, ':', CAST(CAST(split(x, ':')[1] AS BIGINT) +
         |          ${blocksOf(e)} AS STRING)), x)), '|'),
         |    IF(s2 = '', concat(d, ':',
         |        CAST(${blocksOf(e)} AS STRING)),
         |      concat(s2, '|', d, ':',
         |        CAST(${blocksOf(e)} AS STRING)))))""".stripMargin
    def step(s: String, e: String) =
      s"""CASE
         |WHEN (${globOf(s)}) >= $blockLimit THEN $s
         |WHEN split($e, ';')[2] != 'OK' THEN $s
         |WHEN (${capBad(s, e)}) > 0 THEN $s
         |WHEN size(${ndArr(e)}) = 0 THEN $s
         |ELSE ${bump(s, e)} END""".stripMargin
    val verdict =
      s"""CASE
         |WHEN (${globOf("pre")}) >= $blockLimit THEN 'NOT_REACHED'
         |WHEN split(ev, ';')[2] = 'CLEANUP' THEN 'CLEANUP_COMPLETED'
         |WHEN split(ev, ';')[2] = 'OPEN' THEN 'SKIP_OPEN'
         |WHEN split(ev, ';')[2] = 'INADEQ'
         |  THEN 'SKIP_INADEQUATE_REPLICA'
         |WHEN (${capBad("pre", "ev")}) > 0 THEN 'SKIP_DN_CAP'
         |WHEN size(${ndArr("ev")}) = 0 THEN 'SKIP_ALL_DUPLICATE'
         |ELSE 'DISPATCHED' END""".stripMargin
    val repAgg = replicas
      .join(broadcast(included.withColumn("inc", lit(true))),
        Seq("dn"), "left")
      .groupBy("container_id")
      .agg(array_join(sort_array(collect_list(col("dn"))), ",")
        .as("all_csv"),
        max(when(col("inc").isNull, 1).otherwise(0))
          .as("any_not_included"))
    val ndCsv = txns.select("txn_id", "container_id")
      .join(replicas, Seq("container_id"))
      .join(broadcast(dups.withColumn("dup", lit(true))),
        Seq("dn", "txn_id"), "left")
      .filter(col("dup").isNull)
      .groupBy("txn_id")
      .agg(array_join(sort_array(collect_list(col("dn"))), ",")
        .as("nd_csv"))
    txns
      .join(broadcast(containers), Seq("container_id"), "left")
      .join(broadcast(repAgg), Seq("container_id"), "left")
      .join(broadcast(ndCsv), Seq("txn_id"), "left")
      .withColumn("v0",
        when(col("cstate").isNull || col("cstate") === "DELETED",
          lit("CLEANUP"))
          .when(col("cstate") === "OPEN", lit("OPEN"))
          .when(coalesce(col("any_not_included"), lit(0)) === 1 ||
            !col("health_ok"), lit("INADEQ"))
          .otherwise(lit("OK")))
      .withColumn("ev", concat_ws(";", col("txn_id"), col("blocks"),
        col("v0"), coalesce(col("all_csv"), lit("")),
        coalesce(col("nd_csv"), lit(""))))
      .withColumn("rot",
        when(col("txn_id") <= lastProcessed, 1).otherwise(0))
      .groupBy(lit(0).as("g"))
      .agg(sort_array(collect_list(struct(col("rot"), col("txn_id"),
        col("ev")))).as("evs"))
      .withColumn("sevs", expr("transform(evs, x -> x.ev)"))
      .select(col("sevs").as("sevs_all"),
        posexplode(col("sevs")).as(Seq("i", "ev")))
      .withColumn("pre", expr(
        s"aggregate(slice(sevs_all, 1, i), '', (s, e) -> ${step("s", "e")})"))
      .withColumn("verdict", expr(verdict))
      .withColumn("txn_id", expr("CAST(split(ev, ';')[0] AS BIGINT)"))
      .withColumn("walk_pos", (col("i") + 1).cast("long"))
      .withColumn("dns_sent", expr(
        s"""CAST(IF(verdict = 'DISPATCHED',
           |  size(${ndArr("ev")}), 0) AS BIGINT)""".stripMargin))
      .withColumn("blocks_added", expr(
        s"""CAST(IF(verdict = 'DISPATCHED',
           |  size(${ndArr("ev")}) * ${blocksOf("ev")}, 0)
           |  AS BIGINT)""".stripMargin))
      .withColumn("global_before",
        expr(s"CAST(${globOf("pre")} AS BIGINT)"))
      .select("txn_id", "walk_pos", "verdict", "dns_sent",
        "blocks_added", "global_before")
      .orderBy("txn_id")
  }

  /** Packed-state step for [[volumeChooseFold]]: state =
    * "nextIdx#vol:avail:committed|..." folded over op strings
    * ADD:vol:avail / REMOVE:vol / ALLOC:size. Parametrized over the
    * state/event variable names so the same SQL drives both the
    * aggregate() prefix fold and the post-state projection. */
  private def rrStep(s: String, e: String): String = {
    val ent = s"filter(split(split($s, '#')[1], '\\\\|'), x -> x != '')"
    val n = s"size($ent)"
    val nextIdx = s"CAST(split($s, '#')[0] AS INT)"
    val start = s"IF($nextIdx < $n, $nextIdx, 0)"
    val sz = s"CAST(split($e, ':')[1] AS BIGINT)"
    val minrot = s"""array_min(transform($ent, (x, i) ->
      IF(CAST(split(x, ':')[1] AS BIGINT) -
         CAST(split(x, ':')[2] AS BIGINT) >= $sz,
        (i - $start + $n) % $n, CAST(NULL AS INT))))"""
    val istar = s"(($minrot) + $start) % $n"
    s"""CASE split($e, ':')[0]
       |WHEN 'ADD' THEN concat(split($s, '#')[0], '#',
       |  array_join(concat($ent, array(concat(split($e, ':')[1], ':',
       |    split($e, ':')[2], ':0'))), '|'))
       |WHEN 'REMOVE' THEN concat(split($s, '#')[0], '#',
       |  array_join(filter($ent,
       |    x -> split(x, ':')[0] != split($e, ':')[1]), '|'))
       |ELSE CASE
       |  WHEN $n = 0 THEN $s
       |  WHEN $minrot IS NULL THEN $s
       |  ELSE concat(CAST((($istar) + 1) % $n AS STRING), '#',
       |    array_join(transform($ent, (x, i) -> IF(i = $istar,
       |      concat(split(x, ':')[0], ':', split(x, ':')[1], ':',
       |        CAST(CAST(split(x, ':')[2] AS BIGINT) + $sz AS STRING)),
       |      x)), '|'))
       |  END
       |END""".stripMargin
  }

  /**
   * DN round-robin volume choice — RoundRobinVolumeChoosingPolicy
   * .chooseVolume (container-service/.../volume/
   * RoundRobinVolumeChoosingPolicy.java:55-95): the datanode's volume
   * list scanned CIRCULARLY from the persistent nextVolumeIndex,
   * taking the first volume whose free space covers the container
   * size (AvailableSpaceFilter); the cursor advances to chosen+1 mod n
   * and the chosen volume's committedBytes grows by the container
   * size (so back-to-back allocations see shrinking space). Nuances
   * carried over exactly:
   *
   *  - the cursor only moves ON SUCCESS — a full circle throws
   *    DiskOutOfSpaceException with the state untouched (:88-90);
   *  - failed volumes leave the list; an out-of-bounds cursor (the
   *    list shrank) restarts the scan at 0 (:68 `nextVolumeIndex <
   *    volumes.size() ? nextVolumeIndex : 0`);
   *  - an empty list refuses NO_VOLUMES (:60-62).
   *
   * Volume registration/failure ride the op stream as ADD/REMOVE; the
   * fold is the same packed-string higher-order-aggregate shape as
   * [[volumeCheckFold]] (ordered control-plane stream, one group per
   * datanode — trivially parallel across datanodes at fleet scale).
   */
  def volumeChooseFold(ops: DataFrame): DataFrame = {
    val step = rrStep("s", "e")
    val pre = rrStep("pre", "ev")
    val entPre = "filter(split(split(pre, '#')[1], '\\\\|'), x -> x != '')"
    val nPre = s"size($entPre)"
    val startPre = s"IF(CAST(split(pre, '#')[0] AS INT) < $nPre, " +
      s"CAST(split(pre, '#')[0] AS INT), 0)"
    val szPre = "CAST(split(ev, ':')[1] AS BIGINT)"
    val minrotPre = s"""array_min(transform($entPre, (x, i) ->
      IF(CAST(split(x, ':')[1] AS BIGINT) -
         CAST(split(x, ':')[2] AS BIGINT) >= $szPre,
        (i - $startPre + $nPre) % $nPre, CAST(NULL AS INT))))"""
    val istarPre = s"(($minrotPre) + $startPre) % $nPre"
    ops
      .groupBy(lit(0).as("g"))
      .agg(sort_array(collect_list(struct(col("seq"), col("op"))))
        .as("evs"))
      .withColumn("sevs", expr("transform(evs, x -> x.op)"))
      .select(col("sevs").as("sevs_all"),
        posexplode(col("sevs")).as(Seq("i", "ev")))
      .withColumn("pre", expr(
        s"aggregate(slice(sevs_all, 1, i), '0#', (s, e) -> $step)"))
      .withColumn("post", expr(pre))
      .withColumn("seq", col("i") + 1)
      .withColumn("action", expr(
        s"""CASE split(ev, ':')[0]
           |WHEN 'ADD' THEN 'ADDED'
           |WHEN 'REMOVE' THEN 'REMOVED'
           |ELSE CASE WHEN $nPre = 0 THEN 'NO_VOLUMES'
           |  WHEN $minrotPre IS NULL THEN 'OUT_OF_SPACE'
           |  ELSE 'CHOSEN' END
           |END""".stripMargin))
      .withColumn("vol", expr(
        s"""CASE WHEN split(ev, ':')[0] IN ('ADD', 'REMOVE')
           |  THEN split(ev, ':')[1]
           |WHEN action = 'CHOSEN'
           |  THEN split(element_at($entPre, ($istarPre) + 1), ':')[0]
           |ELSE '' END""".stripMargin))
      .withColumn("committed_after", expr(
        s"""CASE WHEN action = 'CHOSEN'
           |  THEN CAST(split(element_at($entPre, ($istarPre) + 1),
           |    ':')[2] AS BIGINT) + $szPre
           |ELSE CAST(0 AS BIGINT) END""".stripMargin))
      .withColumn("next_after",
        expr("CAST(split(post, '#')[0] AS BIGINT)"))
      .select("seq", "ev", "action", "vol", "committed_after",
        "next_after")
      .orderBy("seq")
  }

  /**
   * SCM block-allocation walk — BlockManagerImpl.allocateBlock →
   * WritableRatisContainerProvider.getContainer (server-scm/.../pipeline/
   * WritableRatisContainerProvider.java:60-197):
   *
   *  - candidate pipelines = OPEN, matching the requested replication,
   *    minus excluded pipeline ids and pipelines carrying an excluded
   *    datanode; if the exclusions wipe the set out, the reference
   *    RETRIES WITHOUT them (findPipelinesByState:165-178 — an
   *    exhausted exclude list is advisory, not binding);
   *  - pipelines are tried healthy-first (HealthyPipelineChoosePolicy:
   *    the random sub-pick is determinized here to pipeline-id order,
   *    the repo's usual stand-in), each miss REMOVING the pipeline
   *    (selectContainer:176-196);
   *  - per pipeline (ContainerManagerImpl.getMatchingContainer:358-384):
   *    the owner's containers are counted BEFORE exclusions; if below
   *    openContainerLimit — min over members of
   *    1 + (numContainerPerVolume·healthyVolumes − 1) DIV pipelineLimit,
   *    0 if any member's pipelineLimit ≤ 0 (SCMNodeManager.java:
   *    1661-1676) — and every member has space, a fresh container is
   *    minted FIRST and joins the eligible set;
   *  - selection follows the lastUsedMap cursor
   *    (ContainerStateManagerImpl.getMatchingContainer:493-532):
   *    first container ABOVE the cursor with usedBytes + size ≤
   *    containerSize; an empty tail set falls back to the whole set;
   *    a tail set with no space-hit falls back to the head set
   *    (cursor inclusive); cursor default = smallest eligible id;
   *  - a miss still mints (:375-377) gated ONLY on member space — so
   *    even a limit-0 pipeline mints on a miss, a truthful artifact;
   *  - no pipeline yields → CREATE_PIPELINE (the create-and-wait path,
   *    whose placement is [[pipelineCreatePlan]]).
   *
   * Each request is decided against the same catalog snapshot (batch
   * semantics); mint ids are 9000+req (stand-in for the monotone
   * sequenceIdGen — above every live id, so tail-set behavior matches).
   * Scale shape: pipelines/members/cursors are control-plane dims and
   * broadcast; the container catalog aggregates per (pipeline, owner)
   * before any join.
   */
  def scmBlockAllocate(requests: DataFrame, pipelines: DataFrame,
                       members: DataFrame, dns: DataFrame,
                       containers: DataFrame, cursors: DataFrame,
                       containerSize: Long = 1000L,
                       numPerVolume: Long = 2L): DataFrame = {
    val pipeStats = members
      .join(broadcast(dns), Seq("dn"))
      .groupBy("pipeline_id")
      .agg(
        min(when(col("pipeline_limit") <= 0, lit(0L))
          .otherwise(lit(1L) + expr(
            s"($numPerVolume * healthy_volumes - 1) DIV pipeline_limit")))
          .as("open_limit"),
        min(when(col("has_space"), 1L).otherwise(0L)).as("mint_ok"))
    val exclDnPipes = requests.select("req_id", "excl_dn")
      .filter(col("excl_dn") =!= "")
      .join(broadcast(members), col("excl_dn") === col("dn"))
      .select("req_id", "pipeline_id").distinct()
      .withColumn("dn_hit", lit(true))
    val wReq = Window.partitionBy("req_id")
    val cand = requests
      .join(broadcast(pipelines.filter(col("pstate") === "OPEN")
        .select("pipeline_id", "rep_config", "healthy")), Seq("rep_config"))
      .join(broadcast(exclDnPipes), Seq("req_id", "pipeline_id"), "left")
      .withColumn("excluded",
        coalesce(col("dn_hit"), lit(false)) ||
          (col("excl_pipeline") =!= "" &&
            col("pipeline_id") === col("excl_pipeline")))
      .withColumn("n_kept",
        sum(when(!col("excluded"), 1L).otherwise(0L)).over(wReq))
      .filter(!col("excluded") || col("n_kept") === 0)
      .withColumn("ignored_exclusions", col("n_kept") === 0)
      .withColumn("rnk", row_number().over(Window.partitionBy("req_id")
        .orderBy(col("healthy").desc, col("pipeline_id"))))
    // r16 restructure (guide §2.4 "remove shuffles outright" / §3
    // "consolidate broadcast ladders"): the former elig/cur/hits/outcome
    // frame chain re-joined the tiny container catalog and re-aggregated
    // per (req, pipeline) four times — ~75 Exchange / ~49 broadcast-build
    // operators of pure PLAN complexity over control-plane dims. The
    // catalog now folds ONCE to a per-(pipeline, owner) array column and
    // the whole NavigableSet tail/head cursor walk runs as array
    // expressions inside a single projection — rung for rung the same
    // decisions (exclusion filter on STORED containers only, mint row
    // never excluded, space gate, tail-first/whole-set/head fallbacks),
    // pinned by the PropertySpec literal-walk dual and the oracle.
    val ownedEls = containers.groupBy("pipeline_id", "owner")
      .agg(count(lit(1)).as("owned_count"),
        collect_list(struct(col("container_id"), col("used"))).as("els"))
    val cs = cand
      .join(broadcast(pipeStats), Seq("pipeline_id"), "left")
      .join(broadcast(ownedEls), Seq("pipeline_id", "owner"), "left")
      .join(broadcast(cursors), Seq("owner", "pipeline_id"), "left")
      .withColumn("owned_count", coalesce(col("owned_count"), lit(0L)))
      .withColumn("open_limit", coalesce(col("open_limit"), lit(0L)))
      .withColumn("mint_ok", coalesce(col("mint_ok"), lit(0L)))
      .withColumn("pre_mint",
        col("owned_count") < col("open_limit") && col("mint_ok") === 1)
      .withColumn("mint_id", lit(9000L) + col("req_id"))
    val walked = cs
      // eligible set = stored containers minus the excluded id (the
      // pre-mint is NOT subject to the exclusion, as before), plus the
      // limit+space-gated fresh mint (ids above every live id)
      .withColumn("elig", expr(
        """concat(
          |  filter(coalesce(els, array()),
          |    e -> e.container_id != excl_container),
          |  CASE WHEN pre_mint THEN
          |    array(named_struct('container_id', mint_id,
          |                       'used', CAST(0 AS BIGINT)))
          |  ELSE array() END)""".stripMargin))
      .withColumn("min_el",
        expr("array_min(transform(elig, e -> e.container_id))"))
      .withColumn("cursor", coalesce(col("last_used"), col("min_el")))
      .withColumn("tail_any",
        expr("exists(elig, e -> e.container_id > cursor)"))
      .withColumn("hit_tail", expr(
        s"""array_min(transform(filter(elig,
           |  e -> e.container_id > cursor AND
           |    e.used + size <= $containerSize),
           |  e -> e.container_id))""".stripMargin))
      .withColumn("hit_full", expr(
        s"""array_min(transform(filter(elig,
           |  e -> e.used + size <= $containerSize),
           |  e -> e.container_id))""".stripMargin))
      .withColumn("hit_head", expr(
        s"""array_min(transform(filter(elig,
           |  e -> e.container_id <= cursor AND
           |    e.used + size <= $containerSize),
           |  e -> e.container_id))""".stripMargin))
      .withColumn("hit",
        when(col("min_el").isNull, lit(null).cast("long"))
          .when(!col("tail_any"), col("hit_full"))
          .when(col("hit_tail").isNotNull, col("hit_tail"))
          .otherwise(col("hit_head")))
      .withColumn("picked", coalesce(col("hit"),
        when(col("mint_ok") === 1, col("mint_id"))))
      .filter(col("picked").isNotNull)
      .withColumn("minted", col("picked") === col("mint_id"))
    // first surviving pipeline in healthy-first order: rnk is a
    // row_number (unique per req), so min_by is the old
    // row_number-over-rnk = 1 winner without a second window pass
    val winner = walked
      .groupBy("req_id")
      .agg(min_by(struct(col("pipeline_id"), col("picked"), col("minted"),
        col("ignored_exclusions")), col("rnk")).as("w"))
      .select(col("req_id"), col("w.pipeline_id").as("win_pipeline"),
        col("w.picked").as("picked"), col("w.minted").as("minted"),
        col("w.ignored_exclusions").as("ignored_exclusions"))
    requests.join(broadcast(winner), Seq("req_id"), "left")
      .select(col("req_id"),
        when(col("picked").isNotNull, lit("ALLOCATED"))
          .otherwise(lit("CREATE_PIPELINE")).as("verdict"),
        coalesce(col("win_pipeline"), lit("")).as("pipeline_id"),
        coalesce(col("picked"), lit(0L)).as("container_id"),
        coalesce(col("minted"), lit(false)).as("minted"),
        coalesce(col("ignored_exclusions"), lit(false))
          .as("ignored_exclusions"))
      .orderBy("req_id")
  }

  def replicationQueue(replicas: DataFrame, datanodes: DataFrame,
                       containersScm: DataFrame): DataFrame = {
    val dn = datanodes.select(col("uuid").as("datanode"), col("state"),
      col("op_state"))
    val counts = replicas
      .join(broadcast(dn), Seq("datanode"))
      .filter(col("state") =!= "DEAD" && col("replica_state") === "CLOSED")
      .groupBy("container_id")
      .agg(
        sum(when(col("op_state") === "IN_SERVICE", 1L).otherwise(0L))
          .as("available"),
        sum(when(col("op_state") =!= "IN_SERVICE", 1L).otherwise(0L))
          .as("out_of_service"))
    val under = containersScm
      .filter(col("state") =!= "DELETED")
      .join(counts, Seq("container_id"), "left")
      .withColumn("available", coalesce(col("available"), lit(0L)))
      .withColumn("out_of_service", coalesce(col("out_of_service"), lit(0L)))
      .filter(col("available") < col("replication_factor") &&
        col("available") + col("out_of_service") > 0)
      .withColumn("remaining_redundancy",
        greatest(col("available") + col("out_of_service") - 1, lit(0L)))
      .withColumn("due_to_out_of_service",
        col("available") + col("out_of_service") >=
          col("replication_factor"))
      .withColumn("weighted_redundancy",
        when(col("due_to_out_of_service"), lit(5L))
          .otherwise(col("remaining_redundancy")))
    under
      .withColumn("queue_pos", row_number().over(
        Window.partitionBy(lit(0))
          .orderBy(col("weighted_redundancy"), col("container_id"))))
      .select("queue_pos", "container_id", "replication_factor",
        "available", "out_of_service", "remaining_redundancy",
        "due_to_out_of_service", "weighted_redundancy")
      .orderBy("queue_pos")
  }

  /**
   * Background container METADATA scan — the data scan's cheap dual
   * (container-service/.../ozoneimpl/BackgroundContainerMetadataScanner
   * .java:49-59 iterates every container through
   * ContainerScanHelper.scanMetadata):
   *
   *  - gate (ContainerScanHelper.java:185-218 shouldScanMetadata /
   *    recentlyScanned): failed volume skips; a container whose last
   *    data-scan timestamp is within `minScanGapMs` (15 min default,
   *    ContainerScannerConfiguration.CONTAINER_SCAN_MIN_GAP_DEFAULT)
   *    skips; never-scanned containers always scan.
   *  - rungs (KeyValueContainerCheck.java:104-168 fastCheck/scanMetadata,
   *    first failure stops the walk): container dir → metadata dir →
   *    .container file missing/corrupt → file content checks; a missing
   *    chunks dir is recorded but does NOT stop the scan.
   *  - outcomes (ContainerScanHelper.java:101-131 scanMetadata): deleted
   *    container → quiet return (no metrics, no marking); transient
   *    FD-exhaustion errors → scan incomplete, no UNHEALTHY marking;
   *    real errors → markContainerUnhealthy (counter + volume scan only
   *    when the container wasn't already unhealthy,
   *    handleUnhealthyScanResult:135-164); a completed metadata scan
   *    does NOT advance the data-scan timestamp (:123-125).
   *
   * Scale shape: a single projection over the container catalog (a
   * control-plane dim) — no joins, no shuffles; at fleet scale this is
   * one map over DN container reports.
   */
  def containerMetaScan(containers: DataFrame,
                        minScanGapMs: Long = 900000L): DataFrame = {
    val gate =
      when(col("volume_failed"), lit("SKIP_VOLUME_FAILED"))
        .when(col("last_scan_ago_ms") >= 0 &&
          col("last_scan_ago_ms") < minScanGapMs,
          lit("SKIP_RECENTLY_SCANNED"))
        .otherwise(lit("SCAN"))
    // first-failing-rung walk; chunks-dir is the one non-fatal rung
    val firstFatal =
      when(!col("dir_exists"), lit("MISSING_CONTAINER_DIR"))
        .when(!col("meta_dir_exists"), lit("MISSING_METADATA_DIR"))
        .when(col("file_status") === "MISSING", lit("MISSING_CONTAINER_FILE"))
        .when(col("file_status") === "CORRUPT", lit("CORRUPT_CONTAINER_FILE"))
    val firstError =
      coalesce(firstFatal,
        when(col("file_check_errors") > 0, lit("CORRUPT_CONTAINER_FILE"))
          .when(!col("chunks_dir_exists"), lit("MISSING_CHUNKS_DIR"))
          .otherwise(lit("")))
    val nErrors =
      when(firstFatal.isNotNull, lit(1L))
        .otherwise(col("file_check_errors").cast("long") +
          when(col("chunks_dir_exists"), 0L).otherwise(1L))
    containers
      .withColumn("gate", gate)
      .withColumn("first_error",
        when(col("gate") =!= "SCAN" || col("deleted_during_scan"), lit(""))
          .otherwise(firstError))
      .withColumn("n_errors",
        when(col("gate") =!= "SCAN" || col("deleted_during_scan"), lit(0L))
          .otherwise(nErrors))
      .withColumn("transient",
        col("transient_fd_errors") && col("n_errors") > 0)
      .withColumn("action",
        when(col("gate") =!= "SCAN", col("gate"))
          .when(col("deleted_during_scan"), lit("DELETED"))
          .when(col("transient"), lit("INCOMPLETE"))
          .otherwise(lit("SCANNED")))
      .withColumn("mark_attempted",
        col("action") === "SCANNED" && col("n_errors") > 0)
      .withColumn("unhealthy_inc",
        col("mark_attempted") && !col("already_unhealthy"))
      .withColumn("volume_scan_triggered", col("unhealthy_inc"))
      .withColumn("scanned_inc", col("action") === "SCANNED")
      .select("container_id", "action", "first_error", "n_errors",
        "mark_attempted", "unhealthy_inc", "volume_scan_triggered",
        "scanned_inc")
      .orderBy("container_id")
  }

  /**
   * Stale RECOVERING-container scrub — the EC-recovery timeout reaper
   * (container-service/.../background/
   * StaleRecoveringContainerScrubbingService.java:58-103): the service
   * pass enqueues every recovering container whose deadline has passed
   * (`currentTime >= deadline`, removing it from the recovering map);
   * at task execution the deadline is RE-READ — a re-registered entry
   * with an extended deadline skips the scrub (:90-94), a container no
   * longer in the set is a no-op (:95-99), anything else is marked
   * UNHEALTHY. Containers still inside their deadline are not enqueued
   * at all.
   *
   * Scale shape: one projection over the DN's recovering map — a
   * control-plane dim.
   */
  def staleRecoveringScrub(recovering: DataFrame, nowMs: Long): DataFrame =
    recovering
      .withColumn("action",
        when(col("deadline_ms") > nowMs, lit("NOT_DUE"))
          .when(col("exec_deadline_ms") > nowMs, lit("SKIP_EXTENDED"))
          .when(!col("exists"), lit("SKIP_MISSING"))
          .otherwise(lit("MARK_UNHEALTHY")))
      .select("container_id", "deadline_ms", "action")
      .orderBy("container_id")

  /**
   * DN disk-balancer volume plan — DiskBalancerService +
   * DiskBalancerVolumeCalculation (container-service/.../diskbalancer/):
   * effectiveUsed = capacity − available + committed (:154-156
   * computeEffectiveUsage), utilization = effectiveUsed/capacity,
   * idealUsage = Σeff/Σcap (:70-100), thresholds ideal ± threshold/100
   * (DefaultContainerChoosingPolicy:96-99; default threshold 10% —
   * DiskBalancerConfiguration:68), bytesToMove = Σ max(0,
   * (util − upper)·capacity) (DiskBalancerService:772-800
   * calculateBytesToMove), volumeDataDensity = Σ|util − ideal|
   * (:113-141), and the pair gate: nothing moves while the highest
   * volume sits below upper AND the lowest above lower (:109-113).
   * Zero-capacity volumes are excluded from every calculation (:155).
   *
   * All ratios are basis points via integer floor division — the
   * engine's deterministic definition of the reference's doubles (same
   * decision structure; no FP in any comparison).
   *
   * Scale shape: per-DN volume sets are tiny dims; one scalar aggregate
   * broadcast-crossed back. thresholdBp = threshold·100 (10% = 1000).
   */
  def diskBalancerVolumePlan(volumes: DataFrame,
                             thresholdBp: Long = 1000L): DataFrame = {
    val usable = volumes.filter(col("capacity") > 0)
      .withColumn("effective_used",
        col("capacity") - col("available") + col("committed"))
      .withColumn("utilization_bp",
        expr("effective_used * 10000 DIV capacity"))
    val totals = usable.agg(
      expr("sum(effective_used) * 10000 DIV sum(capacity)").as("ideal_bp"),
      count(lit(1)).as("n_usable"),
      max("utilization_bp").as("max_util"),
      min("utilization_bp").as("min_util"))
    val planned = usable.crossJoin(broadcast(totals))
      .withColumn("upper_bp", col("ideal_bp") + thresholdBp)
      .withColumn("lower_bp", col("ideal_bp") - thresholdBp)
      .withColumn("role",
        when(col("utilization_bp") > col("upper_bp"), lit("ABOVE_THRESHOLD"))
          .when(col("utilization_bp") < col("lower_bp"),
            lit("BELOW_THRESHOLD"))
          .otherwise(lit("WITHIN")))
      .withColumn("bytes_to_move", expr(
        "greatest((utilization_bp - upper_bp) * capacity, 0L) DIV 10000"))
      .withColumn("move_needed",
        col("n_usable") >= 2 &&
          !(col("max_util") < col("upper_bp") &&
            col("min_util") > col("lower_bp")))
    val density = planned.agg(
      when(max(col("n_usable")) <= 1, 0L)
        .otherwise(sum(abs(col("utilization_bp") - col("ideal_bp"))))
        .cast("long").as("density_bp"))
    val skipped = volumes.filter(col("capacity") <= 0)
      .select(col("volume_id"), col("capacity"),
        lit(0L).as("effective_used"), lit(0L).as("utilization_bp"),
        lit(0L).as("ideal_bp"), lit(0L).as("lower_bp"),
        lit(0L).as("upper_bp"), lit("SKIPPED_NO_CAPACITY").as("role"),
        lit(0L).as("bytes_to_move"), lit(false).as("move_needed"))
    planned
      .select("volume_id", "capacity", "effective_used", "utilization_bp",
        "ideal_bp", "lower_bp", "upper_bp", "role", "bytes_to_move",
        "move_needed")
      .unionByName(skipped)
      .crossJoin(broadcast(density))
      .orderBy("volume_id")
  }

  /**
   * DN disk-balancer move choice — DefaultContainerChoosingPolicy
   * (diskbalancer/policy/DefaultContainerChoosingPolicy.java:71-230):
   * volumes sorted ascending by (utilization, storageID); the source is
   * the LAST (highest) volume; the destination is the first
   * lower-utilization volume with positive usable space (available −
   * committed − spared, VolumeUsage:182-184); the source's containers
   * are scanned in order against the rungs of chooseContainer:166-230 —
   * dropped from the container set, move already in progress, zero
   * bytes, state outside the movable set ({CLOSED, QUASI_CLOSED} —
   * DiskBalancerConfiguration:52), container ≥ destination usable
   * space, and the would-exceed-upper-threshold projection
   * (computeUtilization with committed + container size) — the first
   * survivor is CHOSEN and the scan stops (containers after it are
   * NOT_SCANNED). Models the fresh-iterator first-destination pass; the
   * reference's hour-long per-volume iterator cache makes later
   * destinations see only the iterator's remainder
   * (DefaultContainerChoosingPolicy:60-63).
   *
   * Scale shape: one windowed scan over the source volume's container
   * list joined against two broadcast one-row dims (source pick, dest
   * pick). Integer basis points throughout.
   */
  def diskBalancerMove(volumes: DataFrame, containers: DataFrame,
                       thresholdBp: Long = 1000L): DataFrame = {
    val usable = volumes.filter(col("capacity") > 0)
      .withColumn("effective_used",
        col("capacity") - col("available") + col("committed"))
      .withColumn("utilization_bp",
        expr("effective_used * 10000 DIV capacity"))
      .withColumn("usable_space",
        col("available") - col("committed") - col("spared"))
    val ideal = usable.agg(
      expr("sum(effective_used) * 10000 DIV sum(capacity)").as("ideal_bp"))
    val src = usable
      .orderBy(col("utilization_bp").desc, col("volume_id").desc)
      .limit(1)
      .select(col("volume_id").as("src_volume"),
        col("utilization_bp").as("src_util"))
    val dst = usable.crossJoin(broadcast(src))
      .filter(col("utilization_bp") < col("src_util") &&
        col("usable_space") > 0)
      .orderBy(col("utilization_bp"), col("volume_id"))
      .limit(1)
      .select(col("volume_id").as("dst_volume"),
        col("capacity").as("dst_capacity"),
        col("available").as("dst_available"),
        col("committed").as("dst_committed"),
        col("usable_space").as("dst_usable"))
    val verdictRaw =
      when(!col("in_set"), lit("SKIP_NOT_IN_SET"))
        .when(col("in_progress"), lit("SKIP_IN_PROGRESS"))
        .when(col("bytes_used") <= 0, lit("SKIP_EMPTY"))
        .when(!col("state").isin("CLOSED", "QUASI_CLOSED"),
          lit("SKIP_STATE"))
        .when(col("bytes_used") >= col("dst_usable"), lit("SKIP_TOO_BIG"))
        .when(expr("(dst_capacity - dst_available + dst_committed + " +
          "bytes_used) * 10000 DIV dst_capacity") >=
          col("ideal_bp") + thresholdBp, lit("SKIP_WOULD_EXCEED"))
        .otherwise(lit("CHOSEN"))
    val wScan = Window.partitionBy(lit(0)).orderBy("container_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    containers.crossJoin(broadcast(src))
      .filter(col("volume_id") === col("src_volume"))
      .crossJoin(broadcast(dst))
      .crossJoin(broadcast(ideal))
      .withColumn("verdict_raw", verdictRaw)
      .withColumn("chosen_before",
        coalesce(sum(when(col("verdict_raw") === "CHOSEN", 1L)
          .otherwise(0L)).over(wScan), lit(0L)))
      .withColumn("verdict",
        when(col("chosen_before") > 0, lit("NOT_SCANNED"))
          .otherwise(col("verdict_raw")))
      .select("container_id", "src_volume", "dst_volume", "verdict",
        "bytes_used")
      .orderBy("container_id")
  }
}
