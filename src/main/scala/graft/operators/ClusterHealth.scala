package graft.operators

import org.apache.spark.sql.DataFrame
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

  /** Deleted-directory purge backlog: each deleted dir with the file count
    * and bytes still pending purge in its subtree — the Recon OM-insight
    * over deletedDirectoryTable. A dir's subtree aggregate IS its
    * [[Aggregates.nsSummary]] row (every file contributes to every
    * ancestor), so this is the rollup semi-joined to the deleted set —
    * no per-dir subtree scans. */
  def deletedDirsInsight(objects: DataFrame,
                         deletedDirs: DataFrame): DataFrame =
    Aggregates.nsSummary(objects)
      .join(broadcast(deletedDirs), Seq("volume", "bucket", "dir"))
      .select(col("volume"), col("bucket"), col("dir"), col("deleted_ms"),
        col("num_files").as("pending_files"),
        col("size_of_files").as("pending_bytes"))
      .orderBy("volume", "bucket", "dir")
}
