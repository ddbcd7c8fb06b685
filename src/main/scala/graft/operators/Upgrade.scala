package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Upgrade / finalization plane of the reference (apache/ozone) — the
 * layout-version state machine every component (OM, SCM, DN) walks when a
 * new software version lands:
 *
 *  - FinalizationCheckpoint (hdds/scm/server/upgrade/
 *    FinalizationCheckpoint.java:31-86): external state is the pair
 *    (finalization mark present, MLV < SLV); exactly one of the four
 *    checkpoints matches any combination, and each maps to the client
 *    status string;
 *  - BasicUpgradeFinalizer.initFinalize (framework/.../upgrade/
 *    BasicUpgradeFinalizer.java:204-231): the entry ladder on the stored
 *    upgrade state, including BOTH inconsistent-state refusals (state
 *    DONE while MLV is still behind; state REQUIRED while MLV already
 *    caught up);
 *  - AbstractLayoutVersionManager (framework/.../upgrade/
 *    AbstractLayoutVersionManager.java:70-98,118-146): startup refuses
 *    MLV > SLV outright; a finalize step only ever advances MLV by one
 *    feature (replayed features ≤ MLV are idempotent skips);
 *  - the features walked are the catalog entries in (MLV, SLV], in
 *    layout-version order (BasicUpgradeFinalizer.finalizeLayoutFeature +
 *    HDDSLayoutFeature.java:28-45).
 *
 * Scale shape: both inputs are control-plane dims; the feature count per
 * component is a broadcast range join.
 */
object Upgrade {

  /**
   * Per-component finalization decision row: checkpoint classification,
   * client status, the initFinalize verdict, and the pending feature walk
   * (count + first feature + the MLV a successful run ends at).
   */
  def finalizationWalk(components: DataFrame,
                       features: DataFrame): DataFrame = {
    val needs = col("mlv") < col("slv")
    val checkpoint =
      when(col("mlv") > col("slv"), lit("INVALID_MLV_AHEAD"))
        .when(!col("has_mark") && needs, lit("FINALIZATION_REQUIRED"))
        .when(col("has_mark") && needs, lit("FINALIZATION_STARTED"))
        .when(col("has_mark") && !needs, lit("MLV_EQUALS_SLV"))
        .otherwise(lit("FINALIZATION_COMPLETE"))
    val status =
      when(col("checkpoint") === "INVALID_MLV_AHEAD", lit("ERROR"))
        .when(col("checkpoint") === "FINALIZATION_REQUIRED",
          lit("FINALIZATION_REQUIRED"))
        .when(col("checkpoint").isin("FINALIZATION_STARTED",
          "MLV_EQUALS_SLV"), lit("FINALIZATION_IN_PROGRESS"))
        .otherwise(lit("FINALIZATION_DONE"))
    val initVerdict =
      when(col("mlv") > col("slv"), lit("ERR_MLV_AHEAD"))
        .when(col("upgrade_state") === "STARTING_FINALIZATION",
          lit("STARTING"))
        .when(col("upgrade_state") === "FINALIZATION_IN_PROGRESS",
          lit("IN_PROGRESS"))
        .when(col("upgrade_state").isin("FINALIZATION_DONE",
          "ALREADY_FINALIZED"),
          when(needs, lit("ERR_INCONSISTENT_DONE")).otherwise(
            lit("FINALIZED")))
        .otherwise(
          when(!needs, lit("ERR_INCONSISTENT_REQUIRED"))
            .otherwise(lit("PROCEED")))
    val pending = components
      .join(broadcast(features),
        col("version") > col("mlv") && col("version") <= col("slv"),
        "left")
      .groupBy("comp_id")
      .agg(
        sum(when(col("version").isNotNull, 1L).otherwise(0L))
          .as("n_features"),
        coalesce(min_by(col("feature"), col("version")), lit(""))
          .as("first_feature"))
    components
      .join(pending, Seq("comp_id"))
      .withColumn("checkpoint", checkpoint)
      .withColumn("client_status", status)
      .withColumn("init_verdict", initVerdict)
      .withColumn("target_mlv",
        when(col("init_verdict") === "PROCEED", col("slv"))
          .otherwise(col("mlv")))
      .select("comp_id", "kind", "checkpoint", "client_status",
        "init_verdict", "n_features", "first_feature", "target_mlv")
      .orderBy("comp_id")
  }
}
