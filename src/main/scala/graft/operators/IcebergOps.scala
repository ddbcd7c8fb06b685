package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Iceberg table-path rewrite — the copy-plan side of Ozone's
 * `RewriteTablePathOzoneAction` (reference:
 * hadoop-ozone/iceberg/src/main/java/org/apache/hadoop/ozone/iceberg/
 * RewriteTablePathOzoneAction.java:160-430 +
 * RewriteTablePathOzoneUtils.java:55-77), which relocates an Iceberg
 * table between Ozone prefixes by rewriting its metadata tree and
 * planning the file copies.
 *
 * Incremental semantics (:280-303 rewriteVersionFiles, :320-405
 * manifestsToRewrite): with a start version (EXCLUSIVE) the scope is
 * the version files after it up to the end version, the snapshots those
 * versions added (validSnapshots = snapshots(end) − snapshots(start)),
 * the manifest LIST of every valid snapshot, only the manifests whose
 * addedSnapshotId is in the delta set, and the data files those
 * manifests added; without a start version everything up to the end
 * version is in scope. Version files, manifest lists and manifests are
 * REWRITTEN into a staging dir first and copied from there
 * (:305-318 rewriteVersionFile — `copy_src` is the staged relativized
 * path); data and statistics files copy verbatim (statsFileCopyPlan
 * pairs them 1:1 with the rewritten metadata's stats entries).
 *
 * Scale shape: versions/snapshots/manifests are metadata-sized dims and
 * broadcast; the data-file inventory (billions of rows on a real table)
 * is touched by exactly one broadcast semi-probe on the delta snapshot
 * set — no shuffle over the inventory.
 */
object IcebergOps {

  def rewritePathCopyPlan(versions: DataFrame, snapshots: DataFrame,
                          manifests: DataFrame, dataFiles: DataFrame,
                          stats: DataFrame, startIdx: Long, endIdx: Long,
                          srcPrefix: String, tgtPrefix: String,
                          stagingDir: String): DataFrame = {
    require(srcPrefix != tgtPrefix,
      "Source prefix cannot be the same as target prefix")
    val suffix = expr(s"substring(path, ${srcPrefix.length + 1})")
    def planned(df: DataFrame, tpe: String, staged: Boolean): DataFrame =
      df.select(lit(tpe).as("file_type"), col("path"),
        (if (staged) concat(lit(stagingDir), suffix) else col("path"))
          .as("copy_src"),
        concat(lit(tgtPrefix), suffix).as("dst_path"))
    val versionScope = versions
      .filter(col("version_idx") > startIdx && col("version_idx") <= endIdx)
    val validSnaps = snapshots
      .filter(col("added_in_version") > startIdx &&
        col("added_in_version") <= endIdx)
    val deltaIds = validSnaps.select("snapshot_id")
    val manifestScope = manifests
      .join(broadcast(deltaIds), Seq("snapshot_id"), "left_semi")
    val dataScope = dataFiles
      .join(broadcast(deltaIds.withColumnRenamed("snapshot_id",
        "added_snapshot_id")), Seq("added_snapshot_id"), "left_semi")
    val statsScope = stats.join(broadcast(
        versionScope.select("version_idx")), Seq("version_idx"), "left_semi")
    planned(versionScope.select("path"), "VERSION_FILE", staged = true)
      .unionByName(planned(statsScope.select(col("stats_path").as("path")),
        "STATS_FILE", staged = false))
      .unionByName(planned(validSnaps
        .select(col("manifest_list").as("path")), "MANIFEST_LIST",
        staged = true))
      .unionByName(planned(manifestScope
        .select(col("manifest_path").as("path")), "MANIFEST", staged = true))
      .unionByName(planned(dataScope.select(col("data_path").as("path")),
        "DATA_FILE", staged = false))
      .orderBy("file_type", "path")
  }
}
