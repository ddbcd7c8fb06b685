package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Snapshot space reclamation — the engine's dual of the reference's
 * ReclaimableKeyFilter (hadoop-ozone/ozone-manager/src/main/java/org/apache/
 * hadoop/ozone/om/snapshot/filter/ReclaimableKeyFilter.java:87-117): a
 * deleted key buffered in a snapshot's (or the active store's) deletedTable
 * is RECLAIMABLE — its blocks may be purged — iff the same key is absent
 * from the previous snapshot in the chain; "same key" means same name, same
 * objectID and identical block locations (SnapshotUtils.java:289-330
 * isBlockLocationInfoSame). If it IS present there but absent from the
 * previous-to-previous snapshot, the key is retained exclusively by that
 * previous snapshot and its size accrues to the snapshot's exclusiveSize
 * (ReclaimableKeyFilter.java:142-154 calculateExclusiveSize) — the number
 * the reference shows as "space freed when this snapshot is deleted".
 *
 * In this engine a snapshot state is a commit-log fold ([[CommitLog]]), so
 * block-location identity is modeled as (object_id, data_size) equality:
 * the synthetic workload's only location-changing op is the overwrite,
 * which doubles data_size (CommitLog.synthesizeLog), exactly like a block
 * reallocation. The prev-to-prev probe compares the PREVIOUS snapshot's
 * row (not the deleted entry) against the prev-prev state, matching the
 * reference's use of the prev snapshot's keyInfo for the second lookup
 * (ReclaimableKeyFilter.java:108-112).
 *
 * Scale shape: each deletedTable is decided by at most two equi-joins on
 * the namespace key (volume, bucket, key) against materialized snapshot
 * checkpoints — co-partitioned shuffles linear in |deletedTable|, with AQE
 * free to broadcast the (churn-sized) deleted side; never a log re-fold,
 * never a driver loop over keys.
 */
object Reclaim {

  /**
   * Decide one deletedTable against its chain context. `entries` carries
   * (volume, bucket, key, object_id, data_size) plus any passthrough
   * columns; the result appends:
   *   - `reclaimable`  — true iff absent from `prevState` (or the chain
   *     has no previous snapshot, ReclaimableKeyFilter.java:100-102);
   *   - `exclusive_to` — `prevName` when retained exclusively by the
   *     previous snapshot (present there, absent from `prevPrevState`),
   *     else null.
   */
  def reclaimDecisions(entries: DataFrame, prevState: Option[DataFrame],
                       prevName: String,
                       prevPrevState: Option[DataFrame]): DataFrame =
    prevState match {
      case None =>
        // chain head: nothing precedes, every deleted key is reclaimable
        entries.withColumn("reclaimable", lit(true))
          .withColumn("exclusive_to", lit(null).cast("string"))
      case Some(prev) =>
        val p = prev.select(col("volume"), col("bucket"), col("key"),
          col("object_id").as("__p_oid"), col("data_size").as("__p_size"))
        val withPrev = entries
          .join(p, Seq("volume", "bucket", "key"), "left")
          .withColumn("__prev_present",
            col("__p_oid").isNotNull &&
              col("__p_oid") === col("object_id") &&
              col("__p_size") === col("data_size"))
        val withBoth = prevPrevState match {
          case None => withPrev.withColumn("__pp_present", lit(false))
          case Some(pp0) =>
            val pp = pp0.select(col("volume"), col("bucket"), col("key"),
              col("object_id").as("__pp_oid"),
              col("data_size").as("__pp_size"))
            withPrev.join(pp, Seq("volume", "bucket", "key"), "left")
              .withColumn("__pp_present",
                col("__prev_present") && col("__pp_oid").isNotNull &&
                  col("__pp_oid") === col("__p_oid") &&
                  col("__pp_size") === col("__p_size"))
        }
        val keep = entries.columns.map(col)
        withBoth
          .withColumn("reclaimable", !col("__prev_present"))
          .withColumn("exclusive_to",
            when(col("__prev_present") && !col("__pp_present"),
              lit(prevName)))
          .select(keep :+ col("reclaimable") :+ col("exclusive_to"): _*)
    }

  /**
   * The active store's deletedTable for the reclaim workload: a post-s2
   * delete band (seq 5, after the last snapshot) over churn-scope keys,
   * one entry per key at its CURRENT folded size — the state a real
   * KeyDeletingService pass would see:
   *   - version 1 (never touched)    → present in s2 AND s1 → retained,
   *     shared with the prev-prev snapshot (no exclusive charge);
   *   - version 3 (overwritten @2)   → present in s2 at the doubled size,
   *     size-mismatched vs s1 → retained, exclusive to s2;
   *   - version 4 (already deleted @3) → absent from s2 → reclaimable
   *     (a second deleted generation of the key — the reference's
   *     RepeatedOmKeyInfo explicitly models several deleted versions).
   */
  def aosDeletedEntries(objects: DataFrame): DataFrame =
    objects
      .filter(expr("(object_id DIV 10) % 10") === 0 &&
        col("version").isin(1, 3, 4))
      .groupBy("volume", "bucket", "key", "object_id", "version")
      .agg(max("data_size").as("__mx"))
      .select(col("volume"), col("bucket"), col("key"), col("object_id"),
        when(col("version") === 3, col("__mx") * 2)
          .otherwise(col("__mx")).as("data_size"))

  /**
   * Declared reclaim query: decide every buffered deleted key through the
   * snapshot chain (s1 @1, s2 @4, active store), reading snapshot states
   * from the materialized warehouse checkpoints.
   *   - s2's deletedTable  = the log's seq-3 deletes (row-granular, like
   *     the reference's per-version RepeatedOmKeyInfo entries); chain
   *     context prev = s1, no prev-prev (s1 is the chain head);
   *   - active deletedTable = [[aosDeletedEntries]]; prev = s2,
   *     prev-prev = s1.
   */
  def snapshotReclaim(spark: SparkSession, objects: DataFrame,
                      dir: String): DataFrame = {
    val wh = CommitLog.snapshotWarehouse(spark, objects, dir)
    val s1 = spark.read.parquet(s"$wh/state_s1")
    val s2 = spark.read.parquet(s"$wh/state_s2")
    val snapDeleted = CommitLog.synthesizeLog(objects)
      .filter(col("op") === "DELETE")
      .select("volume", "bucket", "key", "object_id", "data_size")
    val inSnap = reclaimDecisions(snapDeleted, Some(s1), "s1", None)
      .select(lit("s2").as("owner"), col("*"))
    val inAos = reclaimDecisions(aosDeletedEntries(objects), Some(s2), "s2",
      Some(s1)).select(lit("AOS").as("owner"), col("*"))
    inSnap.unionByName(inAos)
      .orderBy("owner", "volume", "bucket", "key", "data_size")
  }

  /** Per-snapshot exclusive size rollup (the reference's exclusiveSizeMap,
    * persisted on SnapshotInfo and surfaced by the snapshot list UI):
    * bytes freed if that snapshot alone were deleted. */
  def snapshotExclusive(spark: SparkSession, objects: DataFrame,
                        dir: String): DataFrame =
    snapshotReclaim(spark, objects, dir)
      .filter(col("exclusive_to").isNotNull)
      .groupBy(col("exclusive_to").as("snapshot"))
      .agg(count(lit(1)).as("n_exclusive"),
        sum("data_size").cast("long").as("exclusive_bytes"))
      .orderBy("snapshot")

  /**
   * One KeyDeletingService purge pass over the reclaimable set —
   * KeyDeletingService.java:150-265: the task walks the deletedTable in
   * key order up to `keyLimitPerTask` keys, ships their block groups to
   * SCM ((size-1)/chunk+1 blocks per key, the locations layout), and
   * rolls the DB purge up PER BUCKET (BucketPurgeSize: purgedBytes +
   * purgedNamespace, the deltas that decrement bucket usage when the
   * purge request commits).
   *
   * Scale shape: the limit is a TakeOrdered over the already-decided
   * reclaim frame (top-K, never a global sort materialization), then one
   * (volume, bucket) rollup shuffle of at most `keyLimit` rows.
   */
  def purgePlan(spark: SparkSession, objects: DataFrame, dir: String,
                keyLimit: Int = 500): DataFrame =
    snapshotReclaim(spark, objects, dir)
      .filter(col("reclaimable"))
      .orderBy("owner", "volume", "bucket", "key", "data_size")
      .limit(keyLimit)
      .withColumn("__blocks", expr("IF(data_size <= 0, 0L, " +
        s"(data_size - 1) DIV ${graft.core.Tables.LocChunkBytes} + 1)"))
      .groupBy("volume", "bucket")
      .agg(count(lit(1)).as("purged_namespace"),
        sum("data_size").cast("long").as("purged_bytes"),
        sum("__blocks").cast("long").as("purged_blocks"))
      .orderBy("volume", "bucket")

  /**
   * Deleted-directory reclaim — ReclaimableDirFilter.java:58-73: a
   * deleted directory (an `rm -r` root awaiting the background purge) is
   * reclaimable iff the previous snapshot in the chain has no directory at
   * the same path with the same objectID; with no previous snapshot it is
   * always reclaimable. Directory ids in this engine are md5-path-derived
   * (Hierarchy.pathId), so id equality is implied by path equality and
   * presence is the whole decision.
   *
   * `prevDirs` is the previous snapshot's directory set (volume, bucket,
   * dir); the decision is one left-semi-shaped equi-join on the dir path —
   * co-partitioned with the (tiny) deletedDirectoryTable side, which AQE
   * broadcasts.
   */
  def dirReclaimDecisions(deletedDirs: DataFrame,
                          prevDirs: Option[DataFrame]): DataFrame =
    prevDirs match {
      case None => deletedDirs.withColumn("reclaimable", lit(true))
      case Some(prev) =>
        deletedDirs.join(
            prev.select(col("volume"), col("bucket"), col("dir"))
              .distinct().withColumn("__present", lit(true)),
            Seq("volume", "bucket", "dir"), "left")
          .withColumn("reclaimable", col("__present").isNull)
          .drop("__present")
    }

  /** Declared dir-reclaim query: the mixed-namespace deletedDirectoryTable
    * decided against the previous snapshot's directory set — the strict
    * ancestors of every key alive at the snapshot cut. A dir whose files
    * were all created after the cut has no prior-snapshot reference and
    * reclaims immediately; one retained by the snapshot must wait for the
    * chain to advance (SnapshotDeletingService ordering). */
  def reclaimDirs(deletedDirs: DataFrame, prevObjects: DataFrame): DataFrame = {
    val prevDirs = prevObjects
      .select(col("volume"), col("bucket"),
        Aggregates.parentDirOf("key").as("pdir"))
      .filter(col("pdir") =!= "")
      .select(col("volume"), col("bucket"),
        explode(Aggregates.dirAndAncestors("pdir")).as("dir"))
    dirReclaimDecisions(deletedDirs, Some(prevDirs))
      .orderBy("volume", "bucket", "dir")
  }

  /**
   * snapshotRenamedTable entry reclaim — ReclaimableRenameEntryFilter
   * .java:54-92: a rename entry (objectId → the key's dbKey at the time of
   * the last snapshot) is reclaimable iff that original dbKey no longer
   * resolves in the previous snapshot's key table (no reference remains;
   * the FSO dir-table arm does not arise here — the commit-log namespace
   * is flat OBS). The workload's renames (seq 3-4, between s1 and s2)
   * put the same entries in BOTH s2's frozen renamedTable and the active
   * store's — the snapshot is a frozen copy of the whole DB — and the two
   * owners decide oppositely: s2's entries probe s1, where the old names
   * still exist (retained); the active store's probe s2, where the rename
   * already applied (reclaimable). One distinct-entry build plus one
   * equi-join per owner on the namespace key.
   */
  def renameEntryReclaim(spark: SparkSession, objects: DataFrame,
                         dir: String): DataFrame = {
    val wh = CommitLog.snapshotWarehouse(spark, objects, dir)
    val entries = objects
      .filter(expr("(object_id DIV 10) % 10") === 0 && col("version") === 5)
      .select(col("volume"), col("bucket"), col("object_id"),
        col("key").as("orig_key"))
      .distinct()
    def decide(owner: String, prevState: DataFrame): DataFrame =
      entries.join(
          prevState.select(col("volume"), col("bucket"),
            col("key").as("orig_key")).withColumn("__present", lit(true)),
          Seq("volume", "bucket", "orig_key"), "left")
        .select(lit(owner).as("owner"), col("volume"), col("bucket"),
          col("object_id"), col("orig_key"),
          col("__present").isNull.as("reclaimable"))
    decide("s2", spark.read.parquet(s"$wh/state_s1"))
      .unionByName(decide("AOS", spark.read.parquet(s"$wh/state_s2")))
      .orderBy("owner", "volume", "bucket", "orig_key", "object_id")
  }

  /**
   * FS trash checkpoint rotation — TrashPolicyOzone.deleteCheckpoint /
   * createCheckpoint (ozone-manager/.../om/TrashPolicyOzone.java:196-310):
   * each emptier cycle walks every trash root, deletes checkpoints older
   * than the deletion interval, and renames `Current` into a fresh
   * checkpoint named yyMMddHHmmss-of-now. Per entry:
   *   - `Current` → CHECKPOINTED with the new name (createCheckpoint
   *     no-ops for roots without a Current — nothing to rename);
   *   - an unparseable name (neither yyMMddHHmmss nor the same with a
   *     `-N` collision suffix, :292-310) → IGNORED_UNPARSEABLE, warned
   *     and left in place;
   *   - checkpoint time older than (now − deletionInterval) → DELETED;
   *   - else KEPT.
   *
   * Scale shape: a pure projection over the trash-root listing (FS
   * control plane); the only window-free pass rides the scan.
   */
  /**
   * Directory-deleting-service purge walk — DirectoryDeletingService
   * .prepareDeleteDirRequest (ozone-manager/.../service/
   * DirectoryDeletingService.java:443-508) under the task's shared
   * `remainNum` budget (:732-736 `while (remainNum.get() > 0)`):
   * per pending deleted dir, IN TABLE ORDER —
   *
   *  - sub-directories move to the deleted-dir table first, capped by
   *    the remaining budget (:454-462);
   *  - then sub-FILES move to the deleted table, where a file is
   *    eligible only if the parent dir itself purges OR the
   *    reclaimable-file filter passes (:476-484 `purgeDir ||
   *    reclaimableFileFilter.apply`) — a snapshot-referenced file under
   *    a retained dir stays put;
   *  - the PARENT dir purges only when BOTH listings were fully
   *    processed (neither truncated by the budget, :495-498) and it is
   *    itself reclaimable; the purge consumes one more budget unit
   *    (:499-501, may drive the counter negative — the loop then
   *    stops);
   *  - a dir yielding nothing (no moves, no purge) is skipped without
   *    consuming budget (:496-498 Optional.empty);
   *  - once the budget is spent the walk stops — later dirs are
   *    untouched this round.
   *
   * Scale shape: full-demand prefix sums over the (ordered) pending-dir
   * table reproduce the sequential budget recurrence exactly — after
   * the first truncated dir the running budget is ≤ 0, so every later
   * dir reads NOT_REACHED; one window pass, no driver loop.
   */
  def dirDeleteWalk(dirs: DataFrame, budget: Long = 10L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(0)).orderBy("dir_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    dirs
      .withColumn("eligible_files",
        when(col("purge_dir"), col("n_subfiles"))
          .otherwise(col("n_reclaimable_files")))
      .withColumn("base_demand", col("n_subdirs") + col("eligible_files"))
      .withColumn("full_consumed",
        col("base_demand") + when(col("purge_dir"), 1L).otherwise(0L))
      .withColumn("budget_before",
        lit(budget) - coalesce(sum("full_consumed").over(w), lit(0L)))
      .withColumn("action",
        when(col("budget_before") <= 0, lit("NOT_REACHED"))
          .when(col("base_demand") <= col("budget_before"),
            when(col("purge_dir"), lit("PURGED"))
              .when(col("base_demand") > 0, lit("MOVED"))
              .otherwise(lit("SKIP_EMPTY")))
          .otherwise(lit("PARTIAL")))
      .withColumn("subdirs_moved",
        when(col("action") === "NOT_REACHED", lit(0L))
          .otherwise(least(col("n_subdirs"), col("budget_before"))))
      .withColumn("files_moved",
        when(col("action") === "NOT_REACHED", lit(0L))
          .otherwise(least(col("eligible_files"),
            col("budget_before") - col("subdirs_moved"))))
      .withColumn("parent_purged", col("action") === "PURGED")
      .select("dir_id", "action", "subdirs_moved", "files_moved",
        "parent_purged", "budget_before")
      .orderBy("dir_id")
  }

  /**
   * Snapshot-defrag service plan — SnapshotDefragService
   * (ozone-manager/.../snapshot/defrag/SnapshotDefragService.java):
   *
   *  - run gate (:813-827 triggerSnapshotDefragOnce): without the
   *    rocks-tools native library the WHOLE run refuses — every chain
   *    entry is untouched (SKIPPED_NATIVE);
   *  - the task walks the GLOBAL snapshot chain forward with a
   *    per-task budget (snapshotLimitPerTask, default 1 —
   *    OMConfigKeys:497); iteration stops when the budget is spent, so
   *    later entries — defrag-needing or not — are NOT_REACHED (:845-
   *    858 `while (snapshotLimit > 0 && ...)`);
   *  - an already-defragmented snapshot (needsDefragmentation=false,
   *    :686-712) is skipped without consuming budget, and its stale
   *    checkpoint version dirs below `version` are cleaned
   *    (deleteSnapshotCheckpointDirectories(version-1)) when version>0;
   *  - a defrag-needing snapshot checkpoints its PATH predecessor —
   *    or itself when it is the first in its (volume,bucket) path chain
   *    (:716-718) — and runs FULL defragmentation in that first-in-path
   *    case (:734-744: per tracked column family {keyTable,
   *    directoryTable, fileTable} delete ranges outside the bucket
   *    prefix + force-compact ⇒ tables_compacted = 3), INCREMENTAL
   *    otherwise (:746-756: delta SST files → spilled logical diff →
   *    ingest); either way the snapshot DB atomically switches to
   *    version+1 and checkpoint dirs ≤ version−1 are dropped
   *    (:762-776, atomicSwitchSnapshotDB:512-540).
   *
   * Scale shape: the chain is control-plane-sized; two window passes
   * (path lag + running budget) over a literal dim — no corpus access.
   */
  /**
   * Snapshot-deleting-service walk — SnapshotDeletingService.call
   * (ozone-manager/.../service/SnapshotDeletingService.java:127-233):
   * the GLOBAL chain iterated newest→oldest (`chainManager
   * .iterator(true)` = reverse, SnapshotChainManager.java:407-432),
   * under TWO shared budgets — keyLimitPerTask entries and
   * snapshotDeletionPerTask processed snapshots. Per snapshot, in walk
   * order:
   *
   *  - shouldIgnoreSnapshot (:446-450): status != SNAPSHOT_DELETED or
   *    un-flushed DB changes → skipped FREE (neither budget moves);
   *  - the next PATH snapshot (SnapshotUtils.getNextSnapshot:154-170)
   *    not ACTIVE → skipped free too (:148-155 — moving entries into a
   *    snapshot that is itself deleted would just be re-copied);
   *  - else the snapshot's deleted-key entries drain first (capped by
   *    the remaining entry budget), then deleted dirs, then renamed
   *    entries (each capped by what the previous table left,
   *    :176-190) — entries move to the next path snapshot, or to the
   *    active object store when the path ends (dest AOS, :157-163);
   *  - a snapshot yielding ZERO entries joins the purge batch instead
   *    (:218-220 → submitSnapshotPurgeRequest) and consumes only a
   *    snapshot-limit slot;
   *  - when either budget hits zero the loop exits (:139) — later
   *    chain positions (skips included) are untouched this run.
   *
   * Move submission is assumed to succeed (the reference retries a
   * failed Ratis submit on the next run — a transport concern).
   * Scale shape: the chain is control-plane-sized; one path-lead pass
   * + full-demand prefix sums over the walk order reproduce the
   * sequential two-budget recurrence (after any truncating row the
   * running entry budget is ≤ 0, so every later row reads NOT_REACHED
   * — same argument as [[dirDeleteWalk]]).
   */
  def snapshotDeleteWalk(chain: DataFrame, keyLimit: Long = 20L,
                         snapLimit: Long = 3L): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val wPath = W.partitionBy("path_id").orderBy("path_seq")
    val wWalk = W.partitionBy(lit(0)).orderBy(col("global_seq").desc)
      .rowsBetween(W.unboundedPreceding, -1)
    chain
      .withColumn("next_snap", lead("snap", 1).over(wPath))
      .withColumn("next_status", lead("status", 1).over(wPath))
      .withColumn("skip_reason",
        when(col("status") =!= "SNAPSHOT_DELETED", lit("SKIP_ACTIVE"))
          .when(!col("flushed"), lit("SKIP_NOT_FLUSHED"))
          .when(col("next_snap").isNotNull &&
            col("next_status") =!= "SNAPSHOT_ACTIVE",
            lit("SKIP_NEXT_NOT_ACTIVE")))
      .withColumn("total_entries",
        col("n_deleted_keys") + col("n_deleted_dirs") + col("n_renames"))
      .withColumn("budget_before",
        lit(keyLimit) - coalesce(sum(when(col("skip_reason").isNotNull,
          lit(0L)).otherwise(col("total_entries"))).over(wWalk), lit(0L)))
      .withColumn("snaps_before",
        lit(snapLimit) - coalesce(sum(when(col("skip_reason").isNotNull,
          lit(0L)).otherwise(lit(1L))).over(wWalk), lit(0L)))
      .withColumn("reached",
        col("budget_before") > 0 && col("snaps_before") > 0)
      .withColumn("action",
        when(!col("reached"), lit("NOT_REACHED"))
          .when(col("skip_reason").isNotNull, col("skip_reason"))
          .when(col("total_entries") === 0, lit("PURGE_LISTED"))
          .otherwise(lit("MOVED")))
      .withColumn("keys_moved",
        when(col("action") === "MOVED",
          least(col("n_deleted_keys"), col("budget_before")))
          .otherwise(lit(0L)))
      .withColumn("dirs_moved",
        when(col("action") === "MOVED",
          least(col("n_deleted_dirs"),
            col("budget_before") - col("keys_moved")))
          .otherwise(lit(0L)))
      .withColumn("renames_moved",
        when(col("action") === "MOVED",
          least(col("n_renames"), col("budget_before") -
            col("keys_moved") - col("dirs_moved")))
          .otherwise(lit(0L)))
      .withColumn("dest",
        when(col("action") === "MOVED",
          coalesce(col("next_snap"), lit("AOS"))).otherwise(lit("")))
      .select("global_seq", "snap", "action", "keys_moved", "dirs_moved",
        "renames_moved", "dest", "budget_before", "snaps_before")
      .orderBy("global_seq")
  }

  def snapshotDefragPlan(chain: DataFrame, limitPerTask: Int = 2,
                         nativeAvailable: Boolean = true): DataFrame = {
    val wPath = org.apache.spark.sql.expressions.Window
      .partitionBy("volume", "bucket").orderBy("global_idx")
    val wChain = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(0)).orderBy("global_idx")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    chain
      .withColumn("path_prev", lag("name", 1).over(wPath))
      .withColumn("defrag_rank",
        sum(when(col("needs_defrag"), 1L).otherwise(0L)).over(wChain))
      .withColumn("prior_defrags",
        col("defrag_rank") - when(col("needs_defrag"), 1L).otherwise(0L))
      .withColumn("visited",
        lit(nativeAvailable) && col("prior_defrags") < limitPerTask)
      .withColumn("action",
        when(!lit(nativeAvailable), lit("SKIPPED_NATIVE"))
          .when(!col("visited"), lit("NOT_REACHED"))
          .when(!col("needs_defrag"), lit("SKIP_DEFRAGGED"))
          .when(col("path_prev").isNull, lit("FULL_DEFRAG"))
          .otherwise(lit("INCREMENTAL_DEFRAG")))
      .withColumn("checkpoint_source",
        when(col("action").isin("FULL_DEFRAG", "INCREMENTAL_DEFRAG"),
          coalesce(col("path_prev"), col("name"))).otherwise(lit("")))
      .withColumn("tables_compacted",
        when(col("action") === "FULL_DEFRAG", lit(3L)).otherwise(lit(0L)))
      .withColumn("new_version",
        when(col("action").isin("FULL_DEFRAG", "INCREMENTAL_DEFRAG"),
          col("version") + 1L).otherwise(col("version")))
      .withColumn("cleanup_below",
        when(col("action").isin("FULL_DEFRAG", "INCREMENTAL_DEFRAG"),
          col("version") - 1L)
          .when(col("action") === "SKIP_DEFRAGGED" && col("version") > 0,
            col("version") - 1L)
          .otherwise(lit(-1L)))
      .select("global_idx", "name", "volume", "bucket", "action",
        "checkpoint_source", "tables_compacted", "new_version",
        "cleanup_below")
      .orderBy("global_idx")
  }

  def trashCheckpointRotation(entries: DataFrame, nowMs: Long,
                              deletionIntervalMs: Long): DataFrame = {
    val base = regexp_replace(col("name"), "-\\d+$", "")
    val parseable = base.rlike("^\\d{12}$")
    val ts = unix_millis(to_timestamp(base, "yyMMddHHmmss"))
    val newName = date_format(
      to_timestamp(lit(nowMs / 1000)), "yyMMddHHmmss")
    entries
      .withColumn("action",
        when(col("name") === "Current", lit("CHECKPOINTED"))
          .when(!parseable, lit("IGNORED_UNPARSEABLE"))
          .when(ts < nowMs - deletionIntervalMs, lit("DELETED"))
          .otherwise(lit("KEPT")))
      .withColumn("new_name",
        when(col("name") === "Current", newName).otherwise(lit("")))
      .select("trash_root", "name", "action", "new_name")
      .orderBy("trash_root", "name")
  }
}
