package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Write path as a commit log — the engine's analog of the reference's write
 * RPC dispatch (apache/ozone OzoneManagerRatisUtils.java:150-335: CreateKey,
 * CommitKey, DeleteKey(s), RenameKey(s), CreateSnapshot, ...). Every write
 * reduces to KV-level PUT(key, row)/DELETE(key) records with a total seq
 * order (the Ratis log); a snapshot is just a (name, seq) pointer
 * (SnapshotInfo), and reading any snapshot is a latest-op-wins fold of the
 * log up to its seq — the same semantics RocksDB gives the reference.
 *
 * Scale design: [[applyAt]] is ONE window over (volume, bucket, key) — a
 * single shuffle on the namespace key, map-side pre-filterable by seq; no
 * per-op driver loop, no iterative reconciliation. Snapshot diff reuses the
 * object_id full-outer join of [[Joins.snapshotDiff]] on two folded states.
 */
object CommitLog {

  /**
   * Deterministic synthetic write workload over the namespace (the
   * fixture's stand-in for live write RPCs). Per object key, keyed by its
   * version v (v == linenumber, fixed per key):
   *   - every key:        PUT  @seq 1 (create)
   *   - v ∈ {3, 6}:       PUT  @seq 2 with doubled size (overwrite/commit)
   *   - v == 4:           DELETE @seq 3 (delete)
   *   - v == 5:           DELETE @seq 3 + PUT key||'.mv' @seq 4 (rename)
   * Seq bands give the log its total order; duplicate fixture rows for the
   * same key tie-break deterministically inside the fold (size desc).
   */
  def synthesizeLog(objects: DataFrame): DataFrame = {
    val base = objects.select(
      col("volume"), col("bucket"), col("key"), col("object_id"),
      col("container_id"), col("data_size"), col("version"))
    val creates = base.select(lit(1L).as("seq"), lit("PUT").as("op"),
      col("volume"), col("bucket"), col("key"), col("object_id"),
      col("container_id"), col("data_size"))
    val overwrites = base.filter(col("version") === 3 || col("version") === 6)
      .select(lit(2L).as("seq"), lit("PUT").as("op"),
        col("volume"), col("bucket"), col("key"), col("object_id"),
        col("container_id"), (col("data_size") * 2).as("data_size"))
    val deletes = base.filter(col("version") === 4 || col("version") === 5)
      .select(lit(3L).as("seq"), lit("DELETE").as("op"),
        col("volume"), col("bucket"), col("key"), col("object_id"),
        col("container_id"), col("data_size"))
    val renames = base.filter(col("version") === 5)
      .select(lit(4L).as("seq"), lit("PUT").as("op"),
        col("volume"), col("bucket"),
        concat(col("key"), lit(".mv")).as("key"), col("object_id"),
        col("container_id"), col("data_size"))
    creates.unionByName(overwrites).unionByName(deletes).unionByName(renames)
  }

  /** Snapshot pointers (SnapshotInfo table): name → last included seq. */
  val Snapshots: Seq[(String, Long)] = Seq("s1" -> 1L, "s2" -> 4L)

  /** Materialize table state as-of `maxSeq`: latest-op-wins per key (one
    * window = one shuffle), keeping only keys whose last op is a PUT. */
  def applyAt(log: DataFrame, maxSeq: Long): DataFrame = {
    val w = Window.partitionBy("volume", "bucket", "key")
      .orderBy(col("seq").desc, col("data_size").desc)
    log.filter(col("seq") <= maxSeq)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col("op") === "PUT")
      .select("volume", "bucket", "key", "object_id", "data_size")
  }

  /** Final applied state, totally ordered (the read view after all writes). */
  def appliedState(objects: DataFrame): DataFrame =
    applyAt(synthesizeLog(objects), Snapshots.last._2)
      .orderBy("volume", "bucket", "key", "data_size")

  /** One row per object_id (snapshot-read invariant; deterministic
    * representative: max size, then key) — same rule as Tables' snapshots. */
  private def dedupByObjectId(df: DataFrame): DataFrame = {
    val w = Window.partitionBy("object_id")
      .orderBy(col("data_size").desc, col("key"))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** deletedTable view (ref OMDBDefinition deletedTable, RepeatedOmKeyInfo:
    * a key can accumulate SEVERAL deleted versions): every key with DELETE
    * events in the log, with version count + reclaimable bytes. */
  def trashList(objects: DataFrame): DataFrame =
    synthesizeLog(objects)
      .filter(col("op") === "DELETE")
      .groupBy("volume", "bucket", "key")
      .agg(count(lit(1)).as("n_deleted"),
        sum("data_size").as("reclaim_bytes"))
      .orderBy("volume", "bucket", "key")

  /** Reachability check deleted ∩ referenced (ref block-deletion safety /
    * FSORepairTool shape): deleted keys whose container is still live —
    * blocks pending reclaim that a container scan must not drop. Broadcast
    * semi-join against the (small) live-container set. */
  def deletedButReferenced(objects: DataFrame, containersScm: DataFrame): DataFrame = {
    val deleted = synthesizeLog(objects)
      .filter(col("op") === "DELETE")
      .select("volume", "bucket", "key", "object_id", "container_id", "data_size")
    val live = containersScm.filter(col("state") =!= "DELETED")
      .select("container_id")
    deleted.join(broadcast(live), Seq("container_id"), "left_semi")
      .select("volume", "bucket", "key", "object_id", "container_id", "data_size")
      .orderBy("volume", "bucket", "key", "object_id", "data_size")
  }

  /** Snapshot diff computed from two COMMITTED versions of the log — the
    * write-path-derived dual of Joins.snapshotDiff over synthetic filters
    * (ref SnapshotDiffManager.java:1397-1469). */
  def snapshotDiffFromLog(objects: DataFrame): DataFrame = {
    val log = synthesizeLog(objects)
    val s1 = dedupByObjectId(applyAt(log, Snapshots.head._2))
    val s2 = dedupByObjectId(applyAt(log, Snapshots.last._2))
    Joins.snapshotDiff(s1, s2)
  }
}
