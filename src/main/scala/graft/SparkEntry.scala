package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.{OracleCte => O, Tables => T}
import graft.operators._

/**
 * Driver contract (see SURVEY.md §7): `queries` declares one entry per
 * implemented operator from SURVEY.md §2; `oracleSql` gives the DuckDB
 * equivalent over the same parquet tables (composed from OracleCte mirrors
 * of the Tables synthesis). Every query ends in a deterministic total ORDER
 * BY; all numeric outputs are integer-valued for cross-engine hash parity.
 */
object SparkEntry {

  /** Flagship: listKeys page over the synthesized namespace (sf0.001). */
  def entry(spark: SparkSession): DataFrame =
    Listing.listKeys(T.objects(spark, "/root/testdata/sf0.001"),
      "vol1", "bucket3", "warehouse/N/", "", 100)

  // Lifecycle rule set used by q_lifecycle_expiry (epochs: 1998-01-01, 1997-01-01).
  private val lcRules = Seq(
    Lifecycle.LcRule("r1", "warehouse/R/", Some("R"), 883612800000L),
    Lifecycle.LcRule("r2", "warehouse/A/", None, 852076800000L))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- listing family (SURVEY §2.1/2.2/2.6) ----
    "q_list_keys" -> ((s, d) =>
      Listing.listKeys(T.objects(s, d), "vol1", "bucket3", "warehouse/N/",
        "warehouse/N/2", 100)),
    "q_list_objects_v2" -> ((s, d) =>
      Listing.listObjectsV2(T.objects(s, d), "vol0", "bucket0",
        "warehouse/N/", "", 1000)),
    "q_list_status" -> ((s, d) =>
      Listing.listStatus(T.objects(s, d), "vol2", "bucket5", "warehouse/R")),
    "q_page_after" -> ((s, d) =>
      Listing.pageAfter(T.objects(s, d), "vol3", "bucket7",
        "warehouse/N/15", 50)),
    "q_list_buckets" -> ((s, d) =>
      Listing.listBuckets(T.buckets(s, d), "vol1", "bucket2", 5)),
    "q_list_volumes" -> ((s, d) => Listing.listVolumes(T.volumes(s, d))),
    // ---- aggregation family (SURVEY §2.4) ----
    "q_filesize_histogram" -> ((s, d) =>
      Aggregates.fileSizeHistogram(T.objects(s, d))),
    "q_container_histogram" -> ((s, d) =>
      Aggregates.containerSizeHistogram(T.containersScm(s, d))),
    "q_ns_summary" -> ((s, d) => Aggregates.nsSummary(T.objects(s, d))),
    "q_du_topn" -> ((s, d) => Aggregates.duTopN(T.objects(s, d), "vol0", 10)),
    "q_global_counts" -> ((s, d) =>
      Aggregates.globalCounts(T.objects(s, d), T.buckets(s, d),
        T.volumes(s, d), T.openKeys(s, d), T.containersScm(s, d))),
    "q_quota_usage" -> ((s, d) => Aggregates.quotaUsage(T.buckets(s, d))),
    "q_heatmap" -> ((s, d) => Aggregates.heatmap(T.auditAccess(s, d))),
    // ---- join/diff family (SURVEY §2.3/2.7) ----
    "q_container_key_join" -> ((s, d) =>
      Joins.containerKeyJoin(T.objects(s, d), T.containersScm(s, d))),
    "q_om_scm_mismatch" -> ((s, d) =>
      Joins.omScmMismatch(T.containersOm(s, d), T.containersScm(s, d))),
    "q_replica_health" -> ((s, d) =>
      Joins.replicaHealth(T.containersScm(s, d), T.replicas(s, d))),
    "q_snapshot_diff" -> ((s, d) =>
      Joins.snapshotDiff(T.snapshotV1(s, d), T.snapshotV2(s, d))),
    "q_snapshot_diff_summary" -> ((s, d) =>
      Joins.snapshotDiffSummary(T.snapshotV1(s, d), T.snapshotV2(s, d))),
    "q_layout_union" -> ((s, d) =>
      Joins.layoutUnion(T.objects(s, d), T.buckets(s, d))),
    // ---- predicate jobs + scalar/window (SURVEY §2.2/2.5/2.8) ----
    "q_lifecycle_expiry" -> ((s, d) =>
      Lifecycle.lifecycleExpiry(T.objects(s, d), lcRules)),
    "q_open_key_expiry" -> ((s, d) =>
      Lifecycle.openKeyExpiry(T.openKeys(s, d), 896659200000L)),
    "q_multipart_validate" -> ((s, d) =>
      Lifecycle.multipartValidate(T.multipartParts(s, d))),
    "q_multipart_etag" -> ((s, d) =>
      Lifecycle.multipartEtag(T.multipartParts(s, d))),
    "q_latest_version" -> ((s, d) =>
      Lifecycle.latestVersionWins(T.objects(s, d))),
    "q_range_read" -> ((s, d) =>
      Lifecycle.rangeReadPlan(T.objects(s, d), 1000L, 50000L)),
    "q_checksums" -> ((s, d) =>
      Lifecycle.checksumColumns(T.objects(s, d))))

  def oracleSql: Map[String, String] = Map(
    "q_list_keys" -> O.withCtes(
      """SELECT key, data_size, replicated_size, replication_type,
        |  creation_time, owner, etag
        |FROM objects
        |WHERE volume = 'vol1' AND bucket = 'bucket3'
        |  AND key LIKE 'warehouse/N/%' AND key > 'warehouse/N/2'
        |ORDER BY key, data_size, creation_time LIMIT 101""".stripMargin, O.objects),

    "q_list_objects_v2" -> O.withCtes(
      """SELECT entry, max(slash) > 0 AS is_common_prefix,
        |  count(*) AS num_keys, CAST(sum(data_size) AS BIGINT) AS total_size
        |FROM (
        |  SELECT CASE WHEN strpos(rest, '/') > 0
        |      THEN 'warehouse/N/' || substring(rest, 1, strpos(rest, '/'))
        |      ELSE key END AS entry,
        |    strpos(rest, '/') AS slash, data_size
        |  FROM (
        |    SELECT key, data_size, substring(key, 13) AS rest
        |    FROM objects
        |    WHERE volume = 'vol0' AND bucket = 'bucket0'
        |      AND key LIKE 'warehouse/N/%' AND key > ''))
        |GROUP BY entry ORDER BY entry LIMIT 1001""".stripMargin, O.objects),

    "q_list_status" -> O.withCtes(
      """SELECT CASE WHEN strpos(rest, '/') > 0
        |    THEN substring(rest, 1, strpos(rest, '/') - 1) ELSE rest END AS child,
        |  max(strpos(rest, '/')) > 0 AS is_dir,
        |  count(*) AS num_files,
        |  CAST(sum(data_size) AS BIGINT) AS total_size,
        |  max(modification_time) AS modification_time
        |FROM (
        |  SELECT substring(key, 13) AS rest, data_size, modification_time
        |  FROM objects
        |  WHERE volume = 'vol2' AND bucket = 'bucket5'
        |    AND key LIKE 'warehouse/R/%')
        |GROUP BY child ORDER BY child""".stripMargin, O.objects),

    "q_page_after" -> O.withCtes(
      """SELECT key, data_size, etag FROM objects
        |WHERE volume = 'vol3' AND bucket = 'bucket7'
        |  AND key > 'warehouse/N/15'
        |ORDER BY key, data_size LIMIT 50""".stripMargin, O.objects),

    "q_list_buckets" -> O.withCtes(
      """SELECT * FROM buckets
        |WHERE volume = 'vol1' AND bucket > 'bucket2'
        |ORDER BY bucket LIMIT 6""".stripMargin, O.objects, O.buckets),

    "q_list_volumes" -> O.withCtes(
      "SELECT * FROM volumes ORDER BY volume",
      O.objects, O.buckets, O.volumes),

    "q_filesize_histogram" -> O.withCtes(
      """SELECT volume, bucket,
        |  GREATEST((CAST(1 AS BIGINT) << CAST(ceil(log2(GREATEST(data_size, 1))) AS INT)), 1024) AS size_bin,
        |  count(*) AS file_count
        |FROM objects
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin, O.objects),

    "q_container_histogram" -> O.withCtes(
      """SELECT
        |  GREATEST((CAST(1 AS BIGINT) << CAST(ceil(log2(GREATEST(used_bytes, 1))) AS INT)), 1048576) AS size_bin,
        |  count(*) AS container_count
        |FROM containers_scm
        |GROUP BY 1 ORDER BY 1""".stripMargin, O.containersScm),

    "q_ns_summary" -> O.withCtes(
      """SELECT volume, bucket, dir,
        |  count(*) AS num_files,
        |  CAST(sum(data_size) AS BIGINT) AS size_of_files,
        |  CAST(sum(replicated_size) AS BIGINT) AS replicated_size
        |FROM (
        |  SELECT volume, bucket, data_size, replicated_size,
        |    array_to_string(list_slice(string_split(key, '/'), 1, d.d), '/') AS dir,
        |    len(string_split(key, '/')) AS np, d.d
        |  FROM objects CROSS JOIN (VALUES (1), (2), (3)) d(d))
        |WHERE np > d
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin, O.objects),

    "q_du_topn" -> O.withCtes(
      """SELECT bucket,
        |  array_to_string(list_slice(string_split(key, '/'), 1, 2), '/') AS dir,
        |  CAST(sum(data_size) AS BIGINT) AS dir_size,
        |  count(*) AS num_files
        |FROM objects WHERE volume = 'vol0'
        |GROUP BY 1, 2 ORDER BY dir_size DESC, bucket, dir LIMIT 10""".stripMargin,
      O.objects),

    "q_global_counts" -> O.withCtes(
      """SELECT * FROM (
        |  SELECT 'keys' AS entity, count(*) AS cnt,
        |    CAST(coalesce(sum(data_size), 0) AS BIGINT) AS total_bytes FROM objects
        |  UNION ALL
        |  SELECT 'buckets', count(*), CAST(coalesce(sum(used_bytes), 0) AS BIGINT) FROM buckets
        |  UNION ALL
        |  SELECT 'volumes', count(*), CAST(coalesce(sum(used_bytes), 0) AS BIGINT) FROM volumes
        |  UNION ALL
        |  SELECT 'open_keys', count(*), CAST(coalesce(sum(data_size), 0) AS BIGINT) FROM open_keys
        |  UNION ALL
        |  SELECT 'containers', count(*), CAST(coalesce(sum(used_bytes), 0) AS BIGINT) FROM containers_scm
        |) ORDER BY entity""".stripMargin,
      O.objects, O.buckets, O.volumes, O.openKeys, O.containersScm),

    "q_quota_usage" -> O.withCtes(
      """SELECT volume, bucket, used_bytes, quota_bytes, used_namespace,
        |  (quota_bytes <> -1 AND used_bytes > quota_bytes) AS over_quota,
        |  CASE WHEN quota_bytes > 0 THEN used_bytes * 10000 // quota_bytes
        |       ELSE -1 END AS usage_pct_x100
        |FROM buckets ORDER BY volume, bucket""".stripMargin,
      O.objects, O.buckets),

    "q_heatmap" -> O.withCtes(
      """SELECT volume, bucket, prefix, access_count,
        |  CASE WHEN max_c > min_c
        |    THEN (access_count - min_c) * 10000 // (max_c - min_c)
        |    ELSE 0 END AS heat_x10000
        |FROM (
        |  SELECT volume, bucket,
        |    array_to_string(list_slice(string_split(key, '/'), 1, 2), '/') AS prefix,
        |    count(*) AS access_count
        |  FROM audit_access WHERE op = 'READ_KEY' GROUP BY 1, 2, 3)
        |CROSS JOIN (
        |  SELECT min(access_count) AS min_c, max(access_count) AS max_c
        |  FROM (SELECT count(*) AS access_count FROM audit_access
        |        WHERE op = 'READ_KEY'
        |        GROUP BY volume, bucket,
        |          array_to_string(list_slice(string_split(key, '/'), 1, 2), '/')))
        |ORDER BY volume, bucket, prefix""".stripMargin, O.auditAccess),

    "q_container_key_join" -> O.withCtes(
      """SELECT t.container_id, t.num_keys, t.total_size, c.state
        |FROM (
        |  SELECT container_id, count(*) AS num_keys,
        |    CAST(sum(data_size) AS BIGINT) AS total_size
        |  FROM objects GROUP BY 1) t
        |JOIN containers_scm c USING (container_id)
        |ORDER BY container_id""".stripMargin, O.objects, O.containersScm),

    "q_om_scm_mismatch" -> O.withCtes(
      """SELECT container_id, 'OM_ONLY' AS side FROM containers_om
        |WHERE container_id NOT IN
        |  (SELECT container_id FROM containers_scm WHERE state <> 'DELETED')
        |UNION ALL
        |SELECT container_id, 'SCM_ONLY' FROM containers_scm
        |WHERE state <> 'DELETED' AND container_id NOT IN
        |  (SELECT container_id FROM containers_om)
        |ORDER BY side, container_id""".stripMargin,
      O.objects, O.containersScm, O.containersOm),

    "q_replica_health" -> O.withCtes(
      """SELECT c.container_id, c.replication_factor,
        |  coalesce(t.replica_count, 0) AS replica_count,
        |  coalesce(t.healthy_count, 0) AS healthy_count,
        |  CASE WHEN coalesce(t.healthy_count, 0) = 0 THEN 'MISSING'
        |       WHEN coalesce(t.healthy_count, 0) < c.replication_factor THEN 'UNDER_REPLICATED'
        |       WHEN coalesce(t.replica_count, 0) > c.replication_factor THEN 'OVER_REPLICATED'
        |       ELSE 'HEALTHY' END AS health
        |FROM containers_scm c
        |LEFT JOIN (
        |  SELECT container_id, count(*) AS replica_count,
        |    CAST(sum(CASE WHEN replica_state = 'CLOSED' THEN 1 ELSE 0 END) AS BIGINT) AS healthy_count
        |  FROM replicas GROUP BY 1) t USING (container_id)
        |WHERE c.state <> 'DELETED'
        |ORDER BY container_id""".stripMargin, O.containersScm, O.replicas),

    "q_snapshot_diff" -> O.withCtes(
      """SELECT coalesce(a.object_id, b.object_id) AS object_id,
        |  coalesce(a.old_key, '') AS old_key,
        |  coalesce(a.old_size, -1) AS old_size,
        |  coalesce(b.new_key, '') AS new_key,
        |  coalesce(b.new_size, -1) AS new_size,
        |  CASE WHEN a.old_key IS NULL THEN 'CREATE'
        |       WHEN b.new_key IS NULL THEN 'DELETE'
        |       WHEN a.old_key <> b.new_key THEN 'RENAME'
        |       WHEN a.old_size <> b.new_size THEN 'MODIFY'
        |       ELSE 'UNCHANGED' END AS diff_type
        |FROM (SELECT object_id, key AS old_key, data_size AS old_size FROM snap_v1) a
        |FULL OUTER JOIN (SELECT object_id, key AS new_key, data_size AS new_size FROM snap_v2) b
        |  ON a.object_id = b.object_id
        |WHERE NOT (a.old_key IS NOT NULL AND b.new_key IS NOT NULL
        |  AND a.old_key = b.new_key AND a.old_size = b.new_size)
        |ORDER BY object_id""".stripMargin,
      O.objects, O.snapshotV1, O.snapshotV2),

    "q_snapshot_diff_summary" -> O.withCtes(
      """SELECT CASE WHEN a.old_key IS NULL THEN 'CREATE'
        |       WHEN b.new_key IS NULL THEN 'DELETE'
        |       WHEN a.old_key <> b.new_key THEN 'RENAME'
        |       WHEN a.old_size <> b.new_size THEN 'MODIFY'
        |       ELSE 'UNCHANGED' END AS diff_type,
        |  count(*) AS cnt
        |FROM (SELECT object_id, key AS old_key, data_size AS old_size FROM snap_v1) a
        |FULL OUTER JOIN (SELECT object_id, key AS new_key, data_size AS new_size FROM snap_v2) b
        |  ON a.object_id = b.object_id
        |WHERE NOT (a.old_key IS NOT NULL AND b.new_key IS NOT NULL
        |  AND a.old_key = b.new_key AND a.old_size = b.new_size)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
      O.objects, O.snapshotV1, O.snapshotV2),

    "q_layout_union" -> O.withCtes(
      """SELECT b.layout, count(*) AS num_keys,
        |  CAST(sum(o.data_size) AS BIGINT) AS total_size
        |FROM objects o JOIN buckets b USING (volume, bucket)
        |GROUP BY 1 ORDER BY 1""".stripMargin, O.objects, O.buckets),

    "q_lifecycle_expiry" -> O.withCtes(
      """SELECT volume, bucket, key, rule_id, data_size, modification_time
        |FROM (
        |  SELECT *,
        |    CASE WHEN key LIKE 'warehouse/R/%' AND modification_time < 883612800000
        |              AND tag_flag = 'R' THEN 'r1'
        |         WHEN key LIKE 'warehouse/A/%' AND modification_time < 852076800000
        |              THEN 'r2' END AS rule_id
        |  FROM objects)
        |WHERE rule_id IS NOT NULL
        |ORDER BY volume, bucket, key, data_size, modification_time""".stripMargin, O.objects),

    "q_open_key_expiry" -> O.withCtes(
      """SELECT volume, bucket, count(*) AS expired_count,
        |  CAST(sum(data_size) AS BIGINT) AS expired_bytes
        |FROM open_keys WHERE creation_time < 896659200000
        |GROUP BY 1, 2 ORDER BY volume, bucket""".stripMargin,
      O.objects, O.openKeys),

    "q_multipart_validate" -> O.withCtes(
      """SELECT upload_id, order_key, count(*) AS num_parts,
        |  min(part_number) AS min_part, max(part_number) AS max_part,
        |  CAST(sum(size) AS BIGINT) AS total_size,
        |  (min(part_number) = 1 AND max(part_number) = count(*)
        |   AND count(DISTINCT part_number) = count(*)) AS is_valid
        |FROM multipart_parts GROUP BY 1, 2 ORDER BY upload_id""".stripMargin,
      O.multipartParts),

    "q_multipart_etag" -> O.withCtes(
      """SELECT upload_id,
        |  md5(string_agg(etag, '' ORDER BY part_number)) || '-' || count(*) AS etag_of_etags
        |FROM multipart_parts GROUP BY 1 ORDER BY upload_id""".stripMargin,
      O.multipartParts),

    "q_latest_version" -> O.withCtes(
      """SELECT volume, bucket, lv_key, key, version, data_size FROM (
        |  SELECT volume, bucket,
        |    array_to_string(list_slice(string_split(key, '/'), 1, 3), '/') AS lv_key,
        |    key, version, data_size,
        |    row_number() OVER (
        |      PARTITION BY volume, bucket,
        |        array_to_string(list_slice(string_split(key, '/'), 1, 3), '/')
        |      ORDER BY version DESC, key, data_size DESC) AS rn
        |  FROM objects)
        |WHERE rn = 1 ORDER BY volume, bucket, lv_key""".stripMargin, O.objects),

    "q_range_read" -> O.withCtes(
      """SELECT key, data_size, eff_start, eff_end,
        |  eff_start // 4194304 AS first_chunk,
        |  eff_end // 4194304 AS last_chunk,
        |  'bytes ' || eff_start || '-' || eff_end || '/' || data_size AS content_range
        |FROM (
        |  SELECT key, data_size, CAST(1000 AS BIGINT) AS eff_start,
        |    least(CAST(50000 AS BIGINT), data_size - 1) AS eff_end
        |  FROM objects WHERE data_size > 1000)
        |ORDER BY key, data_size""".stripMargin, O.objects),

    "q_checksums" -> O.withCtes(
      """SELECT key, etag, sha256(key) AS sha256_hex,
        |  (md5(key) = etag) AS etag_ok
        |FROM objects ORDER BY key""".stripMargin, O.objects))
}
