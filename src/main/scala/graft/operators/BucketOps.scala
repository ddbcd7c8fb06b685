package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * OM bucket-admin write requests as decision tables — the CreateBucket
 * validation ladder in reference branch order
 * (`hadoop-ozone/ozone-manager/.../request/bucket/OMBucketCreateRequest.java`):
 *
 *   1. strict-S3 bucket-name validation (preExecute,
 *      OMBucketCreateRequest.java:102 → HddsClientUtils.java:74-156,180-199:
 *      charset/uppercase/`..`/`-.`/`.-`, not-IPv4/all-numeric, 3-63 length,
 *      no leading/trailing `.`/`-`) → INVALID_BUCKET_NAME
 *   2. bucket-table cap (OMBucketCreateRequest.java:120,168-184
 *      validateMaxBucket) → TOO_MANY_BUCKETS
 *   3. link args must come in pairs (OMBucketCreateRequest.java:145-149)
 *      → INVALID_LINK_ARGS
 *   4. links cannot carry encryption (OMBucketCreateRequest.java:151-154)
 *      → LINK_WITH_ENCRYPTION
 *   5. volume lookup (OMBucketCreateRequest.java:242-245) → VOLUME_NOT_FOUND
 *   6. name collision against the bucket table AND earlier creates in the
 *      same batch — the reference sees in-batch creates through the table
 *      cache (OMBucketCreateRequest.java:248-251 isExist over addCacheEntry
 *      state) → BUCKET_ALREADY_EXISTS
 *   7. byte-quota admission, skipped for links
 *      (OMBucketCreateRequest.java:254-257,375-412 checkQuotaBytesValid):
 *      volume quota set but bucket quota unset → QUOTA_ERROR; existing
 *      bucket quota sum + requested > volume quota → QUOTA_EXCEEDED_BYTES
 *   8. namespace-quota admission (OMBucketCreateRequest.java:269,355-372
 *      checkQuotaInNamespace, volume usedNamespace counts buckets):
 *      in-batch creates consume namespace sequentially, so per volume the
 *      first (quota − used) admitted requests fit → QUOTA_EXCEEDED_NS
 *   9. CREATED
 *
 * Modeled against the catalog snapshot: byte-quota sums use the existing
 * bucket table only (the reference also accumulates quotas of buckets
 * created earlier in the batch — that needs an ordered fold; a what-if
 * planner evaluates against the snapshot). In-batch name collisions and
 * namespace consumption ARE sequential, computed with per-group windows.
 *
 * Scale shape: every catalog side is a rollup (volume probe, per-volume
 * quota sums, one global count) broadcast into the protocol-sized request
 * batch; the bucket-exists probe joins on (volume, bucket) against the
 * bucket table's keys only. The windows partition by (volume, bucket) /
 * volume over request-sized data. Nothing corpus-sized shuffles.
 */
object BucketOps {

  /** Strict-S3 resource-name validity (HddsClientUtils.verifyResourceName
    * with isStrictS3) as one boolean column — shared with the snapshot
    * ladder (validateSnapshotName routes through the same strict rules). */
  /** OmUtils.validateVolumeName at strict=false — POSIX names, underscore
    * legal (shared by CreateVolume and CreateTenant). */
  private[operators] def volumeNameValid(c: org.apache.spark.sql.Column) =
    length(c).between(3, 63) &&
      c.rlike("^[a-z0-9._-]+$") &&
      !c.contains("..") && !c.contains("-.") && !c.contains(".-") &&
      !c.rlike("^[0-9.]+$") &&
      !c.rlike("^[.-]") && !c.rlike("[.-]$")

  private[operators] def nameValid(c: org.apache.spark.sql.Column) =
    length(c).between(3, 63) &&
      c.rlike("^[a-z0-9.-]+$") &&
      !c.contains("..") && !c.contains("-.") && !c.contains(".-") &&
      !c.rlike("^[0-9.]+$") &&
      !c.rlike("^[.-]") && !c.rlike("[.-]$")

  def bucketCreateDecisions(requests: DataFrame, volumes: DataFrame,
                            buckets: DataFrame,
                            maxBuckets: Long = 1000000L): DataFrame = {
    val totalBuckets = buckets.agg(count(lit(1)).as("total_buckets"))
    val volProbe = volumes.select(col("volume"), lit(true).as("vol_exists"),
      col("quota_bytes").as("vol_quota_bytes"), col("bucket_count"),
      col("quota_namespace"))
    val bktProbe = buckets.select(col("volume"), col("bucket"),
      lit(true).as("bkt_exists"))
    val qsum = buckets.groupBy("volume")
      .agg(sum(when(col("quota_bytes") > -1L, col("quota_bytes"))
        .otherwise(0L)).as("bucket_quota_sum"))

    val upToBatch = Window.partitionBy("volume", "bucket")
      .orderBy("req_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val upToVolume = Window.partitionBy("volume").orderBy("req_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    requests
      .crossJoin(broadcast(totalBuckets))
      .join(broadcast(volProbe), Seq("volume"), "left")
      .join(broadcast(bktProbe), Seq("volume", "bucket"), "left")
      .join(broadcast(qsum), Seq("volume"), "left")
      .withColumn("early",
        when(!nameValid(col("bucket")), lit("INVALID_BUCKET_NAME"))
          .when(col("total_buckets") >= maxBuckets, lit("TOO_MANY_BUCKETS"))
          .when(col("has_source_bucket") =!= col("has_source_volume"),
            lit("INVALID_LINK_ARGS"))
          .when(col("has_source_bucket") && col("has_encryption"),
            lit("LINK_WITH_ENCRYPTION"))
          .when(col("vol_exists").isNull, lit("VOLUME_NOT_FOUND"))
          .when(coalesce(col("bkt_exists"), lit(false)),
            lit("BUCKET_ALREADY_EXISTS")))
      // earliest surviving request per (volume, bucket) owns the name
      .withColumn("name_rank",
        sum(when(col("early").isNull, 1L).otherwise(0L)).over(upToBatch))
      .withColumn("e2", coalesce(col("early"),
        when(col("early").isNull && col("name_rank") > 1,
          lit("BUCKET_ALREADY_EXISTS"))))
      .withColumn("e3", coalesce(col("e2"),
        when(!col("has_source_bucket") && col("vol_quota_bytes") > 0 &&
          col("quota_bytes") <= 0, lit("QUOTA_ERROR"))
          .when(!col("has_source_bucket") && col("quota_bytes") > 0 &&
            col("vol_quota_bytes") =!= -1L &&
            coalesce(col("bucket_quota_sum"), lit(0L)) + col("quota_bytes") >
              col("vol_quota_bytes"),
            lit("QUOTA_EXCEEDED_BYTES"))))
      // survivors consume volume namespace in req_id order
      .withColumn("ns_rank",
        sum(when(col("e3").isNull, 1L).otherwise(0L)).over(upToVolume))
      .withColumn("decision", coalesce(col("e3"),
        when(col("quota_namespace") > 0 &&
          col("bucket_count") + col("ns_rank") > col("quota_namespace"),
          lit("QUOTA_EXCEEDED_NS")),
        lit("CREATED")))
      .select("req_id", "volume", "bucket", "decision")
      .orderBy("req_id")
  }

  /**
   * CreateVolume validation ladder (OMVolumeCreateRequest + the owner-list
   * cap in OMVolumeRequest.addVolumeToOwnerList,
   * OMVolumeRequest.java:88-96): volume-name rules (verifyResourceName
   * with isStrictS3=false — underscores legal, 3-63 length still applies
   * to volumes) → name collision against the volume table AND earlier
   * creates in the batch → per-owner volume cap, where in-batch creates
   * count toward the owner's list sequentially (the reference sees them
   * through the user-table cache) → CREATED.
   *
   * Scale shape mirrors [[bucketCreateDecisions]]: catalog rollups
   * broadcast into the protocol-sized batch; windows partition by volume /
   * owner over request-sized data.
   */
  /**
   * SetVolumeQuota ladder (OMVolumeSetQuotaRequest.checkQuotaBytesValid /
   * checkQuotaNamespaceValid:195-262):
   *   - volume lookup → VOLUME_NOT_FOUND
   *   - byte quota: values < -1 or == 0 are silently IGNORED (the checker
   *     returns false and the field is skipped, not an error); -1 RESETs;
   *     otherwise any non-link bucket without its own quota →
   *     ERROR_UNSET_BUCKETS (QUOTA_ERROR), a quota below the bucket-quota
   *     sum → ERROR_LT_BUCKET_SUM (QUOTA_EXCEEDED), else SET
   *   - namespace quota: same ignore/reset handling; a quota below the
   *     existing bucket count → ERROR_LT_BUCKET_COUNT (QUOTA_EXCEEDED)
   *   - decision = VOLUME_NOT_FOUND, else the first thrown error (bytes
   *     are validated before namespace), else APPLIED.
   */
  def volumeSetQuotaDecisions(requests: DataFrame,
                              probe: DataFrame): DataFrame = {
    val p = probe.withColumn("vol_exists", lit(true))
    requests
      .join(broadcast(p), Seq("volume"), "left")
      .withColumn("bytes_outcome",
        when(col("new_quota_bytes") === -2L, lit("ABSENT"))
          .when(col("new_quota_bytes") === -1L, lit("RESET"))
          .when(col("new_quota_bytes") < -1L ||
            col("new_quota_bytes") === 0L, lit("IGNORED"))
          .when(col("has_unset_bucket"), lit("ERROR_UNSET_BUCKETS"))
          .when(col("new_quota_bytes") < col("bucket_quota_sum"),
            lit("ERROR_LT_BUCKET_SUM"))
          .otherwise(lit("SET")))
      .withColumn("ns_outcome",
        when(col("new_quota_ns") === -2L, lit("ABSENT"))
          .when(col("new_quota_ns") === -1L, lit("RESET"))
          .when(col("new_quota_ns") < -1L || col("new_quota_ns") === 0L,
            lit("IGNORED"))
          .when(col("bucket_count") > col("new_quota_ns"),
            lit("ERROR_LT_BUCKET_COUNT"))
          .otherwise(lit("SET")))
      .select(col("req_id"), col("volume"),
        when(col("vol_exists").isNull, lit("VOLUME_NOT_FOUND"))
          .when(col("bytes_outcome").startsWith("ERROR"),
            col("bytes_outcome"))
          .when(col("ns_outcome").startsWith("ERROR"), col("ns_outcome"))
          .otherwise(lit("APPLIED")).as("decision"),
        when(col("vol_exists").isNull, lit("-"))
          .otherwise(col("bytes_outcome")).as("bytes_outcome"),
        when(col("vol_exists").isNull, lit("-"))
          .otherwise(col("ns_outcome")).as("ns_outcome"))
      .orderBy("req_id")
  }

  /**
   * SetVolumeOwner ladder (OMVolumeSetOwnerRequest.validateAndUpdateCache:
   * 130-175): volume lookup → VOLUME_NOT_FOUND; newOwner == oldOwner →
   * OK_NOOP (:146-148, returns success WITHOUT a write); the transfer
   * adds the volume to the new owner's user-table list, which enforces
   * the per-owner volume cap (addVolumeToOwnerList — same cap as
   * CreateVolume) → TOO_MANY_VOLUMES; else OWNER_CHANGED.
   */
  def volumeSetOwnerDecisions(requests: DataFrame, volumes: DataFrame,
                              maxUserVolumes: Long = 1024L): DataFrame = {
    val volProbe = volumes.select(col("volume"),
      col("owner").as("cur_owner"), lit(true).as("vol_exists"))
    val ownerCounts = volumes.groupBy(col("owner").as("new_owner"))
      .agg(count(lit(1)).as("owned"))
    requests
      .join(broadcast(volProbe), Seq("volume"), "left")
      .join(broadcast(ownerCounts), Seq("new_owner"), "left")
      .select(col("req_id"), col("volume"), col("new_owner"),
        when(col("vol_exists").isNull, lit("VOLUME_NOT_FOUND"))
          .when(col("cur_owner") === col("new_owner"), lit("OK_NOOP"))
          .when(coalesce(col("owned"), lit(0L)) >= maxUserVolumes,
            lit("TOO_MANY_VOLUMES"))
          .otherwise(lit("OWNER_CHANGED")).as("decision"))
      .orderBy("req_id")
  }

  /**
   * DeleteVolume ladder (OMVolumeDeleteRequest.validateAndUpdateCache:
   * 105-145): volume lookup → VOLUME_NOT_FOUND; non-zero reference count
   * (tenant features pin the volume, :124-127 — checked BEFORE emptiness)
   * → VOLUME_IS_REFERENCED; buckets remain → VOLUME_NOT_EMPTY (:140);
   * else DELETED (volume also leaves its owner's user-table list).
   */
  def volumeDeleteDecisions(requests: DataFrame,
                            volumesRef: DataFrame): DataFrame =
    requests
      .join(broadcast(volumesRef.withColumn("vol_exists", lit(true))),
        Seq("volume"), "left")
      .select(col("req_id"), col("volume"),
        when(col("vol_exists").isNull, lit("VOLUME_NOT_FOUND"))
          .when(col("ref_count") =!= 0, lit("VOLUME_IS_REFERENCED"))
          .when(col("bucket_count") > 0, lit("VOLUME_NOT_EMPTY"))
          .otherwise(lit("DELETED")).as("decision"))
      .orderBy("req_id")

  /**
   * DeleteBucket ladder (OMBucketDeleteRequest.validateAndUpdateCache:
   * 115-165): bucket lookup (volume deliberately unchecked — a bucket
   * can't exist without one) → BUCKET_NOT_FOUND; keys remain →
   * BUCKET_NOT_EMPTY/KEYS (:135); incomplete MPUs → BUCKET_NOT_EMPTY/MPUS
   * (:143-146, same result code, different message); snapshots under the
   * bucket → CONTAINS_SNAPSHOT (:155); else DELETED. A LINK bucket's own
   * key space is empty, so links delete regardless of their source's
   * occupancy (isBucketEmpty walks the link's prefix).
   *
   * Scale shape: existence and snapshot probes are control-plane
   * catalogs; key/MPU occupancy are broadcast-semi-pruned rollups over
   * just the requested buckets.
   */
  def bucketDeleteDecisions(requests: DataFrame, catalog: DataFrame,
                            objects: DataFrame, mpuInfo: DataFrame,
                            snapshots: DataFrame): DataFrame = {
    val reqBuckets = requests.select("volume", "bucket").distinct()
    val exists = catalog.select("volume", "bucket").distinct()
      .withColumn("bkt_exists", lit(true))
    val hasKeys = objects
      .join(broadcast(reqBuckets), Seq("volume", "bucket"), "left_semi")
      .select("volume", "bucket").distinct()
      .withColumn("has_keys", lit(true))
    val hasMpus = mpuInfo
      .join(broadcast(reqBuckets), Seq("volume", "bucket"), "left_semi")
      .select("volume", "bucket").distinct()
      .withColumn("has_mpus", lit(true))
    val hasSnaps = snapshots.select("volume", "bucket").distinct()
      .withColumn("has_snaps", lit(true))
    requests
      .join(broadcast(exists), Seq("volume", "bucket"), "left")
      .join(broadcast(hasKeys), Seq("volume", "bucket"), "left")
      .join(broadcast(hasMpus), Seq("volume", "bucket"), "left")
      .join(broadcast(hasSnaps), Seq("volume", "bucket"), "left")
      .withColumn("decision",
        when(col("bkt_exists").isNull, lit("BUCKET_NOT_FOUND"))
          .when(col("has_keys").isNotNull, lit("BUCKET_NOT_EMPTY"))
          .when(col("has_mpus").isNotNull, lit("BUCKET_NOT_EMPTY"))
          .when(col("has_snaps").isNotNull, lit("CONTAINS_SNAPSHOT"))
          .otherwise(lit("DELETED")))
      .select(col("req_id"), col("volume"), col("bucket"), col("decision"),
        when(col("decision") === "BUCKET_NOT_EMPTY",
          when(col("has_keys").isNotNull, lit("KEYS"))
            .otherwise(lit("MPUS"))).otherwise(lit("")).as("reason"))
      .orderBy("req_id")
  }

  def volumeCreateDecisions(requests: DataFrame, volumes: DataFrame,
                            maxUserVolumes: Long = 1024L): DataFrame = {
    val volProbe = volumes.select(col("volume"),
      lit(true).as("vol_exists"))
    val ownerCounts = volumes.groupBy("owner")
      .agg(count(lit(1)).as("owned"))
    val volNameValid = BucketOps.volumeNameValid(col("volume"))
    val upToName = Window.partitionBy("volume").orderBy("req_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val upToOwner = Window.partitionBy("owner").orderBy("req_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    requests
      .join(broadcast(volProbe), Seq("volume"), "left")
      .join(broadcast(ownerCounts), Seq("owner"), "left")
      .withColumn("early",
        when(!volNameValid, lit("INVALID_VOLUME_NAME"))
          .when(coalesce(col("vol_exists"), lit(false)),
            lit("VOLUME_ALREADY_EXISTS")))
      .withColumn("name_rank",
        sum(when(col("early").isNull, 1L).otherwise(0L)).over(upToName))
      .withColumn("e2", coalesce(col("early"),
        when(col("name_rank") > 1, lit("VOLUME_ALREADY_EXISTS"))))
      .withColumn("owner_rank",
        sum(when(col("e2").isNull, 1L).otherwise(0L)).over(upToOwner))
      .withColumn("decision", coalesce(col("e2"),
        when(coalesce(col("owned"), lit(0L)) + col("owner_rank") - 1 >=
          maxUserVolumes, lit("USER_TOO_MANY_VOLUMES")),
        lit("CREATED")))
      .select("req_id", "volume", "owner", "decision")
      .orderBy("req_id")
  }

  /**
   * SetBucketProperty quota-update ladder (OMBucketSetPropertyRequest
   * .java:151-156 existence/link, checkQuotaBytesValid:280-331,
   * checkQuotaNamespaceValid:333-352, bytes before namespace). Decision
   * labels split the reference's overloaded QUOTA_ERROR by cause:
   * QUOTA_ERROR_CLEAR (clearing bucket quota while the volume quota is
   * set), QUOTA_ERROR_BELOW_USAGE / QUOTA_ERROR_NS_BELOW_USAGE (requested
   * quota under current usage), QUOTA_EXCEEDED (other buckets' quotas +
   * requested > volume quota — own current quota excluded from the sum,
   * OMBucketSetPropertyRequest.java:313-321), CANNOT_SET_ON_LINK,
   * BUCKET_NOT_FOUND, UPDATED. `-2` marks an absent quota field (proto
   * has-bit); `-1` is the reference's QUOTA_RESET.
   *
   * Scale shape: every probe (bucket catalog, link table, volume args,
   * per-volume quota sums) is a control-plane rollup broadcast into the
   * request batch; one projection decides the batch.
   */
  def setBucketQuotaDecisions(requests: DataFrame, volumes: DataFrame,
                              buckets: DataFrame,
                              links: DataFrame): DataFrame = {
    val bktProbe = buckets.select(col("volume"), col("bucket"),
      lit(true).as("bkt_exists"), col("used_bytes"), col("used_namespace"),
      col("quota_bytes").as("cur_quota"))
    val linkProbe = links.select(col("volume"), col("bucket"),
      lit(true).as("is_link"))
    val volProbe = volumes.select(col("volume"),
      col("quota_bytes").as("vol_quota"))
    val qsum = buckets.groupBy("volume")
      .agg(sum(when(col("quota_bytes") > -1L, col("quota_bytes"))
        .otherwise(0L)).as("all_quota_sum"))
    requests
      .join(broadcast(bktProbe), Seq("volume", "bucket"), "left")
      .join(broadcast(linkProbe), Seq("volume", "bucket"), "left")
      .join(broadcast(volProbe), Seq("volume"), "left")
      .join(broadcast(qsum), Seq("volume"), "left")
      .withColumn("others_quota_sum",
        coalesce(col("all_quota_sum"), lit(0L)) -
          when(col("cur_quota") > -1L, col("cur_quota")).otherwise(0L))
      .withColumn("decision",
        when(coalesce(col("bkt_exists"), lit(false)) === false &&
          coalesce(col("is_link"), lit(false)) === false,
          lit("BUCKET_NOT_FOUND"))
          .when(coalesce(col("is_link"), lit(false)),
            lit("CANNOT_SET_ON_LINK"))
          .when(col("new_quota_bytes") === -1L && col("vol_quota") =!= -1L,
            lit("QUOTA_ERROR_CLEAR"))
          .when(col("new_quota_bytes") > 0L &&
            col("new_quota_bytes") < col("used_bytes"),
            lit("QUOTA_ERROR_BELOW_USAGE"))
          .when(col("new_quota_bytes") > 0L &&
            col("new_quota_bytes") >= col("cur_quota") &&
            col("vol_quota") =!= -1L &&
            col("others_quota_sum") + col("new_quota_bytes") >
              col("vol_quota"),
            lit("QUOTA_EXCEEDED"))
          .when(col("new_quota_ns") > 0L &&
            col("new_quota_ns") < col("used_namespace"),
            lit("QUOTA_ERROR_NS_BELOW_USAGE"))
          .otherwise(lit("UPDATED")))
      .select("volume", "bucket", "new_quota_bytes", "new_quota_ns",
        "decision")
      .orderBy("volume", "bucket", "new_quota_bytes", "new_quota_ns")
  }

  /**
   * SetBucketOwner ladder (OMBucketSetOwnerRequest.java:125-150): bucket
   * lookup → BUCKET_NOT_FOUND (:130); new owner equal to the stored
   * owner → an OK response with success=false and NO update (:137-150,
   * the reference's explicit no-op — modeled UNCHANGED); else SET.
   * Bucket owner approximated by the volume owner (no separate bucket
   * owner in this catalog — same convention as snapshotCreateDecisions).
   */
  def bucketSetOwnerDecisions(requests: DataFrame, buckets: DataFrame,
                              volumes: DataFrame): DataFrame = {
    val bktProbe = buckets.select("volume", "bucket").distinct()
      .withColumn("__bkt_exists", lit(true))
    val ownerProbe = volumes.select(col("volume"),
      col("owner").as("cur_owner"))
    requests
      .join(broadcast(bktProbe), Seq("volume", "bucket"), "left")
      .join(broadcast(ownerProbe), Seq("volume"), "left")
      .select(col("req_id"), col("volume"), col("bucket"),
        col("new_owner"),
        when(col("__bkt_exists").isNull, lit("BUCKET_NOT_FOUND"))
          .when(col("new_owner") === col("cur_owner"), lit("UNCHANGED"))
          .otherwise(lit("SET")).as("decision"))
      .orderBy("req_id")
  }

  /**
   * QuotaRepair recount (OMQuotaRepairRequest + QuotaRepairTask.java:
   * repairCount:322-383 walks keyTable/fileTable/directoryTable and
   * recomputes per-bucket usage from scratch; extractCount:639-655 adds 1
   * to usedNamespace per entry and getReplicatedSize() to usedBytes for
   * key/file entries — directories count namespace only; repairActiveDb
   * :155-196 then emits ONLY the buckets whose recount differs as
   * (diffUsedBytes, diffUsedNamespace) deltas).
   *
   * Here: the stored catalog tracks raw data_size (the drift under
   * repair), the recount sums replicated_size; FSO buckets add their
   * derived directory set to the namespace recount (OBS buckets have no
   * directoryTable). Emits every bucket with old/new/diff and the changed
   * flag — the repair request body is the changed=true slice.
   *
   * Scale shape: two namespace-wide aggregations (bytes+keys in one pass;
   * the FSO dir recount dedups ancestor paths exactly like nsSummary) and
   * a broadcast catalog join — the same shape the reference spreads over
   * its executor pool, minus the driver-side BlockingQueue.
   */
  def quotaRepair(objects: DataFrame, buckets: DataFrame): DataFrame = {
    val keyCounts = objects.groupBy("volume", "bucket")
      .agg(count(lit(1)).as("key_ns"),
        sum("replicated_size").as("actual_bytes"))
    val dirCounts = objects
      .withColumn("pdir", Aggregates.parentDirOf("key"))
      .filter(col("pdir") =!= "")
      .select(col("volume"), col("bucket"),
        explode(Aggregates.dirAndAncestors("pdir")).as("path"))
      .distinct()
      .groupBy("volume", "bucket").agg(count(lit(1)).as("dir_ns"))
    buckets.select("volume", "bucket", "layout", "used_bytes",
        "used_namespace")
      .join(keyCounts, Seq("volume", "bucket"), "left")
      .join(dirCounts, Seq("volume", "bucket"), "left")
      .withColumn("actual_bytes", coalesce(col("actual_bytes"), lit(0L)))
      .withColumn("actual_ns",
        coalesce(col("key_ns"), lit(0L)) +
          when(col("layout") === "FSO", coalesce(col("dir_ns"), lit(0L)))
            .otherwise(lit(0L)))
      .select(col("volume"), col("bucket"),
        col("used_bytes").as("stored_bytes"), col("actual_bytes"),
        (col("actual_bytes") - col("used_bytes")).as("diff_bytes"),
        col("used_namespace").as("stored_ns"), col("actual_ns"),
        (col("actual_ns") - col("used_namespace")).as("diff_ns"),
        (col("actual_bytes") =!= col("used_bytes") ||
          col("actual_ns") =!= col("used_namespace")).as("changed"))
      .orderBy("volume", "bucket")
  }
}
