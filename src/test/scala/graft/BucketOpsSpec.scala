package graft

import graft.operators.BucketOps
import graft.core.{Tables => T}

/** CreateBucket decision ladder: the declared fixture end-to-end plus the
  * branches it can't reach (TOO_MANY_BUCKETS) on a micro catalog. */
class BucketOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("bucketCreateDecisions: every branch of the declared fixture") {
    val got = BucketOps.bucketCreateDecisions(
      T.bucketCreateRequests(spark, sf), T.volumesNs(spark, sf),
      T.buckets(spark, sf))
      .as[(Long, String, String, String)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(got === Map(
      1L -> "CREATED",                // fresh name, quota fits
      2L -> "BUCKET_ALREADY_EXISTS",  // in-batch twin of 1
      3L -> "BUCKET_ALREADY_EXISTS",  // catalog collision
      4L -> "VOLUME_NOT_FOUND",
      5L -> "INVALID_LINK_ARGS",      // source volume without source bucket
      6L -> "LINK_WITH_ENCRYPTION",
      7L -> "CREATED",                // link: byte-quota checks skipped
      8L -> "QUOTA_ERROR",            // volume quota set, bucket quota unset
      9L -> "QUOTA_EXCEEDED_BYTES",   // 3.901e9 existing + 999e9 > 1e12
      10L -> "CREATED",               // 3.901e9 + 990e9 < 1e12 near-miss
      11L -> "CREATED",               // vol3 ns budget admits 2 more: rank 1
      12L -> "CREATED",               // rank 2
      13L -> "QUOTA_EXCEEDED_NS",     // rank 3 over budget
      14L -> "VOLUME_NOT_FOUND",      // volume check beats name collision
      15L -> "INVALID_LINK_ARGS",     // link args beat unknown volume
      16L -> "INVALID_BUCKET_NAME",   // uppercase
      17L -> "INVALID_BUCKET_NAME",   // too short
      18L -> "INVALID_BUCKET_NAME",   // contiguous periods
      19L -> "INVALID_BUCKET_NAME",   // IPv4
      20L -> "INVALID_BUCKET_NAME"))  // leading dash, beats unknown volume
  }

  test("bucket-table cap fires before link and volume checks") {
    val reqs = Seq(
      (1L, "v1", "okname", false, false, false, 10L),
      (2L, "v9", "okname2", true, false, false, 10L))
      .toDF("req_id", "volume", "bucket", "has_source_volume",
        "has_source_bucket", "has_encryption", "quota_bytes")
    val vols = Seq(("v1", 1L, -1L, -1L))
      .toDF("volume", "bucket_count", "quota_bytes", "quota_namespace")
    val bkts = Seq(("v1", "old-bucket", -1L))
      .toDF("volume", "bucket", "quota_bytes")
    val got = BucketOps.bucketCreateDecisions(reqs, vols, bkts,
      maxBuckets = 1L)
      .as[(Long, String, String, String)].collect().map(r => r._1 -> r._4)
    // the cap is checked before link args and before the volume lookup
    assert(got.toSeq === Seq(1L -> "TOO_MANY_BUCKETS",
      2L -> "TOO_MANY_BUCKETS"))
  }

  test("volumeCreateDecisions: names, collisions, sequential owner cap") {
    val got = BucketOps.volumeCreateDecisions(
      T.volumeCreateRequests(spark, sf), T.volumes(spark, sf),
      maxUserVolumes = 2L)
      .as[(Long, String, String, String)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(got === Map(
      1L -> "CREATED",
      2L -> "VOLUME_ALREADY_EXISTS",  // in-batch twin of 1
      3L -> "VOLUME_ALREADY_EXISTS",  // catalog
      4L -> "INVALID_VOLUME_NAME",    // uppercase
      5L -> "CREATED",                // underscore legal for volumes
      6L -> "USER_TOO_MANY_VOLUMES",  // admin1: 1 owned + 1 admitted >= 2
      7L -> "INVALID_VOLUME_NAME",    // too short
      8L -> "INVALID_VOLUME_NAME",    // IPv4
      9L -> "CREATED",                // unknown owner starts at 0
      10L -> "CREATED",
      11L -> "USER_TOO_MANY_VOLUMES"))
  }

  test("setBucketQuotaDecisions: every branch live; own quota excluded") {
    val got = BucketOps.setBucketQuotaDecisions(
      T.setQuotaRequests(spark, sf), T.volumes(spark, sf),
      T.buckets(spark, sf), T.bucketLinks(spark, sf))
      .as[(String, String, Long, Long, String)].collect()
    val byDecision = got.groupBy(_._5).view.mapValues(_.length).toMap
    assert(byDecision.keySet === Set("UPDATED", "QUOTA_ERROR_CLEAR",
      "QUOTA_ERROR_BELOW_USAGE", "QUOTA_EXCEEDED",
      "QUOTA_ERROR_NS_BELOW_USAGE", "CANNOT_SET_ON_LINK",
      "BUCKET_NOT_FOUND"))
    assert(got.count(r => r._2 == "link-a") === 1)
    // own-quota exclusion: raising ONE bucket to just under the volume
    // budget minus the others' sum must pass, even above its own quota
    val vols = Seq(("v1", 100L)).toDF("volume", "quota_bytes")
    val bkts = Seq(("v1", "b1", 10L, 1L, 30L), ("v1", "b2", 10L, 1L, 50L))
      .toDF("volume", "bucket", "used_bytes", "used_namespace",
        "quota_bytes")
    val links = Seq.empty[(String, String, String, String)]
      .toDF("volume", "bucket", "source_volume", "source_bucket")
    // b1: 50 (others) + 49 = 99 <= 100 → UPDATED; 51 would blow it
    val reqs = Seq(("v1", "b1", 49L, -2L), ("v1", "b1", 51L, -2L))
      .toDF("volume", "bucket", "new_quota_bytes", "new_quota_ns")
    val micro = BucketOps.setBucketQuotaDecisions(reqs, vols, bkts, links)
      .as[(String, String, Long, Long, String)].collect()
      .map(r => r._3 -> r._5).toMap
    assert(micro(49L) === "UPDATED")
    assert(micro(51L) === "QUOTA_EXCEEDED")
  }

  test("unlimited volume byte quota (-1) admits quota-less buckets") {
    val reqs = Seq((1L, "v1", "fresh-b", false, false, false, 0L))
      .toDF("req_id", "volume", "bucket", "has_source_volume",
        "has_source_bucket", "has_encryption", "quota_bytes")
    val vols = Seq(("v1", 0L, -1L, -1L))
      .toDF("volume", "bucket_count", "quota_bytes", "quota_namespace")
    val bkts = Seq.empty[(String, String, Long)]
      .toDF("volume", "bucket", "quota_bytes")
    val got = BucketOps.bucketCreateDecisions(reqs, vols, bkts)
      .as[(Long, String, String, String)].collect()
    assert(got.head._4 === "CREATED")
  }

  test("quotaRepair: replicated-byte recount, FSO-only dir namespace") {
    import graft.core.{Tables => T}
    val got = BucketOps.quotaRepair(T.objects(spark, sf),
      T.buckets(spark, sf))
      .as[(String, String, Long, Long, Long, Long, Long, Long, Boolean)]
      .collect()
    assert(got.nonEmpty)
    for (r <- got) {
      // diff columns are exact deltas; changed ⇔ any delta
      assert(r._5 === r._4 - r._3, r)
      assert(r._8 === r._7 - r._6, r)
      assert(r._9 === (r._5 != 0L || r._8 != 0L), r)
      val idx = r._2.stripPrefix("bucket").toLong
      if (idx % 2 == 0)
        // OBS: no directoryTable — namespace recount equals the key count,
        // which the stored catalog already has right
        assert(r._8 === 0L, r)
      else
        // FSO: derived dirs join the namespace recount
        assert(r._8 > 0L, r)
      // replication drift: stored raw bytes < replicated recount whenever
      // the bucket holds any RATIS/THREE or EC key (all buckets do)
      assert(r._5 > 0L, r)
    }
  }
}
