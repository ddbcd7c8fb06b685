package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Tables => T}
import graft.operators._

/**
 * Read-RPC catalog facade — one entry point per reference read RPC
 * (apache/ozone OzoneManagerRequestHandler.java:199-399), each delegating
 * to the §2 operators so a caller of the reference API finds the same
 * surface here. Point lookups are range-pruned scans over the persisted
 * key-sorted namespace (Tables.objectsSorted) — O(page), not O(table).
 */
object Api {

  // -- volume/bucket info + listings ----------------------------------------
  def infoVolume(s: SparkSession, d: String, volume: String): DataFrame =
    T.volumes(s, d).filter(col("volume") === volume)

  def listVolumes(s: SparkSession, d: String): DataFrame =
    Listing.listVolumes(T.volumes(s, d))

  def infoBucket(s: SparkSession, d: String, volume: String, bucket: String): DataFrame =
    T.buckets(s, d).filter(col("volume") === volume && col("bucket") === bucket)

  def listBuckets(s: SparkSession, d: String, volume: String,
                  startBucket: String, maxBuckets: Int): DataFrame =
    Listing.listBuckets(T.buckets(s, d), volume, startBucket, maxBuckets)

  // -- key lookups + listings ----------------------------------------------
  def lookupKey(s: SparkSession, d: String, volume: String, bucket: String,
                key: String): DataFrame =
    T.objectsSorted(s, d).filter(col("volume") === volume &&
      col("bucket") === bucket && col("key") === key)

  /** GetKeyInfo: lookup + nested locations/tags/acls. */
  def getKeyInfo(s: SparkSession, d: String, volume: String, bucket: String,
                 key: String): DataFrame =
    T.objectsNested(s, d).filter(col("volume") === volume &&
      col("bucket") === bucket && col("key") === key)

  def listKeys(s: SparkSession, d: String, volume: String, bucket: String,
               prefix: String, startKey: String, maxKeys: Int): DataFrame =
    Listing.listKeys(T.objectsSorted(s, d), volume, bucket, prefix, startKey, maxKeys)

  def listStatus(s: SparkSession, d: String, volume: String, bucket: String,
                 dir: String): DataFrame =
    Listing.listStatus(T.objectsSorted(s, d), volume, bucket, dir)

  def listStatusFso(s: SparkSession, d: String, volume: String, bucket: String,
                    dir: String): DataFrame =
    Hierarchy.listStatusFso(T.directoriesFso(s, d), T.filesFso(s, d),
      volume, bucket, dir)

  def getFileStatus(s: SparkSession, d: String, volume: String, bucket: String,
                    key: String): DataFrame =
    lookupKey(s, d, volume, bucket, key)

  def getAcl(s: SparkSession, d: String, volume: String, bucket: String,
             key: String): DataFrame =
    T.objectsNested(s, d).filter(col("volume") === volume &&
      col("bucket") === bucket && col("key") === key)
      .select(col("key"), explode(col("acls")).as("acl"))
      .select("key", "acl.name", "acl.type", "acl.rights")

  // -- open keys / MPU ------------------------------------------------------
  def listOpenFiles(s: SparkSession, d: String): DataFrame =
    T.openKeys(s, d)

  def listMultipartUploadParts(s: SparkSession, d: String,
                               uploadId: String): DataFrame =
    T.multipartParts(s, d).filter(col("upload_id") === uploadId)
      .orderBy("part_number")

  def listExpiredMultipartUploads(s: SparkSession, d: String,
                                  beforeMs: Long): DataFrame =
    Lifecycle.mpuExpiry(T.multipartParts(s, d), beforeMs)

  // -- snapshots + change stream -------------------------------------------
  def listSnapshots(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    CommitLog.Snapshots.toDF("snapshot_name", "last_seq")
  }

  def snapshotDiff(s: SparkSession, d: String): DataFrame =
    CommitLog.snapshotDiffFromLog(T.objects(s, d))

  /** DBUpdates(seq): the typed change stream since a sequence number. */
  def dbUpdates(s: SparkSession, d: String, sinceSeq: Long): DataFrame =
    graft.streaming.ChangeLog.events(T.objects(s, d))
      .filter(col("seq") > sinceSeq)
}
