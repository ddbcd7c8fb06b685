package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Namespace listing family — the reference's core "query engine"
 * (apache/ozone OmMetadataManagerImpl.java:1070-1209 listKeys,
 * s3gateway BucketEndpoint.java:95-256 ListObjectsV2,
 * KeyManagerImpl.java:1979-2100 listStatus with fake-dir synthesis).
 *
 * Scale design: every listing is a prefix+range predicate over the
 * PERSISTED key-sorted namespace (Tables.objectsSorted: parquet partitioned
 * by (volume, bucket), key-sorted within files) — the volume/bucket
 * equality prunes to one directory partition and the sargable key range
 * ([[Listing.prefixPred]]) skips non-overlapping parquet row groups via
 * min/max stats, together the O(page) "seek" of the reference's RocksDB
 * iterator. `ORDER BY key LIMIT n` compiles to TakeOrderedAndProject (no
 * global sort materialization). Pagination is keyset (`key > token`), never
 * OFFSET — constant cost per page at any table size.
 */
object Listing {

  /** Prefix predicate as a sargable range: startsWith(p) ⟺ p ≤ key < succ(p)
    * where succ increments p's last char — an EXACT bound (every extension of
    * p sorts below succ(p)), so parquet row-group min/max stats can skip
    * non-overlapping ranges (the "seek" of OmMetadataManagerImpl.java:
    * 1144-1172). startsWith is kept as a conjunct for its own pushdown. */
  def prefixPred(c: Column, prefix: String): Column =
    if (prefix.isEmpty) lit(true)
    // Incrementing into/through the surrogate block (U+D800–U+DFFF) breaks
    // UTF-8 binary ordering (a lone surrogate re-encodes as '?', and
    // supplementary chars sort above U+E000 in code-point order) — fall
    // back to plain startsWith for those rare prefixes rather than risk an
    // unsatisfiable range. Same guard as plans.PrefixRangeRule.
    else if (prefix.last >= 0xD7FF.toChar) c.startsWith(prefix)
    else {
      val upper = prefix.init + (prefix.last + 1).toChar
      c >= prefix && c < upper && c.startsWith(prefix)
    }

  /**
   * listKeys(volume, bucket, prefix, startKey, maxKeys): ordered page of
   * maxKeys+1 rows (caller derives isTruncated from row maxKeys+1), startKey
   * exclusive — ref OmMetadataManagerImpl.java:1095-1105 (skipStartKey) and
   * the Case-1..4 matrix of TestListKeys.java:155-265.
   */
  def listKeys(objects: DataFrame, volume: String, bucket: String,
               prefix: String, startKey: String, maxKeys: Int): DataFrame =
    objects
      .filter(col("volume") === volume && col("bucket") === bucket &&
        prefixPred(col("key"), prefix) && col("key") > startKey)
      .select("key", "data_size", "replicated_size", "replication_type",
        "creation_time", "owner", "etag")
      // key alone is not unique in the synthetic namespace — extend the sort
      // to a total order so the LIMIT boundary is engine-independent.
      .orderBy("key", "data_size", "creation_time")
      .limit(maxKeys + 1)

  /**
   * S3 ListObjectsV2 delimiter grouping: entries under `prefix` grouped at the
   * first `delimiter` past the prefix into CommonPrefixes; keys and prefixes
   * interleave in lexicographic order — ref BucketEndpoint.java:184-256
   * (prevDir dedup becomes a plain groupBy).
   */
  def listObjectsV2(objects: DataFrame, volume: String, bucket: String,
                    prefix: String, startAfter: String, maxKeys: Int): DataFrame = {
    val p = prefix.length
    objects
      .filter(col("volume") === volume && col("bucket") === bucket &&
        prefixPred(col("key"), prefix) && col("key") > startAfter)
      .withColumn("rest", expr(s"substring(key, ${p + 1})"))
      .withColumn("slash", instr(col("rest"), "/"))
      .withColumn("entry",
        when(col("slash") > 0,
          concat(lit(prefix), expr("substring(rest, 1, slash)")))
          .otherwise(col("key")))
      .groupBy("entry")
      .agg(
        (max(col("slash")) > 0).as("is_common_prefix"),
        count(lit(1)).as("num_keys"),
        sum("data_size").as("total_size"))
      .orderBy("entry")
      .limit(maxKeys + 1)
  }

  /**
   * listStatus: immediate children of a directory, synthesizing "fake
   * directory" rows for intermediate path components of deeper keys — ref
   * KeyManagerImpl.java:1910-1936 (getImmediateChild / createDirectoryKey).
   * Output one row per child: dirs carry recursive file count + size.
   */
  def listStatus(objects: DataFrame, volume: String, bucket: String,
                 dirPath: String): DataFrame = {
    val prefix = if (dirPath.endsWith("/")) dirPath else dirPath + "/"
    val p = prefix.length
    objects
      .filter(col("volume") === volume && col("bucket") === bucket &&
        prefixPred(col("key"), prefix))
      .withColumn("rest", expr(s"substring(key, ${p + 1})"))
      .withColumn("slash", instr(col("rest"), "/"))
      .withColumn("child",
        when(col("slash") > 0, expr("substring(rest, 1, slash - 1)"))
          .otherwise(col("rest")))
      .groupBy("child")
      .agg(
        (max(col("slash")) > 0).as("is_dir"),
        count(lit(1)).as("num_files"),
        sum("data_size").as("total_size"),
        max("modification_time").as("modification_time"))
      .orderBy("child")
  }

  /**
   * Keyset continuation-token pagination (ref ContinueToken /
   * BucketEndpoint.java:184-247): page after `token` — identical shape to
   * listKeys but exercised as its own contract (token = last key of the
   * previous page).
   */
  def pageAfter(objects: DataFrame, volume: String, bucket: String,
                token: String, maxKeys: Int): DataFrame =
    objects
      .filter(col("volume") === volume && col("bucket") === bucket &&
        col("key") > token)
      .select("key", "data_size", "etag")
      .orderBy("key", "data_size")
      .limit(maxKeys)

  /** listBuckets of a volume with prefix + exclusive startBucket
    * (ref OmMetadataManagerImpl listBuckets semantics). */
  def listBuckets(buckets: DataFrame, volume: String,
                  startBucket: String, maxBuckets: Int): DataFrame =
    buckets
      .filter(col("volume") === volume && col("bucket") > startBucket)
      .orderBy("bucket")
      .limit(maxBuckets + 1)

  /** listVolumes ordered with aggregates. */
  def listVolumes(volumes: DataFrame): DataFrame =
    volumes.orderBy("volume")
}
