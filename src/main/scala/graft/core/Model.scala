package graft.core

import org.apache.spark.sql.{Dataset, SparkSession}

/**
 * Typed row model — the engine's Codec catalog (apache/ozone
 * OMDBDefinition.java:151-155 registers a Codec<T> per column family; here
 * each table row is a case class whose implicit product Encoder plays the
 * codec role: schema-checked, Tungsten-serialized).
 */
final case class KeyRow(
  volume: String, bucket: String, key: String, object_id: Long,
  data_size: Long, replicated_size: Long, replication_type: String,
  creation_time: Long, modification_time: Long, owner: String,
  tag_flag: String, container_id: Long, version: Long, etag: String)

final case class BucketRow(
  volume: String, bucket: String, used_bytes: Long, used_namespace: Long,
  quota_bytes: Long, quota_namespace: Long, layout: String)

final case class ContainerRow(
  container_id: Long, state: String, replication_factor: Int,
  used_bytes: Long)

object Model {

  /** objects as a typed Dataset (codec-checked against the synthesis). */
  def objectsDS(spark: SparkSession, dir: String): Dataset[KeyRow] = {
    import spark.implicits._
    Tables.objects(spark, dir).as[KeyRow]
  }

  def bucketsDS(spark: SparkSession, dir: String): Dataset[BucketRow] = {
    import spark.implicits._
    Tables.buckets(spark, dir).as[BucketRow]
  }

  def containersDS(spark: SparkSession, dir: String): Dataset[ContainerRow] = {
    import spark.implicits._
    Tables.containersScm(spark, dir).as[ContainerRow]
  }
}
