package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import graft.functions.ReedSolomon

/**
 * Erasure coding as ENGINE operators — the write/repair path the reference
 * builds on its RS codec (apache/ozone hadoop-hdds/erasurecode
 * RSRawEncoder.java:30-64 feeding ECBlockOutputStream striped writes, and
 * the reconstruction read path of ECBlockReconstructedStripeInputStream).
 *
 * Scale design: [[stripe]] is a mapPartitions byte transform — the codec
 * initializes once per partition and payloads never shuffle to encode.
 * [[reconstruct]] gathers a stripe's shards with ONE co-partitioned shuffle
 * on the stripe key (the gather any repair must pay), decodes per group,
 * and emits the reassembled payload; everything stays typed (Encoders, no
 * Row boxing in the hot loop).
 */
object ErasureOps {

  /** One coded shard of a striped payload: idx 0..k-1 data, k..k+m-1 parity. */
  final case class Shard(media_id: Long, orig_len: Int, shard_idx: Int,
                         shard: Array[Byte])

  /** Stripe each binary payload into k data + m parity shards (payload
    * zero-padded to a multiple of k; orig_len reverses the padding). */
  def stripe(media: DataFrame, k: Int, m: Int): Dataset[Shard] = {
    import media.sparkSession.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val codec = ReedSolomon.Codec(k, m)
        it.flatMap { case (id, payload) =>
          val chunk = (payload.length + k - 1) / k
          val padded = java.util.Arrays.copyOf(payload, chunk * k)
          val data = Array.tabulate(k)(i =>
            java.util.Arrays.copyOfRange(padded, i * chunk, (i + 1) * chunk))
          val parity = codec.encode(data)
          (data ++ parity).iterator.zipWithIndex.map { case (s, i) =>
            Shard(id, payload.length, i, s)
          }
        }
      }
  }

  /** Reconstruct every stripe from its surviving shards (≤ m erased) and
    * reassemble the original payload, hex-encoded for comparison. */
  def reconstruct(shards: Dataset[Shard], k: Int, m: Int): DataFrame = {
    import shards.sparkSession.implicits._
    shards.groupByKey(_.media_id)
      .mapGroups { (id, it) =>
        val codec = ReedSolomon.Codec(k, m)
        val slots = new Array[Array[Byte]](k + m)
        var origLen = 0
        it.foreach { s => slots(s.shard_idx) = s.shard; origLen = s.orig_len }
        val full = codec.decode(slots)
        val payload = full.take(k).flatten.take(origLen)
        (id, payload.map("%02x".format(_)).mkString)
      }
      .toDF("media_id", "recovered_hex")
      .orderBy("media_id")
  }

  /** End-to-end integrity query (the EC dual of q_checksums): stripe every
    * payload, erase one deterministic shard per stripe, reconstruct, and
    * emit the recovered payload hex — equal to the source payload iff the
    * codec round-trips through the erasure. */
  def reconstructAfterErasure(media: DataFrame, k: Int = 3, m: Int = 2): DataFrame = {
    val striped = stripe(media, k, m)
    val survivors = striped.filter((s: Shard) => (s.media_id + s.shard_idx) % (k + m) != 0)
    reconstruct(survivors, k, m)
  }
}
