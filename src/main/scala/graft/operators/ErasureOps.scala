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

  /**
   * EC degraded-read decision — the client read path's reader choice and
   * source-selection feasibility (ECBlockInputStreamProxy.java:70-95,
   * 117-124 + ECBlockReconstructedStripeInputStream.selectIndexes
   * :773-819):
   *  - expected data locations = min(ceil(blockLen / chunkSize), data) —
   *    a block shorter than a full stripe legitimately has fewer
   *    locations (the tail indexes are PADDING, never read, never
   *    "missing");
   *  - available = distinct replica indexes within [1, expected];
   *    the reader goes RECONSTRUCTION exactly when available < expected;
   *  - a reconstruction read keeps every surviving data index as a
   *    direct input and needs (expected − |surviving data|) parity
   *    sources from the surviving parity set (WHICH parities is
   *    reference-random, shuffle at :544-547 — the COUNT and
   *    feasibility are the decision); fewer surviving parities than
   *    required ⇒ InsufficientLocationsException.
   *
   * Input `avail` is a comma-joined 1-based replica-index list. Pure
   * per-row projection — no shuffle.
   */
  def degradedReadPlan(blocks: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    blocks
      .withColumn("expected_data",
        least(expr("(block_len + chunk_size - 1) DIV chunk_size"),
          col("ec_data")))
      .withColumn("idxs",
        transform(split(col("avail"), ","), x => x.cast("long")))
      .withColumn("available_data",
        size(array_distinct(filter(col("idxs"),
          x => x >= 1 && x <= col("expected_data")))).cast("long"))
      .withColumn("reader",
        when(col("available_data") < col("expected_data"),
          lit("RECONSTRUCTION")).otherwise(lit("NORMAL")))
      .withColumn("n_missing",
        when(col("reader") === "RECONSTRUCTION",
          col("expected_data") - col("available_data"))
          .otherwise(lit(0L)))
      .withColumn("n_parity_avail",
        size(array_distinct(filter(col("idxs"),
          x => x > col("ec_data") &&
            x <= col("ec_data") + col("ec_parity")))).cast("long"))
      .withColumn("verdict",
        when(col("reader") === "NORMAL", lit("OK"))
          .when(col("n_missing") <= col("n_parity_avail"), lit("OK"))
          .otherwise(lit("INSUFFICIENT")))
      .select("block_id", "expected_data", "available_data", "reader",
        "n_missing", "n_parity_avail", "verdict")
      .orderBy("block_id")
  }
}
