package graft

import graft.operators.ErasureOps

/** EC wired into the engine: stripe → erase → reconstruct as DataFrame
  * operators (the kernel itself is covered by ErasureCodingSpec). */
class ErasureOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val media = Seq(
    1L -> Array.tabulate(64)(i => (i * 7 + 3).toByte),
    2L -> Array.tabulate(17)(i => (i * 13 + 1).toByte), // not a multiple of k
    3L -> Array.tabulate(1)(_ => 0x5a.toByte),
    4L -> Array.empty[Byte])
    .toDF("media_id", "payload")

  private def hexOf(b: Array[Byte]) = b.map("%02x".format(_)).mkString

  test("stripe emits k+m shards per payload and reconstruct survives 2 erasures") {
    val striped = ErasureOps.stripe(media, 3, 2)
    assert(striped.count() === 4 * 5)
    // erase two shards per stripe — one data, one parity
    val survivors = striped.filter((s: ErasureOps.Shard) =>
      s.shard_idx != 1 && s.shard_idx != 4)
    val rec = ErasureOps.reconstruct(survivors, 3, 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = media.collect()
      .map(r => r.getLong(0) -> hexOf(r.getAs[Array[Byte]]("payload"))).toMap
    assert(rec === want)
  }

  test("reconstructAfterErasure round-trips with the deterministic erasure rule") {
    val rec = ErasureOps.reconstructAfterErasure(media, 3, 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = media.collect()
      .map(r => r.getLong(0) -> hexOf(r.getAs[Array[Byte]]("payload"))).toMap
    assert(rec === want)
  }
}
