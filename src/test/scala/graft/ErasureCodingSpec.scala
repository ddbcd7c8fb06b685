package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{GF256, ReedSolomon}

/** GF(256) algebra + RS(k,m) encode/erase/reconstruct round trips
  * (oracle-exempt: byte-level kernel; no SQL dual). */
class ErasureCodingSpec extends AnyFunSuite {

  test("GF256 field laws: inverses, associativity, distributivity (spot grid)") {
    for (a <- 1 until 256) assert(GF256.mul(a, GF256.inv(a)) === 1, s"inv($a)")
    val pts = Seq(1, 2, 3, 29, 76, 142, 255)
    for (a <- pts; b <- pts; c <- pts) {
      assert(GF256.mul(GF256.mul(a, b), c) === GF256.mul(a, GF256.mul(b, c)))
      assert(GF256.mul(a, b ^ c) === (GF256.mul(a, b) ^ GF256.mul(a, c)))
    }
  }

  private def stripe(k: Int, n: Int): Array[Array[Byte]] =
    Array.tabulate(k)(i => Array.tabulate(n)(b => ((i * 131 + b * 29 + 7) % 251).toByte))

  test("RS(6,3) round-trips every 3-erasure pattern") {
    val codec = ReedSolomon.Codec(6, 3)
    val data = stripe(6, 64)
    val parity = codec.encode(data)
    val full = data ++ parity
    val idx = full.indices
    for (e1 <- idx; e2 <- idx if e2 > e1; e3 <- idx if e3 > e2) {
      val damaged = full.map(_.clone: Array[Byte])
      damaged(e1) = null; damaged(e2) = null; damaged(e3) = null
      val recovered = codec.decode(damaged)
      for (i <- idx)
        assert(recovered(i).toSeq === full(i).toSeq, s"shard $i after erasing ($e1,$e2,$e3)")
    }
  }

  test("RS(3,2) reconstructs from exactly k survivors of any kind") {
    val codec = ReedSolomon.Codec(3, 2)
    val data = stripe(3, 32)
    val full = data ++ codec.encode(data)
    val damaged = full.map(_.clone: Array[Byte])
    damaged(0) = null; damaged(4) = null // one data + one parity erased
    val rec = codec.decode(damaged)
    for (i <- full.indices) assert(rec(i).toSeq === full(i).toSeq)
  }

  test("RS rejects more than m erasures") {
    val codec = ReedSolomon.Codec(3, 2)
    val full = stripe(3, 8) ++ codec.encode(stripe(3, 8))
    val damaged: Array[Array[Byte]] = full.map(_.clone: Array[Byte])
    damaged(0) = null; damaged(1) = null; damaged(2) = null
    intercept[IllegalArgumentException] { codec.decode(damaged) }
  }

  test("parity is sensitive to single-byte data corruption") {
    val codec = ReedSolomon.Codec(4, 2)
    val data = stripe(4, 16)
    val p1 = codec.encode(data)
    data(2)(7) = (data(2)(7) ^ 1).toByte
    val p2 = codec.encode(data)
    assert(p1(0).toSeq !== p2(0).toSeq)
    assert(p1(1).toSeq !== p2(1).toSeq)
  }
}
