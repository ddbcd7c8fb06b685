package graft.functions

/**
 * CRC-32 composition over GF(2) — the mathematical core of the
 * reference's composite file checksum (ozone client checksum:
 * BaseFileChecksumHelper.java:381-398 feeding block CRCs into a
 * CrcComposer; CompositeCrcFileChecksum.java:32-56 carries the composed
 * int): crc(A‖B) = shift(crc(A), |B|) ⊕ crc(B), where shift multiplies
 * by x^(8·|B|) in GF(2)[x]/P. Clean-room implementation of the public
 * zlib crc32_combine construction: the "advance one byte" linear map is
 * a 32×32 GF(2) matrix; squaring it log₂(len) times applies x^(8·len)
 * without touching data bytes.
 *
 * Pure JVM arithmetic (no allocation beyond two 32-long scratch
 * matrices), deterministic — safe inside a UDF; the identity
 * combine(crc(a), crc(b), |b|) == crc(a‖b) is property-tested against
 * java.util.zip.CRC32 in FunctionsSpec.
 */
object Crc32Combine {

  /** Reflected CRC-32 polynomial (same one Spark's crc32 and the JDK use). */
  private val Poly = 0xedb88320L

  private def matTimes(mat: Array[Long], vec: Long): Long = {
    var sum = 0L
    var v = vec
    var i = 0
    while (v != 0) {
      if ((v & 1L) != 0) sum ^= mat(i)
      v >>>= 1
      i += 1
    }
    sum
  }

  private def matSquare(sq: Array[Long], mat: Array[Long]): Unit = {
    var i = 0
    while (i < 32) {
      sq(i) = matTimes(mat, mat(i))
      i += 1
    }
  }

  /** crc of A‖B from crc(A), crc(B) and |B| in bytes. */
  def combine(crc1: Long, crc2: Long, len2: Long): Long = {
    if (len2 <= 0) return crc1 & 0xffffffffL
    val even = new Array[Long](32)
    val odd = new Array[Long](32)
    // odd = the one-BIT advance map: column 0 is the polynomial, the
    // rest shift down
    odd(0) = Poly
    var row = 1L
    var n = 1
    while (n < 32) {
      odd(n) = row
      row <<= 1
      n += 1
    }
    matSquare(even, odd) // even = advance 2 bits
    matSquare(odd, even) // odd  = advance 4 bits (one nibble short of a byte)
    var c = crc1 & 0xffffffffL
    var l = len2
    var done = false
    while (!done) {
      matSquare(even, odd) // even = advance 8·2^k bits
      if ((l & 1L) != 0) c = matTimes(even, c)
      l >>>= 1
      if (l == 0) done = true
      else {
        matSquare(odd, even)
        if ((l & 1L) != 0) c = matTimes(odd, c)
        l >>>= 1
        if (l == 0) done = true
      }
    }
    (c ^ crc2) & 0xffffffffL
  }

  /** Left-fold a sequence of (crc, len) blocks in order. */
  def compose(blocks: Seq[(Long, Long)]): Long = blocks match {
    case Seq() => 0L
    case head +: tail =>
      tail.foldLeft(head._1 & 0xffffffffL) { case (acc, (c, l)) =>
        combine(acc, c, l)
      }
  }
}
