package graft.functions

/**
 * Reed-Solomon RS(k, m) erasure coding over GF(2⁸) — the engine's dual of
 * the reference's EC codec (apache/ozone hadoop-hdds/erasurecode
 * RSRawEncoder.java:30-64 / RSRawDecoder.java), built clean-room from the
 * standard construction: a systematic generator [I_k ; C] with C a Cauchy
 * matrix (every square submatrix of a Cauchy matrix is nonsingular, so any
 * k surviving shards reconstruct).
 *
 * Field: GF(256) with the 0x11D reduction polynomial (the common RS storage
 * polynomial), log/antilog table arithmetic.
 *
 * Scale note: encode/decode are per-stripe byte transforms — on a cluster
 * they run inside mapPartitions over binary chunk columns (no shuffle, no
 * driver involvement); this object is the pure kernel those tasks call.
 */
object GF256 {
  val Poly = 0x11D
  private val exp = new Array[Int](512)
  private val logT = new Array[Int](256)
  locally {
    var x = 1
    for (i <- 0 until 255) {
      exp(i) = x
      logT(x) = i
      x = x << 1
      if ((x & 0x100) != 0) x ^= Poly
    }
    for (i <- 255 until 512) exp(i) = exp(i - 255)
  }
  def mul(a: Int, b: Int): Int =
    if (a == 0 || b == 0) 0 else exp(logT(a & 0xff) + logT(b & 0xff))
  def inv(a: Int): Int = {
    require(a != 0, "zero has no inverse")
    exp(255 - logT(a & 0xff))
  }
  def div(a: Int, b: Int): Int = {
    require(b != 0, "division by zero in GF(256)")
    if (a == 0) 0 else exp((logT(a & 0xff) - logT(b & 0xff) + 255) % 255)
  }
}

object ReedSolomon {

  /** RS(k data, m parity) codec; shard index 0..k-1 = data, k..k+m-1 = parity. */
  final case class Codec(k: Int, m: Int) {
    require(k > 0 && m > 0 && k + m <= 256, "need 0 < k, 0 < m, k+m <= 256")

    /** Cauchy coefficients: c(i)(j) = 1 / (x_i ⊕ y_j), x_i = k+i, y_j = j —
      * disjoint point sets ⇒ all entries defined, all submatrices regular. */
    val parityMatrix: Array[Array[Int]] =
      Array.tabulate(m, k)((i, j) => GF256.inv((k + i) ^ j))

    /** Row `idx` of the full systematic generator [I_k ; C]. */
    private def generatorRow(idx: Int): Array[Int] =
      if (idx < k) Array.tabulate(k)(j => if (j == idx) 1 else 0)
      else parityMatrix(idx - k)

    /** Encode k equal-length data shards → m parity shards. */
    def encode(data: Array[Array[Byte]]): Array[Array[Byte]] = {
      require(data.length == k, s"need $k data shards")
      val n = data.head.length
      require(data.forall(_.length == n), "shards must be equal length")
      Array.tabulate(m) { i =>
        val out = new Array[Byte](n)
        var j = 0
        while (j < k) {
          val c = parityMatrix(i)(j)
          val d = data(j)
          var b = 0
          while (b < n) {
            out(b) = (out(b) ^ GF256.mul(c, d(b) & 0xff)).toByte
            b += 1
          }
          j += 1
        }
        out
      }
    }

    /** Invert a square GF(256) matrix by Gauss-Jordan elimination. */
    private def invert(mtx: Array[Array[Int]]): Array[Array[Int]] = {
      val n = mtx.length
      val a = mtx.map(_.clone())
      val inv = Array.tabulate(n, n)((r, c) => if (r == c) 1 else 0)
      for (col <- 0 until n) {
        val pivot = (col until n).find(r => a(r)(col) != 0)
          .getOrElse(throw new IllegalStateException("singular matrix"))
        if (pivot != col) {
          val t = a(pivot); a(pivot) = a(col); a(col) = t
          val ti = inv(pivot); inv(pivot) = inv(col); inv(col) = ti
        }
        val pinv = GF256.inv(a(col)(col))
        for (c <- 0 until n) {
          a(col)(c) = GF256.mul(a(col)(c), pinv)
          inv(col)(c) = GF256.mul(inv(col)(c), pinv)
        }
        for (r <- 0 until n if r != col && a(r)(col) != 0) {
          val f = a(r)(col)
          for (c <- 0 until n) {
            a(r)(c) ^= GF256.mul(f, a(col)(c))
            inv(r)(c) ^= GF256.mul(f, inv(col)(c))
          }
        }
      }
      inv
    }

    /**
     * Reconstruct ALL k+m shards from any ≥k survivors.
     * `shards(i) = null` marks an erased shard; returns the full array with
     * every erasure filled in (throws if more than m are missing).
     */
    def decode(shards: Array[Array[Byte]]): Array[Array[Byte]] = {
      require(shards.length == k + m, s"need ${k + m} shard slots")
      val present = shards.indices.filter(shards(_) != null)
      require(present.length >= k, "too many erasures to reconstruct")
      val use = present.take(k)
      val n = shards(use.head).length
      val dec = invert(use.map(generatorRow).toArray)
      // data(j) = Σ_r dec(j)(r) * shards(use(r))
      val data = Array.tabulate(k) { j =>
        val out = new Array[Byte](n)
        var r = 0
        while (r < k) {
          val c = dec(j)(r)
          if (c != 0) {
            val s = shards(use(r))
            var b = 0
            while (b < n) {
              out(b) = (out(b) ^ GF256.mul(c, s(b) & 0xff)).toByte
              b += 1
            }
          }
          r += 1
        }
        out
      }
      val parity = encode(data)
      Array.tabulate(k + m)(i => if (i < k) data(i) else parity(i - k))
    }
  }
}
