package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic text/hash primitives shared by the dedup & text-analysis
 * operators. Every function has an exact DuckDB equivalent (documented
 * inline) so the oracle reproduces results bit-for-bit:
 *   - tokenHash60: first 15 hex chars of md5 → BIGINT (60 bits, positive);
 *     DuckDB: ('0x' || substr(md5(x), 1, 15))::BIGINT
 *   - integer-only arithmetic downstream (mod-prime permutations, shifts).
 *
 * Scale note: all are codegen'd expression pipelines over columns — no UDFs,
 * no driver round-trips; they vectorize inside WholeStageCodegen.
 */
object TextFns {

  /** Mersenne prime 2^31-1 — modulus of the minhash permutation family. */
  val P: Long = 2147483647L

  /** Universal-hash permutation parameters (fixed, mirrored in oracle SQL). */
  def permA(i: Int): Long = 101L + 37L * i
  def permB(i: Int): Long = 53L + 17L * i

  /** 60-bit token hash from the md5 hex prefix. Engine side: the native
    * codegen'd [[Hash60]] (digest bytes → long, no hex-string
    * round-trip); oracle side stays the portable SQL form
    * `CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT)` —
    * Hash60Spec pins the two bit-identical. */
  def tokenHash60(c: Column): Column =
    // call the registered function by name (public API) — no SQL-string
    // round-trip, so ANY column expression (concat chains, casts) is
    // safe input
    call_function("graft_hash60", c)

  def tokenHash60(colName: String): Column = tokenHash60(col(colName))

  /** Whitespace-normalized lowercase text.
    * DuckDB: trim(regexp_replace(lower(text), '\s+', ' ', 'g')) */
  def normText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Word n-gram shingles of a pre-split `words` array column.
    * DuckDB: [array_to_string(ws[i:i+n-1], ' ')
    *          for i in generate_series(1, len(ws)-n+1)] */
  def shingleExpr(wordsCol: String, n: Int): Column =
    expr(s"transform(sequence(0, size($wordsCol) - $n), " +
      s"i -> array_join(slice($wordsCol, i + 1, $n), ' '))")
}
