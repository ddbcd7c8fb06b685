package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native one-pass MinHash signature over a word array: the 16
 * permutation minima of the word-BIGRAM shingle hashes, bit-identical to
 * the engine's previous explode/aggregate form (and to the DuckDB
 * oracles' portable SQL, which keeps it):
 *
 *   min over shingles s of (permA(i) * (hash60(s) % P) + permB(i)) % P
 *   for i in 0..15, s = "w[j] w[j+1]"
 *
 * with [[TextFns.P]] = 2³¹−1 and the permA/permB line constants.
 * Registered as SQL function `graft_minhash16` by
 * [[graft.plans.GraftExtensions]].
 *
 * Why a custom Expression and not explode + 16 min() aggregates: the
 * band-index ingest evaluates this per DOCUMENT, but the explode form
 * materializes one row PER SHINGLE (75M+ rows at the 100× corpus) and
 * runs 16 projection+aggregate-buffer updates on each — the arithmetic
 * is identical, the row machinery is the cost. This expression keeps
 * the whole signature in 16 registers inside one loop over the words
 * array. Duplicate shingles need no dedup: min() is idempotent over
 * repeats in both forms.
 *
 * NULL array → NULL; fewer than 2 words → NULL (the engine filters
 * `size(ws) >= 2` before calling, matching the explode form which
 * simply produced no row); a NULL word element → NULL (defensive; the
 * engine's `split()` output never contains one).
 */
case class MinHash16(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash16"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an ARRAY<STRING> argument, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    MinHash16.sig(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    // sig() returns null for <2 words / null elements — the generated
    // wrapper re-checks, mirroring nullSafeEval's contract
    val g = ctx.freshName("g")
    nullSafeCodeGen(ctx, ev, c => s"""
       |org.apache.spark.sql.catalyst.util.ArrayData $g =
       |  graft.functions.MinHash16.sig($c);
       |if ($g == null) { ${ev.isNull} = true; } else { ${ev.value} = $g; }
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHash16 =
    copy(child = newChild)
}

object MinHash16 {
  import TextFns.{P, permA, permB}

  private val K = 16
  private val A: Array[Long] = Array.tabulate(K)(permA)
  private val B: Array[Long] = Array.tabulate(K)(permB)
  private val SPACE = UTF8String.fromString(" ")

  /** 16 minhash minima over the bigram shingles of `ws`, or null if the
    * array has fewer than 2 words or a null element. Products stay far
    * from Long overflow: hmod < 2³¹ and A(i) ≤ 656 ⇒ a·h+b < 2⁴¹. */
  def sig(ws: ArrayData): ArrayData = {
    val n = ws.numElements()
    if (n < 2) return null
    val mins = Array.fill(K)(Long.MaxValue)
    var j = 0
    var prev = if (ws.isNullAt(0)) return null else ws.getUTF8String(0)
    while (j < n - 1) {
      if (ws.isNullAt(j + 1)) return null
      val next = ws.getUTF8String(j + 1)
      val hmod = Hash60.hash(UTF8String.concat(prev, SPACE, next)) % P
      var i = 0
      while (i < K) {
        val v = (A(i) * hmod + B(i)) % P
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      prev = next
      j += 1
    }
    new GenericArrayData(mins)
  }
}
