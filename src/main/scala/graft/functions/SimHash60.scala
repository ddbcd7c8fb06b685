package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/**
 * Native one-pass 60-bit SimHash over a word array, bit-identical to
 * the engine's previous explode + 60 signed-sum aggregate form (and to
 * the DuckDB oracles' portable SQL, which keeps it): per token t,
 * h = hash60(t); bit j of the signature is set iff
 * Σ_t (bit j of h ? +1 : −1) is STRICTLY positive (ties → 0, matching
 * `CASE WHEN s_j > 0`).
 *
 * Why a custom Expression and not explode + 60 sum() aggregates: one
 * row per TOKEN with 60 projection+aggregate-buffer updates each — the
 * same row-machinery tax [[MinHash16]] eliminated for the minhash
 * band build; here the counters are 60 ints in registers and the token
 * loop runs once per document. Registered as SQL function
 * `graft_simhash` by [[graft.plans.GraftExtensions]].
 *
 * NULL array → NULL; EMPTY array → NULL (the explode form produced no
 * row for such a doc — production `split` output never is, since a
 * trimmed norm string splits to at least [""], which hashes like any
 * token); a NULL element → NULL (defensive).
 */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an ARRAY<STRING> argument, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    SimHash60.sig(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val g = ctx.freshName("g")
    nullSafeCodeGen(ctx, ev, c => s"""
       |Long $g = graft.functions.SimHash60.sig($c);
       |if ($g == null) { ${ev.isNull} = true; }
       |else { ${ev.value} = $g.longValue(); }
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

object SimHash60 {
  private val Bits = 60

  /** 60-bit simhash of the token array, or null for an empty array or a
    * null element. Boxed Long so the codegen wrapper can pass the null
    * through without a sentinel. */
  def sig(ws: ArrayData): java.lang.Long = {
    val n = ws.numElements()
    if (n == 0) return null
    val counts = new Array[Int](Bits)
    var t = 0
    while (t < n) {
      if (ws.isNullAt(t)) return null
      val h = Hash60.hash(ws.getUTF8String(t))
      var j = 0
      while (j < Bits) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      t += 1
    }
    var out = 0L
    var j = 0
    while (j < Bits) {
      if (counts(j) > 0) out |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(out)
  }
}
