package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * Native codegen'd integer dot product over two ARRAY<BIGINT> columns —
 * the hot kernel of every ANN/cosine operator in [[graft.operators
 * .Similarity]]. Registered as SQL function `graft_dot_long` by
 * [[graft.plans.GraftExtensions]].
 *
 * Why a custom Expression and not `aggregate(zip_with(...))`: the
 * higher-order form allocates an intermediate array per row and runs the
 * lambda through interpreted SafeProjection calls inside the fold; this
 * expression generates a single primitive `long` loop inside whole-stage
 * codegen — no allocation, no virtual calls. At 100 TB the dot product
 * runs per (candidate pair | probe×cell | vector×codeword), so it is the
 * single most-executed scalar in the similarity family.
 *
 * Semantics match the HOF form exactly: NULL if either array is NULL,
 * if lengths differ (zip_with pads with NULL → NULL sum), or if any
 * element is NULL; otherwise Σ aᵢ·bᵢ in Long arithmetic (quantized
 * components are ≤~10³ in magnitude at 64 dims, far from overflow).
 */
case class ArrayDotLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot_long"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<BIGINT> arguments, got $l and $r")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotLong =
    copy(left = newLeft, right = newRight)
}
