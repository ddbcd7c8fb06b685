package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/**
 * Native codegen'd |A∩B| over two SORTED, DISTINCT arrays (ARRAY<STRING>
 * or ARRAY<BIGINT>) — the hot kernel of the n-gram-Jaccard verification
 * stage in [[graft.operators.Dedup.ngramJaccardPairs]], which runs it
 * over dictionary-encoded (term-id) shingle sets. Registered as SQL
 * function `graft_isect_sorted` by [[graft.plans.GraftExtensions]].
 *
 * Why a custom Expression and not `size(array_intersect(a, b))`:
 * ArrayIntersect builds a hash set over one side PER ROW, probes every
 * element of the other, and MATERIALIZES the intersection array — all to
 * read off its length. The verification join evaluates this once per
 * candidate pair (~27M pairs × ~120-entry shingle sets at the 100×
 * dedup-index ingest), so the per-row set allocation and array copy are
 * the stage's dominant per-row cost. This expression runs a single
 * O(|A|+|B|) sorted-merge producing only the count: no set, no result
 * array, primitive long compares (or binary UTF8String compares for the
 * string form) inside whole-stage codegen.
 *
 * PRECONDITION: both arrays sorted ascending by Spark's order for the
 * element type (`array_sort` order: numeric for BIGINT, binary for
 * STRING) with no duplicate and no NULL elements — exactly what
 * `array_sort(collect_set(x))` produces. The count equals
 * `size(array_intersect(a, b))` for such inputs (FunctionsSpec pins the
 * two equal over random draws for both element types). Unsorted input
 * yields an UNDERCOUNT, never an error — callers own the precondition.
 * NULL array → NULL; a NULL element ENCOUNTERED by the merge → NULL
 * (defensive; the engine's set builds never emit one — note the merge
 * stops when either side is exhausted, so a trailing NULL, where
 * `array_sort` places them, may never be inspected).
 */
case class IntersectCountSorted(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_isect_sorted"

  private def elemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two ARRAY<STRING> or two ARRAY<BIGINT> " +
          s"arguments, got $l and $r")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    val strings = elemType == StringType
    var i = 0
    var j = 0
    var acc = 0L
    while (i < na && j < nb) {
      if (a.isNullAt(i) || b.isNullAt(j)) return null
      val c =
        if (strings) a.getUTF8String(i).compareTo(b.getUTF8String(j))
        else java.lang.Long.compare(a.getLong(i), b.getLong(j))
      if (c == 0) { acc += 1L; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val acc = ctx.freshName("acc")
      val cmp = ctx.freshName("cmp")
      val cmpExpr =
        if (elemType == StringType)
          s"$a.getUTF8String($i).compareTo($b.getUTF8String($j))"
        else
          s"java.lang.Long.compare($a.getLong($i), $b.getLong($j))"
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $i = 0; int $j = 0;
         |long $acc = 0L;
         |while ($i < $na && $j < $nb) {
         |  if ($a.isNullAt($i) || $b.isNullAt($j)) { ${ev.isNull} = true; break; }
         |  int $cmp = $cmpExpr;
         |  if ($cmp == 0) { $acc++; $i++; $j++; }
         |  else if ($cmp < 0) { $i++; } else { $j++; }
         |}
         |if (!${ev.isNull}) ${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectCountSorted =
    copy(left = newLeft, right = newRight)
}
