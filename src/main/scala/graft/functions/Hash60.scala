package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native codegen'd 60-bit MD5-prefix token hash — bit-identical to the
 * engine's portable SQL form `CAST(conv(substring(md5(x), 1, 15), 16,
 * 10) AS BIGINT)` (the first 15 hex chars of an MD5 digest are exactly
 * the top 60 bits of its first 8 bytes), which the DuckDB oracles keep
 * using. Registered as SQL function `graft_hash60` by
 * [[graft.plans.GraftExtensions]].
 *
 * Why a custom Expression and not the built-in chain: md5() materializes
 * a 32-char hex STRING per row, substring copies 15 chars of it, and
 * conv() re-parses them digit-by-digit — three string allocations and a
 * radix parse for 60 bits that already sit in the digest buffer. This
 * expression goes digest-bytes → long in place. The hash runs per
 * SHINGLE in the minhash band build (75M+ rows at the 100× ingest), per
 * token in SimHash, and per paragraph/fingerprint row — it is the
 * text-dedup family's most-executed scalar.
 */
case class Hash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hash60"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    Hash60.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hash60.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Hash60 =
    copy(child = newChild)
}

object Hash60 {
  // MessageDigest is stateful and not thread-safe; one per executor thread
  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** First 60 bits of md5(s), as the (positive) BIGINT the hex-prefix
    * SQL form produces: the 64-bit big-endian value of digest bytes 0-7,
    * shifted right 4 (char 15 of the hex string is byte 7's high
    * nibble). */
  def hash(s: UTF8String): Long = {
    val md = md5.get()
    md.reset()
    val d = md.digest(s.getBytes)
    (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
  }
}
