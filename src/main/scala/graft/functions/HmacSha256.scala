package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * HMAC-SHA256(key BINARY, msg STRING) → BINARY — the keyed-hash kernel of
 * AWS SigV4 request validation (the reference chains four of these to
 * derive the signing key and a fifth over the string-to-sign:
 * `hadoop-ozone/ozone-manager/.../security/AWSV4AuthValidator.java:66-124`).
 * Registered as SQL function `graft_hmac` by
 * [[graft.plans.GraftExtensions]].
 *
 * CodegenFallback is deliberate: the per-row cost IS the MAC computation
 * (two SHA-256 compressions minimum) — there is no arithmetic for
 * whole-stage codegen to fuse, so the interpreted call adds nothing
 * measurable. The Mac instance is thread-local (init is cheap; instance
 * allocation is not), matching the reference's THREAD_LOCAL_MAC.
 */
case class HmacSha256(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_hmac"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (BINARY, STRING) arguments, got $l and $r")
    }

  override def nullSafeEval(k: Any, m: Any): Any =
    HmacSha256.compute(k.asInstanceOf[Array[Byte]],
      m.asInstanceOf[UTF8String].getBytes)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HmacSha256 =
    copy(left = newLeft, right = newRight)
}

object HmacSha256 {
  private val macTl = new ThreadLocal[javax.crypto.Mac] {
    override def initialValue(): javax.crypto.Mac =
      javax.crypto.Mac.getInstance("HmacSHA256")
  }

  def compute(key: Array[Byte], msg: Array[Byte]): Array[Byte] = {
    val mac = macTl.get()
    mac.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(msg)
  }
}
