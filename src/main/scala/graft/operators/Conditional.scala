package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Conditional read/write evaluation — the S3 gateway's If-Match /
 * If-None-Match / If-Modified-Since / If-Unmodified-Since handling
 * (apache/ozone s3gateway ObjectEndpoint.java:187,1278), with RFC 7232 §6
 * precedence: If-Match(412) → If-Unmodified-Since(412) →
 * If-None-Match(304) → If-Modified-Since(304) → 200.
 *
 * Scale design: a pure per-row CASE projection over (etag,
 * modification_time) — codegen'd, no shuffle; at 100 TB it rides the scan.
 */
object Conditional {

  /** Conditional-request header set (None = header absent). */
  case class ReadConds(
    ifMatch: Option[String] = None,
    ifNoneMatch: Option[String] = None,
    ifModifiedSince: Option[Long] = None,
    ifUnmodifiedSince: Option[Long] = None)

  /** Decision column for a GET under `conds` (statuses: 200 / 304 / 412).
    * RFC 7232 §3.4/§3.3 ignore rules: If-Unmodified-Since is IGNORED when
    * If-Match is present; If-Modified-Since is IGNORED when If-None-Match
    * is present. */
  def statusCol(conds: ReadConds): Column = {
    val checks: Seq[(Column, String)] = Seq(
      conds.ifMatch.map(e => (col("etag") =!= e) -> "412"),
      conds.ifUnmodifiedSince.filter(_ => conds.ifMatch.isEmpty)
        .map(t => (col("modification_time") > t) -> "412"),
      conds.ifNoneMatch.map(e => (col("etag") === e) -> "304"),
      conds.ifModifiedSince.filter(_ => conds.ifNoneMatch.isEmpty)
        .map(t => (col("modification_time") <= t) -> "304")
    ).flatten
    checks.foldRight(lit("200")) { case ((cond, code), acc) =>
      when(cond, lit(code)).otherwise(acc)
    }
  }

  /** Per-key conditional GET evaluation over the namespace. */
  def conditionalRead(objects: DataFrame, conds: ReadConds): DataFrame =
    objects
      .withColumn("status", statusCol(conds))
      .select("volume", "bucket", "key", "etag", "modification_time", "status")
      .orderBy("volume", "bucket", "key", "modification_time")
}
