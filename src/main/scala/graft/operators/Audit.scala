package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Audit-log analytics — the reference's `ozone debug auditparser` canned
 * templates (`hadoop-ozone/cli-debug/src/main/resources/commands
 * .properties`): the parser loads OM/SCM/DN audit logs into a table
 * (AuditEntry.java: datetime/level/logger/user/ip/op/params/result/
 * exception) and serves top-5 reports. Each template is one
 * map-side-combined hash aggregate + a TakeOrdered(5) — the DESC-total,
 * ASC-key tie-break is the template's own ORDER BY, so results are a pure
 * function of the log at any scale.
 */
object Audit {

  /** `top5users`: select user, count(*) ... order by total DESC, user. */
  def topUsers(audit: DataFrame, k: Int = 5): DataFrame =
    audit.groupBy("user").agg(count(lit(1)).as("total"))
      .orderBy(col("total").desc, col("user"))
      .limit(k)

  /** `top5cmds`: the op histogram, same shape. */
  def topCmds(audit: DataFrame, k: Int = 5): DataFrame =
    audit.groupBy("op").agg(count(lit(1)).as("total"))
      .orderBy(col("total").desc, col("op"))
      .limit(k)

  /** `top5activetimebyseconds`: busiest wall-clock seconds — the template
    * strips the log4j millis suffix (substr up to the comma) and counts
    * per second. */
  def topActiveTimes(audit: DataFrame, k: Int = 5): DataFrame =
    audit
      .withColumn("dt",
        expr("substring(datetime, 1, instr(datetime, ',') - 1)"))
      .groupBy("dt").agg(count(lit(1)).as("thecount"))
      .orderBy(col("thecount").desc, col("dt"))
      .limit(k)
}
