package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}

/**
 * Periodic scan jobs with a persisted cursor — the engine's analog of the
 * reference's interval-triggered lifecycle/expiry services
 * (apache/ozone KeyLifecycleService.java:294-465: scan in bounded batches,
 * persist progress in lifecycleScanStateTable, OMDBDefinition.java:341-346)
 * so each tick scans only rows newer than the cursor, never the full table.
 *
 * Scale design: a tick = one range-predicated scan (cursor < mtime ≤ now)
 * that prunes to recent row groups when the table is time-sorted, plus an
 * O(1) cursor write. State lives beside the other view states (atomic
 * pointer-file swap).
 */
object PeriodicScan {

  private def cursorPath(dir: String) = Paths.get(dir, "scan_cursor")

  def readCursor(dir: String): Long = {
    val p = cursorPath(dir)
    if (Files.exists(p)) Files.readString(p).trim.toLong else Long.MinValue
  }

  private def writeCursor(dir: String, v: Long): Unit = {
    Files.createDirectories(Paths.get(dir))
    val tmp = Paths.get(dir, "scan_cursor.tmp")
    Files.writeString(tmp, v.toString)
    Files.move(tmp, cursorPath(dir),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  /**
   * One scan tick: evaluate `rule` over rows with cursor < modification_time
   * ≤ `nowMs`, hand the batch to `consume`, and advance the cursor to
   * `nowMs` ONLY after the batch is MATERIALIZED and consume has returned —
   * the batch is persisted and counted before consume runs, so a consumer
   * that returns a lazy value cannot cause the cursor to commit ahead of
   * unprocessed rows. A crashed tick re-runs from the previous cursor:
   * delivery is at-least-once, and repeated successful ticks never rescan
   * old rows.
   */
  def tick[T](objects: DataFrame, stateDir: String, nowMs: Long,
              rule: org.apache.spark.sql.Column)(consume: DataFrame => T): T = {
    val cur = readCursor(stateDir)
    val batch = objects
      .filter(col("modification_time") > cur &&
        col("modification_time") <= nowMs && rule)
      .select("volume", "bucket", "key", "data_size", "modification_time")
      .orderBy("volume", "bucket", "key", "data_size", "modification_time")
      .persist()
    try {
      batch.count() // materialization barrier ahead of the cursor commit
      val result = consume(batch)
      writeCursor(stateDir, nowMs)
      result
    } finally batch.unpersist()
  }
}
