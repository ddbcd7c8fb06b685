package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * CDC event log for the namespace — the engine's analog of the OM
 * write-ahead change stream that Recon tails (apache/ozone
 * OzoneManager.java:4822-4830 getDBUpdates(seq#) and
 * OMDBUpdatesHandler.java:42-99 typed per-table event decode).
 *
 * The log is a seq#-ordered parquet directory of typed PUT/DELETE events on
 * the key table. [[synthesize]] derives a deterministic log from the
 * `objects` synthesis: one PUT per object at its creation_time, one DELETE
 * at modification_time for every object with version % 7 == 0 — so the net
 * replayed state is exactly `objects WHERE version % 7 <> 0`, giving the
 * DuckDB oracle a closed form.
 *
 * Scale design: events are narrow rows (no payloads); the log is written in
 * seq order across N files so a streaming reader (maxFilesPerTrigger)
 * replays it in bounded micro-batches — the Spark dual of Recon's
 * OMUpdateEventBuffer batch drain.
 */
object ChangeLog {

  val Schema = "seq BIGINT, op STRING, volume STRING, bucket STRING, " +
    "key STRING, data_size BIGINT, ts BIGINT"

  /** Typed event stream derived from the objects table (PUT + partial
    * DELETE), totally ordered by seq#. */
  def events(objects: DataFrame): DataFrame = {
    val puts = objects.select(
      lit("PUT").as("op"), col("volume"), col("bucket"), col("key"),
      col("data_size"), col("creation_time").as("ts"))
    val deletes = objects.filter(col("version") % 7 === 0).select(
      lit("DELETE").as("op"), col("volume"), col("bucket"), col("key"),
      col("data_size"), col("modification_time").as("ts"))
    val w = Window.orderBy("ts", "key", "op", "data_size")
    puts.unionByName(deletes)
      .withColumn("seq", row_number().over(w).cast("long"))
      .select("seq", "op", "volume", "bucket", "key", "data_size", "ts")
  }

  /** Write the log as `numFiles` parquet files split by seq range (file i
    * holds the i-th contiguous slice of the sequence) — ordered replay. */
  def write(objects: DataFrame, logDir: String, numFiles: Int = 8): Unit = {
    val ev = events(objects)
    ev.withColumn("part", (col("seq") % numFiles).cast("int"))
      .repartitionByRange(numFiles, col("seq"))
      .sortWithinPartitions("seq")
      .drop("part")
      .write.mode("overwrite").parquet(logDir)
  }
}
