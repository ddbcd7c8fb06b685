package graft.streaming

import org.apache.spark.sql.DataFrame
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
    * DELETE), totally ordered by seq#. Seq assignment is the SCALABLE
    * two-pass global index (range-partition by the order key, count per
    * partition, broadcast prefix offsets, add partition-local row number) —
    * never a single-partition global window, which would serialize the
    * whole log through one task at 100 TB. */
  def events(objects: DataFrame, numParts: Int = 8): DataFrame = {
    val puts = objects.select(
      lit("PUT").as("op"), col("volume"), col("bucket"), col("key"),
      col("data_size"), col("creation_time").as("ts"))
    val deletes = objects.filter(col("version") % 7 === 0).select(
      lit("DELETE").as("op"), col("volume"), col("bucket"), col("key"),
      col("data_size"), col("modification_time").as("ts"))
    // total order includes volume/bucket: keys repeat across buckets, and a
    // tie left to shuffle internals would make seq assignment (and thus a
    // dbUpdates(sinceSeq) resume) nondeterministic across runs
    val sortCols = Seq("ts", "volume", "bucket", "key", "op", "data_size")
    val ordered = puts.unionByName(deletes)
      .repartitionByRange(numParts, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
    // ONE RDD instance for both passes: the range shuffle materializes once
    // and its outputs are reused (stage skip), so both passes see identical
    // partition boundaries without pinning anything in the block cache
    val orderedRdd = ordered.rdd
    // pass 1: per-partition counts → prefix offsets (driver-side, tiny)
    val counts = orderedRdd
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.size)))
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    // pass 2: partition-local index + broadcast offset
    val spark = objects.sparkSession
    val schema = ordered.schema.add("seq", "long")
    val withSeq = orderedRdd.mapPartitionsWithIndex { (i, it) =>
      var n = offsets(i)
      it.map { r => n += 1
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ n)
      }
    }
    spark.createDataFrame(withSeq, schema)
      .select("seq", "op", "volume", "bucket", "key", "data_size", "ts")
  }

  /** Write the log as `numFiles` parquet files split by seq range (file i
    * holds the i-th contiguous slice of the sequence) — ordered replay. */
  def write(objects: DataFrame, logDir: String, numFiles: Int = 8): Unit = {
    events(objects, numFiles)
      .repartitionByRange(numFiles, col("seq"))
      .sortWithinPartitions("seq")
      .write.mode("overwrite").parquet(logDir)
  }
}
