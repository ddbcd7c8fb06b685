package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import graft.core.KeyRow

/**
 * ReconOmTask-style typed aggregator (apache/ozone
 * recon/.../tasks/ReconOmTask.java: an event-driven `process`/`reprocess`
 * interface; its Spark dual is a custom `Aggregator[IN, BUF, OUT]` whose
 * reduce() is the per-event delta and merge() the partial-aggregate
 * combine — map-side combinable, so it runs as one shuffle exactly like
 * the built-in aggregates).
 */
object TypedAggs {

  /** Scala-side log₂ bin (same value as Aggregates.pow2Bin's SQL form). */
  def pow2BinValue(size: Long, minBin: Long): Long = {
    val b = if (size <= 1) 1L else java.lang.Long.highestOneBit(size - 1) << 1
    math.max(b, minBin)
  }

  /** (file_count, total_bytes) accumulator over KeyRow — the
    * FileSizeCountTask aggregate as a typed Aggregator. */
  object FileSizeCounter extends Aggregator[KeyRow, (Long, Long), (Long, Long)] {
    def zero: (Long, Long) = (0L, 0L)
    def reduce(b: (Long, Long), r: KeyRow): (Long, Long) =
      (b._1 + 1L, b._2 + r.data_size)
    def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
      (a._1 + b._1, a._2 + b._2)
    def finish(b: (Long, Long)): (Long, Long) = b
    def bufferEncoder: Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    def outputEncoder: Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  }
}
