package graft.core

import org.apache.spark.sql.SparkSession

/**
 * Single place that constructs a correctly-configured engine session — the
 * config the whole library assumes (UTC session time, nanos-as-long parquet
 * reads for the events table, AQE on, shuffle partitions sized to the
 * executor count). Mirrors the reference's one-time server config
 * (apache/ozone OzoneConfiguration) rather than scattering conf mutations
 * through table loaders.
 *
 * Scale notes: on a real cluster `shufflePartitions` should be ~2-3× total
 * cores (AQE coalesces the excess); locally we pin it to the thread count so
 * tiny test shuffles don't fragment into hundreds of empty tasks.
 */
object GraftSession {

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .withExtensions(graft.plans.GraftExtensions)
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")

  /** Local session with `cpus` threads (the CI/bench shape). */
  def local(cpus: Int): SparkSession = {
    val spark = builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
