package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only: isolate the stream steady-batch metric (applyDeltaBatch over
  * a bootstrap-state clone, median of N) from the rest of the bench, to
  * tell plan cost from end-of-session JVM noise.
  * Usage: runMain graft.tools.SteadyProbe [sfDir] [reps] */
object SteadyProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 5
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    def secs(t0: Long) = (System.nanoTime() - t0) / 1e9
    val objects = graft.core.Tables.objectsMixed(spark, sfDir)
    val work = graft.streaming.ChangeStream.replayedWorkDir(spark, objects, sfDir)
    val steadyWork = graft.Bench.cloneDir(work)
    graft.streaming.ChangeStream.deleteRecursively(
      java.nio.file.Paths.get(steadyWork, "ckpt"))
    val delta = objects
      .orderBy("volume", "bucket", "key", "version", "data_size").limit(1000)
    val times = (0 until reps).map { i =>
      val deltaBatch = graft.streaming.ChangeLog.events(delta)
        .withColumn("seq", col("seq") + 10000000L * (i + 1))
        .persist()
      deltaBatch.count()
      val tS = System.nanoTime()
      graft.streaming.ChangeStream.applyDeltaBatch(spark, steadyWork, deltaBatch)
      val t = secs(tS)
      deltaBatch.unpersist()
      println(f"[steady] batch $i: $t%.2f s")
      t
    }
    println(f"[steady] median ${times.sorted.apply(reps / 2)}%.2f s")
    graft.streaming.ChangeStream.deleteRecursively(
      java.nio.file.Paths.get(steadyWork))
    spark.stop()
  }
}
