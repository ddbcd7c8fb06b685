package graft.tools

/** Dev-only: phase-level timing of the checkpoint-loss bootstrap
  * (ChangeStream.bootstrapViews) — distinct-pk pass vs per-view folds —
  * to localize the 4.97 s (r8, sf0.1) against the ≤3.1 s target. */
object BootstrapProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.GraftSession.local(cpus)
    def secs(t0: Long) = (System.nanoTime() - t0) / 1e9
    val objects = graft.core.Tables.objectsMixed(spark, sfDir)
    val logDir = graft.streaming.ChangeStream.cdcLogDir(spark, objects, sfDir)
    // JVM/codegen warmup: one full bootstrap into a throwaway dir
    val warm = graft.core.TempDirs.create("graft_bsw_")
    graft.streaming.ChangeStream.bootstrapViews(spark, logDir, warm)
    // timed reps
    (1 to 5).foreach { i =>
      val work = graft.core.TempDirs.create("graft_bsp_")
      val t0 = System.nanoTime()
      graft.streaming.ChangeStream.bootstrapViews(spark, logDir, work)
      println(f"[bootstrap] rep$i total=${secs(t0)}%.2fs")
    }
    // phase decomposition (sequential, warm)
    import org.apache.spark.sql.functions._
    val log = spark.read
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        graft.streaming.ChangeLog.Schema))
      .parquet(logDir)
    val tPk = System.nanoTime()
    val pks = log.select(concat_ws("/", col("volume"), col("bucket"))
      .as("__pk")).distinct().collect()
    println(f"[bootstrap] phase pk-distinct=${secs(tPk)}%.2fs n=${pks.length}")
    Seq("filesize" -> (() => graft.streaming.ChangeStream.fileSizeDeltas(log)),
        "counts" -> (() => graft.streaming.ChangeStream.countsDeltas(log)),
        "nssummary" -> (() => graft.streaming.ChangeStream.nsSummaryDeltas(log)))
      .foreach { case (n, f) =>
        val t = System.nanoTime()
        f().write.mode("overwrite")
          .parquet(graft.core.TempDirs.create(s"graft_bsp_${n}_"))
        println(f"[bootstrap] phase $n=${secs(t)}%.2fs")
      }
    spark.stop()
  }
}
