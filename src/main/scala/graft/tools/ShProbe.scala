package graft.tools

/** Dev-only: time the simhash pieces at a given corpus multiple — the
  * signature build (ingest) and the pigeonhole pair join (the query)
  * separately, mirroring the Bench probe split. */
object ShProbe {
  def main(args: Array[String]): Unit = {
    val mult = if (args.nonEmpty) args(0).toInt else 100
    val spark = graft.core.GraftSession.local(32)
    val T = graft.core.Tables
    def secs(t0: Long) = (System.nanoTime() - t0) / 1e9
    val wh = graft.core.TempDirs.create("graft_shp_")
    T.docsScaled(T.documents(spark, "/root/testdata/sf0.1"), mult)
      .write.mode("overwrite").parquet(wh + "/docs")
    val docs = spark.read.parquet(wh + "/docs")
    val tS = System.nanoTime()
    graft.operators.Dedup.simhash(docs)
      .write.mode("overwrite").parquet(wh + "/sigs")
    println(f"[shp] sig build ${secs(tS)}%.2f s")
    val sigs = spark.read.parquet(wh + "/sigs")
    graft.operators.Dedup.simhashPairsFromSigs(sigs).count() // warm
    val reps = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      val n = graft.operators.Dedup.simhashPairsFromSigs(sigs).count()
      (secs(t0), n)
    }
    println(f"[shp] pair join ${mult}x min ${reps.map(_._1).min}%.2f s " +
      s"(reps ${reps.map(r => f"${r._1}%.2f").mkString(", ")}; " +
      s"pairs ${reps.head._2})")
    graft.streaming.ChangeStream.deleteRecursively(
      java.nio.file.Paths.get(wh))
    spark.stop()
  }
}
