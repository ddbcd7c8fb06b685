package graft.tools



/** Dev-only: time the 100× dedup verification-index build (LSH candidates
  * → exact jaccard verify → cluster fixpoint) in isolation — the r12
  * sf10 block's dominant ingest cost (525 s with the explode-join
  * verification; this probe measures the array_intersect plan). */
object JaccProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val mult = if (args.length > 1) args(1).toInt else 100
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.GraftSession.local(cpus)
    val T = graft.core.Tables
    def secs(t0: Long) = (System.nanoTime() - t0) / 1e9
    val wh = graft.core.TempDirs.create("graft_jaccp_")
    // the probes' shared corpus synthesis — same definition Bench uses
    T.docsScaled(T.documents(spark, sfDir), mult)
      .write.mode("overwrite").parquet(wh + "/docs")
    val docs = spark.read.parquet(wh + "/docs")
    val tBands = System.nanoTime()
    graft.operators.Dedup.minhashBands(docs)
      .write.mode("overwrite").parquet(wh + "/bands")
    println(f"[probe] bands build ${secs(tBands)}%.2f s")
    val bands = spark.read.parquet(wh + "/bands")
    println(s"[probe] corpus ${docs.count()} docs")
    val tP = System.nanoTime()
    graft.operators.Dedup.ngramJaccardPairs(docs,
        candidates = Some(graft.operators.Dedup.lshPairsFromBands(bands)))
      .write.mode("overwrite").parquet(wh + "/pairs")
    println(f"[probe] verify (pairs write) ${secs(tP)}%.2f s  " +
      s"(${spark.read.parquet(wh + "/pairs").count()} pairs)")
    val tC = System.nanoTime()
    graft.operators.Dedup.dupClusters(docs.select("doc_id"),
        spark.read.parquet(wh + "/pairs"))
      .write.mode("overwrite").parquet(wh + "/clusters")
    println(f"[probe] clusters ${secs(tC)}%.2f s")
    graft.streaming.ChangeStream.deleteRecursively(
      java.nio.file.Paths.get(wh))
    spark.stop()
  }
}
