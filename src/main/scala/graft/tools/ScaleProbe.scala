package graft.tools

import org.apache.spark.sql.{functions => F}

/** Dev-only: decompose the sf1 (10x) scale-probe cost of q_ns_summary. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.GraftSession.local(cpus)
    val T = graft.core.Tables
    def secs(t0: Long) = (System.nanoTime() - t0) / 1e9
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[probe] $name%-30s ${secs(t0)}%.2f s  (rows=$n)")
    }
    def scale10(df: org.apache.spark.sql.DataFrame) =
      graft.core.Tables.namespaceScaled10(df)

    spark.range(10).count()
    val obj10 = scale10(T.objects(spark, sfDir))
    val tI = System.nanoTime()
    val wh10 = graft.core.TempDirs.create("graft_sf1p_")
    obj10.repartition(F.col("volume"), F.col("bucket"))
      .sortWithinPartitions(F.col("volume"), F.col("bucket"), F.col("key"))
      .write.partitionBy("volume", "bucket").mode("overwrite").parquet(wh10)
    println(f"[probe] ingest ${secs(tI)}%.2f s")
    val sorted10 = spark.read.parquet(wh10)
    time("nsSummarySorted 10x")(graft.operators.Aggregates.nsSummarySorted(sorted10).count())
    time("nsSummarySorted 10x again")(graft.operators.Aggregates.nsSummarySorted(sorted10).count())
    time("declarative nsSummary 10x")(graft.operators.Aggregates.nsSummary(sorted10).count())
    graft.streaming.ChangeStream.deleteRecursively(java.nio.file.Paths.get(wh10))
    spark.stop()
  }
}
