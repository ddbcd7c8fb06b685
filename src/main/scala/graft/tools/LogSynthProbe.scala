package graft.tools

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.functions._

/** Dev-only: A/B the single-scan (explode) vs 4-union commit-log synthesis
  * under the sf1 (10x) write-apply probe, interleaved in one JVM. */
object LogSynthProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.GraftSession.local(cpus)
    val T = graft.core.Tables
    def secs(t0: Long) = (System.nanoTime() - t0) / 1e9
    def scale10(df: org.apache.spark.sql.DataFrame) =
      graft.core.Tables.namespaceScaled10(df)

    // the pre-change 4-union synthesis, kept verbatim for the A/B
    def synthesizeLogUnion(objects: org.apache.spark.sql.DataFrame) = {
      val base = objects.select(
        col("volume"), col("bucket"), col("key"), col("object_id"),
        col("container_id"), col("data_size"), col("version"))
      val churned = expr("(object_id DIV 10) % 10") === 0
      val creates = base.select(lit(1L).as("seq"), lit("PUT").as("op"),
        col("volume"), col("bucket"), col("key"), col("object_id"),
        col("container_id"), col("data_size"))
      val overwrites = base
        .filter((col("version") === 3 || col("version") === 6) && churned)
        .select(lit(2L).as("seq"), lit("PUT").as("op"),
          col("volume"), col("bucket"), col("key"), col("object_id"),
          col("container_id"), (col("data_size") * 2).as("data_size"))
      val deletes = base
        .filter((col("version") === 4 || col("version") === 5) && churned)
        .select(lit(3L).as("seq"), lit("DELETE").as("op"),
          col("volume"), col("bucket"), col("key"), col("object_id"),
          col("container_id"), col("data_size"))
      val renames = base.filter(col("version") === 5 && churned)
        .select(lit(4L).as("seq"), lit("PUT").as("op"),
          col("volume"), col("bucket"),
          concat(col("key"), lit(".mv")).as("key"), col("object_id"),
          col("container_id"), col("data_size"))
      creates.unionByName(overwrites).unionByName(deletes)
        .unionByName(renames)
    }

    spark.range(10).count()
    val obj10 = scale10(T.objects(spark, sfDir))
    val last = graft.operators.CommitLog.Snapshots.last._2
    for (rep <- 1 to 3) {
      for ((name, log) <- Seq(
        "union4" -> synthesizeLogUnion(obj10),
        "explode1" -> graft.operators.CommitLog.synthesizeLog(obj10))) {
        val t0 = System.nanoTime()
        val n = graft.operators.CommitLog.applyAt(log, last)
          .orderBy("volume", "bucket", "key", "data_size").count()
        println(f"[probe] rep$rep $name%-9s ${secs(t0)}%.2f s (rows=$n)")
      }
    }
    spark.stop()
  }
}
