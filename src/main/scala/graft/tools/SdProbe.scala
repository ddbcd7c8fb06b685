package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only: ablate storageDistribution's component aggregates to find
  * where its wall-clock goes. Usage: runMain graft.tools.SdProbe [sfDir] */
object SdProbe {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val T = graft.core.Tables
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[sd] $name%-18s ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    // warm the session + memo stores
    T.buckets(spark, d).count(); T.deletedDirs(spark, d).count()
    for (rep <- 1 to 2) {
      println(s"--- rep $rep")
      time("datanodes") { T.datanodes(spark, d).agg(sum("capacity")).count() }
      time("keys_agg") { T.objects(spark, d).agg(sum("replicated_size")).count() }
      time("open_agg") { T.openKeys(spark, d).agg(sum("replicated_size")).count() }
      time("mpu_agg") { T.multipartParts(spark, d).agg(sum("size")).count() }
      time("leaf_only") {
        T.objectsMixed(spark, d)
          .withColumn("segs",
            expr("slice(split(key, '/'), 1, size(split(key, '/')) - 1)"))
          .filter(size(col("segs")) >= 1)
          .groupBy(col("volume"), col("bucket"),
            array_join(col("segs"), "/").as("leaf"))
          .agg(sum("replicated_size").as("rs")).count()
      }
      time("leaf_explode") {
        T.objectsMixed(spark, d)
          .withColumn("segs",
            expr("slice(split(key, '/'), 1, size(split(key, '/')) - 1)"))
          .filter(size(col("segs")) >= 1)
          .groupBy(col("volume"), col("bucket"),
            array_join(col("segs"), "/").as("leaf"))
          .agg(sum("replicated_size").as("rs"))
          .withColumn("dir",
            explode(graft.operators.Aggregates.dirAndAncestors("leaf")))
          .count()
      }
      time("ns_summary") {
        graft.operators.Aggregates.nsSummary(T.objectsMixed(spark, d))
          .count()
      }
      time("dir_rollup") {
        T.objectsMixed(spark, d)
          .withColumn("segs",
            expr("slice(split(key, '/'), 1, size(split(key, '/')) - 1)"))
          .filter(size(col("segs")) >= 1)
          .groupBy(col("volume"), col("bucket"),
            array_join(col("segs"), "/").as("leaf"))
          .agg(sum("replicated_size").as("rs"))
          .withColumn("dir",
            explode(graft.operators.Aggregates.dirAndAncestors("leaf")))
          .join(broadcast(T.deletedDirs(spark, d)
            .select("volume", "bucket", "dir")), Seq("volume", "bucket", "dir"))
          .agg(coalesce(sum("rs"), lit(0L))).count()
      }
      time("full_query") {
        graft.operators.ClusterHealth.storageDistribution(
          T.datanodes(spark, d), T.objects(spark, d), T.objectsMixed(spark, d),
          T.openKeys(spark, d), T.multipartParts(spark, d),
          T.deletedDirs(spark, d)).count()
      }
    }
    spark.stop()
  }
}
