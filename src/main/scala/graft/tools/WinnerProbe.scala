package graft.tools

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.expressions.Window

/** Dev-only: min_by hash/sort aggregate vs row_number()=1 WindowGroupLimit
  * for the latest-version-wins winner-per-key site, at 1x and 10x. */
object WinnerProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.GraftSession.local(cpus)
    val T = graft.core.Tables
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[probe] $name%-30s ${(System.nanoTime()-t0)/1e9}%.2f s  (rows=$n)")
    }
    def scale10(df: org.apache.spark.sql.DataFrame) =
      graft.core.Tables.namespaceScaled10(df)

    def windowForm(objects: org.apache.spark.sql.DataFrame) = {
      val lvKey = F.concat_ws("/", F.slice(F.split(F.col("key"), "/"), 1, 3))
      val w = Window.partitionBy("volume", "bucket", "lv_key")
        .orderBy(F.col("version").desc, F.col("key"), F.col("data_size").desc)
      objects.withColumn("lv_key", lvKey)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") === 1)
        .select("volume", "bucket", "lv_key", "key", "version", "data_size")
    }

    spark.range(10).count()
    val obj1 = T.objects(spark, sfDir).localCheckpoint()
    time("min_by 1x")(graft.operators.Lifecycle.latestVersionWins(obj1).count())
    time("window 1x")(windowForm(obj1).count())
    time("min_by 1x again")(graft.operators.Lifecycle.latestVersionWins(obj1).count())
    time("window 1x again")(windowForm(obj1).count())
    val obj10 = scale10(T.objects(spark, sfDir)).localCheckpoint()
    time("min_by 10x")(graft.operators.Lifecycle.latestVersionWins(obj10).count())
    time("window 10x")(windowForm(obj10).count())
    time("min_by 10x again")(graft.operators.Lifecycle.latestVersionWins(obj10).count())
    time("window 10x again")(windowForm(obj10).count())
    // the declared query's path: zero-shuffle fold over the sorted layout
    val wh = graft.core.TempDirs.create("graft_wp_")
    obj10.repartition(F.col("volume"), F.col("bucket"))
      .sortWithinPartitions(F.col("volume"), F.col("bucket"), F.col("key"))
      .write.partitionBy("volume", "bucket").mode("overwrite").parquet(wh)
    val sorted10 = spark.read.parquet(wh)
    time("sorted fold 10x")(
      graft.operators.Lifecycle.latestVersionWinsSorted(sorted10).count())
    time("sorted fold 10x again")(
      graft.operators.Lifecycle.latestVersionWinsSorted(sorted10).count())
    graft.streaming.ChangeStream.deleteRecursively(java.nio.file.Paths.get(wh))
    spark.stop()
  }
}
