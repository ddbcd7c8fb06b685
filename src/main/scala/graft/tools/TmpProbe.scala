package graft.tools

import org.apache.spark.sql.functions._

object TmpProbe {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = graft.core.GraftSession.local(32)
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-24s ${(System.nanoTime()-t0)/1e9}%.2f s  rows=$n")
    }
    import graft.core.{Tables => T}
    import graft.operators.Aggregates
    t("objectsMixed.count")(T.objectsMixed(spark, d).count())
    t("deletedDirs.count")(T.deletedDirs(spark, d).count())
    val leaf = T.objectsMixed(spark, d)
      .withColumn("leaf", Aggregates.parentDirOf("key"))
      .filter(col("leaf") =!= "")
      .groupBy("volume", "bucket", "leaf")
      .agg(count(lit(1)).as("nf"), sum("data_size").as("sz"))
    t("leafAgg.count")(leaf.count())
    t("leafAgg.count 2nd")(leaf.count())
    val expl = leaf.withColumn("dir", explode(Aggregates.dirAndAncestors("leaf")))
    t("explode.count")(expl.count())
    val joined = expl.join(broadcast(T.deletedDirs(spark, d)), Seq("volume","bucket","dir"))
    t("join.count")(joined.count())
    t("full insight")(graft.operators.ClusterHealth.deletedDirsInsight(
      T.objectsMixed(spark, d), T.deletedDirs(spark, d)).count())
    t("full insight 2nd")(graft.operators.ClusterHealth.deletedDirsInsight(
      T.objectsMixed(spark, d), T.deletedDirs(spark, d)).count())
    spark.stop()
  }
}
