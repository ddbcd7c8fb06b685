package graft.tools
import org.apache.spark.sql.functions._
object DbgFold {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(4)
    val sf = "/root/testdata/sf0.001"
    val exp = graft.operators.Aggregates.nsSummary(graft.core.Tables.objectsMixed(spark, sf))
    val got = graft.operators.Aggregates.nsSummarySorted(graft.core.Tables.objectsMixedSorted(spark, sf))
    println("exp rows=" + exp.count() + " got rows=" + got.count())
    val e = exp.withColumnRenamed("num_files","e_nf").withColumnRenamed("size_of_files","e_sz").withColumnRenamed("replicated_size","e_rs")
    val j = got.join(e, Seq("volume","bucket","dir"), "full_outer")
      .filter(coalesce(col("num_files"),lit(-1)) =!= coalesce(col("e_nf"),lit(-1)) ||
              coalesce(col("size_of_files"),lit(-1)) =!= coalesce(col("e_sz"),lit(-1)))
    println("mismatches=" + j.count())
    j.show(20, false)
    // duplicate dirs in got?
    got.groupBy("volume","bucket","dir").count().filter(col("count") > 1).show(10, false)
    spark.stop()
  }
}
