package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe for cross-engine primitives (not part of the library). */
object ParityProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // 1. md5-prefix → long token hash
    Seq("hello", "tok").toDF("s")
      .select(col("s"), expr("CAST(conv(substring(md5(s),1,15),16,10) AS BIGINT) AS h"))
      .show(false)
    // 2. regexp_extract_all token count + lambdas
    Seq("a b  c the d").toDF("t").select(
      expr("size(regexp_extract_all(t, '\\\\S+', 0)) AS ntok"),
      expr("size(filter(split(t, ' +'), x -> x IN ('the','a'))) AS nstop"),
      expr("length(regexp_replace(t, '\\\\s', '')) AS nchar")).show(false)
    // 3. float array → quantized bigint + dot product
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    e.select(col("vec_id"),
      expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv"))
      .select(col("vec_id"),
        expr("aggregate(zip_with(qv, qv, (a, b) -> a * b), CAST(0 AS BIGINT), (acc, x) -> acc + x) AS nrm"))
      .orderBy("vec_id").show(3)
    // 4. bit ops
    spark.sql("SELECT shiftright(CAST(11 AS BIGINT), 1) & 1 AS b, bit_count(CAST(11 AS BIGINT) ^ CAST(5 AS BIGINT)) AS bc").show()
    // 5. events ns timestamp read
    try {
      val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      ev.printSchema()
      ev.select(col("ts"), unix_millis(col("ts").cast("timestamp")).as("ms")).show(3, false)
    } catch { case ex: Throwable => println("EVENTS READ FAILED: " + ex.getMessage.take(300)) }
    spark.stop()
  }
}
