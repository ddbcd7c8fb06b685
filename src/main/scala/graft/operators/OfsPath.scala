package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * ofs:// rooted-filesystem path resolution — the HCFS surface's path →
 * (volume, bucket, key) mapping (OFSPath.java:100-150 initOFSPath):
 *   - tokens split on '/' with empty tokens collapsed (StringTokenizer
 *     semantics — consecutive delimiters merge);
 *   - zero tokens → the root (a listing of volumes);
 *   - first token `tmp` → the temp mount: volume is the hard-coded `tmp`,
 *     bucket is md5(username) (OFSPath.java:345-350
 *     getTempMountBucketName), and the key starts at the second token;
 *   - otherwise one token → volume level, two → bucket level, the rest
 *     joins back into the key, preserving a trailing '/' when the
 *     original path ended with one (fs.Path drops it; the reference
 *     restores it — OFSPath.java:91-93).
 *
 * Scale shape: pure per-row string expressions over the request batch —
 * codegen'd, no join, no shuffle beyond the output sort.
 */
object OfsPath {

  def resolve(reqs: DataFrame): DataFrame =
    reqs
      .withColumn("toks", expr("filter(split(path, '/'), t -> t != '')"))
      .withColumn("n", size(col("toks")))
      .withColumn("mount",
        when(col("n") >= 1 && element_at(col("toks"), 1) === "tmp",
          lit("tmp")).otherwise(lit("")))
      .withColumn("volume",
        when(col("n") === 0, lit(""))
          .when(col("mount") === "tmp", lit("tmp"))
          .otherwise(element_at(col("toks"), 1)))
      .withColumn("bucket",
        when(col("mount") === "tmp", md5(col("username")))
          .when(col("n") >= 2, element_at(col("toks"), 2))
          .otherwise(lit("")))
      .withColumn("key0", expr(
        """array_join(slice(toks,
          |  IF(mount = 'tmp', 2, 3), 1000000), '/')""".stripMargin))
      .withColumn("key_name",
        when(col("key0") =!= "" && col("path").endsWith("/"),
          concat(col("key0"), lit("/"))).otherwise(col("key0")))
      .withColumn("level",
        when(col("n") === 0, lit("ROOT"))
          .when(col("key_name") =!= "", lit("KEY"))
          .when(col("bucket") =!= "", lit("BUCKET"))
          .otherwise(lit("VOLUME")))
      .select("path", "username", "level", "mount", "volume", "bucket",
        "key_name")
      .orderBy("path", "username")
}
