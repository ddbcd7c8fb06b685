package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Also emits HASHES.json — a per-query sha256 over the canonicalized
  * result (columns sorted by name, rows sorted, values rendered with the
  * same rules as tools/oracle_check.py) — and target/verify_canon/<name>
  * .txt row dumps (capped), so any driver-side hash mismatch can be
  * pinpointed to the exact differing rows instead of a one-bit verdict.
  */
object Verify {
  // repo-relative (sbt runs from the project root), NOT outDir-relative:
  // the driver enumerates outDir subdirectories as query results
  private val canonDir =
    s"${sys.props("user.dir")}/target/verify_canon"

  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [queryName...] — with names given, dump only
    // that subset (the full oracle_sql.json is written either way)
    val sfDir = args(0)
    val outDir = args(1)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = graft.core.GraftSession.local(cpus)
    new java.io.File(outDir).mkdirs()
    // Canon row dumps live OUTSIDE outDir: the driver enumerates outDir
    // subdirectories as query results, and r8's in-tree canon/ produced a
    // spurious "canon" row with a pyarrow read error in CORRECTNESS_r08.
    // Cleared per run so a mismatch is never diagnosed against a stale
    // dump from a different (sfDir, subset) invocation.
    val cd = new java.io.File(canonDir)
    if (cd.exists()) cd.listFiles().foreach(_.delete())
    cd.mkdirs()
    val hashes = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only.contains(name) }
      .foreach { case (name, fn) =>
        try {
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          hashes(name) = canonDump(spark, name, outDir)
        }
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    Files.writeString(Paths.get(s"$outDir/HASHES.json"),
      hashes.map { case (k, v) => s"${q(k)}: ${q(v)}" }
        .mkString("{", ",", "}"))
    spark.stop()
  }

  /** Read the just-written parquet back, canonicalize exactly like the
    * oracle gate (cols sorted by name, one \x01-joined line per row,
    * lines sorted, sha256 over line+\n), write the capped line dump to
    * canon/<name>.txt, return "<nRows>:<sha256hex>". */
  private def canonDump(spark: SparkSession, name: String,
                        outDir: String): String = {
    val df = spark.read.parquet(s"$outDir/$name")
    val cols = df.columns
    val idx = cols.indices.sortBy(cols)
    val lines = df.collect().map { row =>
      idx.map(i => canon(row.get(i))).mkString("\u0001")
    }.sorted
    val md = java.security.MessageDigest.getInstance("SHA-256")
    lines.foreach { l => md.update(l.getBytes("UTF-8")); md.update('\n'.toByte) }
    val hex = md.digest().map(b => f"$b%02x").mkString
    val cap = 5000
    val dump = new StringBuilder
    dump ++= s"# $name rows=${lines.length} sha256=$hex\n"
    dump ++= s"# cols(sorted)=${idx.map(cols).mkString(",")}\n"
    if (lines.length > cap) dump ++= s"# TRUNCATED to first $cap of ${lines.length}\n"
    lines.take(cap).foreach { l => dump ++= l.replace('\u0001', '|'); dump += '\n' }
    Files.writeString(Paths.get(s"$canonDir/$name.txt"), dump.toString)
    s"${lines.length}:$hex"
  }

  /** Python-canon-compatible value rendering (tools/oracle_check.py):
    * NULL, true/false, integral floats as ints, other floats %.9g with
    * C-style trailing-zero strip; everything else toString (exact for
    * int/string — the only other types the gate queries emit). */
  def canon(v: Any): String = v match {
    case null => "NULL"
    case b: Boolean => if (b) "true" else "false"
    case d: Double => canonFloat(d)
    case f: Float => canonFloat(f.toDouble)
    case d: java.math.BigDecimal => d.toString
    case s: Seq[_] => s.map(canonInner).mkString("[", ", ", "]")
    case other => other.toString
  }
  // Python str() of a list reprs its elements (strings get quotes)
  private def canonInner(v: Any): String = v match {
    case s: String => "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
    case null => "None"
    case b: Boolean => if (b) "True" else "False"
    case other => canon(other)
  }
  private def canonFloat(d: Double): String = {
    if (d.isNaN) return "nan"
    if (d.isInfinite) return if (d > 0) "inf" else "-inf"
    if (d == math.rint(d) && math.abs(d) < 1e15) return d.toLong.toString
    // Python f"{v:.9g}": %g semantics strip trailing zeros; Java's %g
    // does not, so strip them here (mantissa only when in e-notation).
    val g = String.format("%.9g", Double.box(d))
    val (mant, exp) = g.indexOf('e') match {
      case -1 => (g, "")
      case i  => (g.substring(0, i), g.substring(i))
    }
    val m = if (mant.contains('.'))
      mant.reverse.dropWhile(_ == '0').reverse.stripSuffix(".")
    else mant
    m + exp
  }
}
