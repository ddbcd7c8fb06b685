package graft.tools

/** Dump a declared query's DuckDB oracle SQL to a file (or stdout) so it
  * can be exercised against DuckDB directly while iterating — the same
  * text the driver's correctness gate runs. Usage:
  *   runMain graft.tools.OracleDump q_sst_diff [/tmp/out.sql]
  */
object OracleDump {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("query name required"))
    val sql = graft.SparkEntry.oracleSql.getOrElse(name,
      sys.error(s"no oracle for $name"))
    if (args.length > 1)
      java.nio.file.Files.writeString(java.nio.file.Paths.get(args(1)), sql)
    else println(sql)
  }
}
