package graft.core

/**
 * Temp-dir factory for the per-JVM derived warehouses (key-sorted runs,
 * FSO tables, snapshot checkpoints, index artifacts). Every dir registers
 * a JVM shutdown hook for deletion — repeated sbt invocations (tests,
 * verify, bench, probes) used to leave hundreds of orphaned
 * `/tmp/graft_*` dirs behind per round.
 */
object TempDirs {
  private val created = new java.util.concurrent.ConcurrentLinkedQueue[String]

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    created.forEach { p =>
      try graft.streaming.ChangeStream.deleteRecursively(
        java.nio.file.Paths.get(p))
      catch { case _: Throwable => () } // best-effort cleanup
    }
  }))

  def create(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix).toString
    created.add(p)
    p
  }
}
