package graft.tools

/** Mint CANON_PINS.txt — the cross-round flagship-answer pins the bench
  * re-verifies every run (Bench.canonPinsCheck, VERDICT r14 #7) — from a
  * SEALED bench cache: copies the canon.* entries out of the newest SEAL
  * under the cache root and stamps them with the CURRENT testdata
  * content fingerprint. Run after a fully-verified bench (rebuild or
  * reverify) on the code being committed; commit the file alongside.
  * Usage: runMain graft.tools.CanonPins [sfDir]
  * (default /root/testdata/sf0.1). */
object CanonPins {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val sfName = new java.io.File(sfDir).getName
    val root = sys.env.getOrElse("SPARK_GRAFT_CACHE_DIR",
      sys.props("user.dir") + "/target/bench_cache")
    val data = graft.BenchCache.dataFingerprint(sfDir)
    // only generations whose KEY embeds the CURRENT data fingerprint
    // qualify (review r15): after a testdata regeneration a stale
    // pre-rotation generation can still be on disk, and minting ITS
    // signatures under the new fingerprint would bake a false
    // InvariantViolation into the committed pins
    val sealedGens = Option(new java.io.File(root).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.endsWith(s"-$sfName") &&
        f.getName.contains(s"-$data-") &&
        new java.io.File(f, "SEAL").exists())
    require(sealedGens.nonEmpty,
      s"no sealed cache generation for $sfName matching the CURRENT " +
        s"testdata fingerprint $data under $root — run a full bench " +
        "(rebuild/reverify) on the current data first")
    val gen = sealedGens.maxBy(f => new java.io.File(f, "SEAL").lastModified())
    val canon = java.nio.file.Files
      .readAllLines(new java.io.File(gen, "SEAL").toPath)
      .toArray(Array.empty[String]).filter(_.startsWith("canon."))
    require(canon.nonEmpty, s"SEAL in $gen carries no canon.* entries")
    val out = (Seq(s"data=$data", s"sf=$sfName") ++ canon.sorted)
      .mkString("", "\n", "\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("CANON_PINS.txt"), out)
    print(out)
    System.err.println(s"[pins] wrote CANON_PINS.txt from ${gen.getName}")
  }
}
