package graft

/** Shared test helper: the surviving reliable-checkpoint `rdd-*` dirs
  * under a checkpoint root. Checkpoints.Loop's keep-last-k rotation
  * bound is asserted in three suites (CheckpointsSpec,
  * BpeTokenizerSpec, ConnectedComponentsSpec) — one walker, not three,
  * so a change to how rotation is asserted cannot silently diverge. */
object CkptDirs {
  def rddDirs(dir: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    // Files.walk streams hold open directory handles — close them
    val s = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
    try s.forEach { p =>
      if (java.nio.file.Files.isDirectory(p) &&
        p.getFileName.toString.startsWith("rdd-")) out += p.toString
    } finally s.close()
    out.toSeq
  }
}
