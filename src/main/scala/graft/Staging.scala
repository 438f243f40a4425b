package graft

/** JVM-lifetime memoized temp-dir staging — the shared "lake snapshot"
  * scratch behind Io's round-trip staging, streaming file sinks, and
  * Dedup's CC-label registry.
  *
  * Contract: `dir(key, tag)(write)` runs `write` into a fresh temp
  * directory ONCE per key and returns the same path for the JVM's
  * lifetime. Like every lake-snapshot cache here (Ann.codebooks), it
  * assumes the source data a key derives from is immutable while the
  * process lives. ONE shutdown hook deletes every staged tree, so
  * scratch never accumulates across processes regardless of which
  * module staged it.
  */
object Staging {

  private val staged =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  // registered at object init — any dir() call initializes the object
  // first, so the hook always exists before a tree does
  private val cleanup: Thread = {
    val th = new Thread(() => staged.values.forEach { d =>
      try deleteTree(java.nio.file.Paths.get(d)) catch { case _: Exception => }
    }, "graft-staging-cleanup")
    Runtime.getRuntime.addShutdownHook(th)
    th
  }

  /** The staged path for `key`, materializing it via `write` on first
    * use. `tag` only names the temp dir (debuggability).
    */
  def dir(key: String, tag: String)(write: String => Unit): String =
    staged.computeIfAbsent(key, { _ =>
      val d = java.nio.file.Files
        .createTempDirectory(s"graft_${tag}_").toString
      write(d)
      d
    })

  /** The staged path for `key`, if this JVM landed it — spec access. */
  def lookup(key: String): Option[String] = Option(staged.get(key))

  private[graft] def deleteTree(p: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.isDirectory(p)) {
      val s = java.nio.file.Files.list(p)
      try s.forEach(deleteTree) finally s.close()
    }
    java.nio.file.Files.deleteIfExists(p)
    ()
  }
}
