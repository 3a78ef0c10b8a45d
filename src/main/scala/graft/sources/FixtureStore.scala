package graft.sources

import java.nio.file.{Files, Path}

/** Shared per-JVM fixture materialization for the derived-source family
  * ([[Jsonl]], [[FileFormats]], [[KVSnapshot]]'s snapshots): one temp
  * root per store, counter-named subdirs (NOT input hashCodes — 32-bit
  * collisions would alias two datasets' fixtures), a synchronized
  * write-once memo, and RECURSIVE deletion at JVM exit (a bare
  * `deleteOnExit` on the root silently no-ops on non-empty directories,
  * leaking a full derived copy of the corpus into tmp per JVM run). */
private[graft] final class FixtureStore(prefix: String) {

  private lazy val root: String = {
    val p = Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(
      new Thread(() => FixtureStore.deleteRecursively(p), s"$prefix-cleanup"))
    p.toString
  }
  private val cache = scala.collection.mutable.Map.empty[String, String]
  private val seq = new java.util.concurrent.atomic.AtomicInteger()

  /** The memoized path for `key`; `write` runs at most once per key
    * (inside the lock — derivations are one-time setup, and a racing
    * double-build would waste a Spark job to produce the same bytes). */
  def apply(key: String, subdirPrefix: String)(write: String => Unit): String =
    cache.synchronized {
      cache.getOrElseUpdate(key, {
        val p = s"$root/${subdirPrefix}_${seq.incrementAndGet()}"
        write(p)
        p
      })
    }
}

private[graft] object FixtureStore {

  private val exitDirs = new java.util.concurrent.ConcurrentLinkedQueue[Path]()
  private lazy val exitHook: Unit = Runtime.getRuntime.addShutdownHook(
    new Thread(() => {
      var p = exitDirs.poll()
      while (p != null) { deleteRecursively(p); p = exitDirs.poll() }
    }, "graft-tempdir-cleanup"))

  /** A fresh temp directory deleted at JVM exit through ONE shared
    * shutdown hook — repeat callers (the bench's multi-pass protocol)
    * enqueue dirs instead of accumulating a hook Thread per call. */
  def tempDirDeletedAtExit(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    exitDirs.add(p)
    exitHook
    p.toString
  }

  def deleteRecursively(p: Path): Unit =
    try {
      val walk = Files.walk(p)
      val paths = try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.toSeq.reverse
      } finally walk.close()
      paths.foreach(x => try Files.deleteIfExists(x) catch { case _: Exception => () })
    } catch { case _: Exception => () } // exit-time cleanup is best-effort
}
