package graft.core

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Closed-stream directory listing. `Files.list`/`Files.walk` return
  * streams backed by an OPEN directory file descriptor; consuming the
  * iterator without closing the stream leaks one fd per call. At 32
  * buckets nothing notices; at 2048 buckets a single commit's file
  * listing leaked ~2k fds and the JVM hit EMFILE (error=24) within a few
  * batches — found by PruneBench, the large-table merge scenario.
  */
object Fs {

  def list(p: Path): Seq[Path] = {
    val s = Files.list(p)
    try s.iterator().asScala.toSeq finally s.close()
  }

  def walk(p: Path): Seq[Path] = {
    val s = Files.walk(p)
    try s.iterator().asScala.toSeq finally s.close()
  }

  def isEmptyDir(p: Path): Boolean = {
    val s = Files.list(p)
    try !s.iterator().hasNext finally s.close()
  }

  /** Depth-first delete; no-op if the path does not exist. */
  def deleteRecursively(p: Path): Unit = {
    if (!Files.exists(p)) return
    walk(p).sortBy(-_.getNameCount).foreach(Files.deleteIfExists(_))
  }

  /** Temp dir deleted on JVM exit — scratch inputs synthesized by bench/
    * verify queries would otherwise accrete across runs until the disk
    * fills (observed: a bench child dying on ENOSPC after ~20 runs'
    * leftovers).
    *
    * Root: the `graft.scratch.dir` conf (session conf first, then system
    * property), falling back to java.io.tmpdir. On a real cluster set it
    * to a shared mount so driver-created staging paths (e.g. the s9 zip
    * landing dir, written by executors, scanned by the driver) resolve to
    * the same storage on every host (round-2 verdict #7).
    *
    * One STATIC shutdown hook drains a concurrent list of registered
    * paths: the previous hook-per-call design accumulated one hook THREAD
    * per scratch dir, and ChangeGen registers one per chunk (round-2
    * advice).
    */
  def scratchDir(prefix: String): String = {
    val root = scala.util.Try(
        org.apache.spark.sql.SparkSession.active.conf.get("graft.scratch.dir"))
      .toOption
      .orElse(sys.props.get("graft.scratch.dir"))
    val d = root match {
      case Some(r) =>
        Files.createDirectories(java.nio.file.Paths.get(r))
        Files.createTempDirectory(java.nio.file.Paths.get(r), prefix)
      case None => Files.createTempDirectory(prefix)
    }
    registerScratch(d)
    d.toString
  }

  private val scratchPaths = new java.util.concurrent.ConcurrentLinkedQueue[Path]()
  private lazy val scratchHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      var p = scratchPaths.poll()
      while (p != null) { deleteRecursively(p); p = scratchPaths.poll() }
    }, "graft-scratch-cleanup"))

  private def registerScratch(p: Path): Unit = {
    scratchHook
    scratchPaths.add(p)
    ()
  }
}
