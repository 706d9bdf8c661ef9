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
    */
  def scratchDir(prefix: String): String = {
    val d = Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(d)))
    d.toString
  }
}
