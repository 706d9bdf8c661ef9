package graft

import org.scalatest.funsuite.AnyFunSuite

/** Scratch staging root resolution (round-2 verdict #7): a cluster
  * deployment points graft.scratch.dir at shared storage so driver-made
  * staging paths resolve on every host; locally it defaults to
  * java.io.tmpdir.
  */
class FsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("scratchDir roots itself under graft.scratch.dir when set") {
    val root = TestSpark.tempDir("scratch-root")
    spark.conf.set("graft.scratch.dir", root)
    try {
      val d = graft.core.Fs.scratchDir("fs-spec")
      assert(d.startsWith(root), s"$d not under $root")
      assert(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(d)))
    } finally spark.conf.unset("graft.scratch.dir")
    // default path: plain temp dir, still created
    val d2 = graft.core.Fs.scratchDir("fs-spec")
    assert(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(d2)))
    assert(!d2.startsWith(root))
  }
}
