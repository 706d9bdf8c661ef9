package graft

import graft.sources.ZipArchive
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

class ZipArchiveSpec extends AnyFunSuite {

  test("round trip, directory entries skipped, empty archive") {
    val dir = TestSpark.tempDir("zip")
    val p = s"$dir/a.zip"
    ZipArchive.writeZip(p, Iterator(
      ("docs/", Array.emptyByteArray), // dir entry — reader must skip it
      ("docs/x.txt", "hello".getBytes("UTF-8")),
      ("y.bin", Array[Byte](0, 1, 2))))
    val got = ZipArchive.entries(Files.readAllBytes(Paths.get(p))).toSeq
    assert(got.map(_._1) == Seq("docs/x.txt", "y.bin"))
    assert(new String(got.head._2, "UTF-8") == "hello")
    assert(got(1)._2.toSeq == Seq[Byte](0, 1, 2))

    // deterministic bytes: same members → byte-identical archive
    val p2 = s"$dir/b.zip"
    ZipArchive.writeZip(p2, Iterator(("m.txt", "v".getBytes)))
    val p3 = s"$dir/c.zip"
    ZipArchive.writeZip(p3, Iterator(("m.txt", "v".getBytes)))
    assert(Files.readAllBytes(Paths.get(p2)).toSeq ==
      Files.readAllBytes(Paths.get(p3)).toSeq)
    // mtime pinning asserted directly: two back-to-back writes usually
    // fall in one 2-second DOS-time window, so byte-equality alone would
    // miss a regression to wall-clock entry times (round-2 test review)
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(Files.readAllBytes(Paths.get(p2))))
    val entryTime = zin.getNextEntry.getTime
    zin.close()
    assert(entryTime < 631152000000L, s"entry mtime $entryTime is not pinned")

    // empty archive → no rows, no error
    val p4 = s"$dir/empty.zip"
    ZipArchive.writeZip(p4, Iterator.empty)
    assert(ZipArchive.entries(Files.readAllBytes(Paths.get(p4))).isEmpty)
  }
}
