package graft

import graft.lake.{DataFile, LakeTable, Snapshot}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

class LakeTableSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("create → commit chain → time travel; concurrent commit loses cleanly") {
    val dir = TestSpark.tempDir("lake")
    val t = LakeTable.create(spark, dir, schemaId = 2, numBuckets = 4)
    assert(t.currentVersion == 0)
    val s0 = t.currentSnapshot
    t.commit(Snapshot(1, 2, 4, Nil, Map("batch-epoch" -> "0")))
    assert(t.currentVersion == 1)
    assert(t.lastCommittedEpoch.contains(0L))
    // optimistic concurrency: same version again must fail, table intact
    intercept[IllegalStateException] {
      t.commit(Snapshot(1, 2, 4, Nil, Map("batch-epoch" -> "99")))
    }
    assert(t.currentVersion == 1 && t.lastCommittedEpoch.contains(0L))
    // time travel still sees v0
    assert(t.snapshot(0).summary.get("created").contains("true"))
    assert(t.read(s0).isEmpty)
  }

  test("schema alignment: v2 files (content_len INT, with lang) readable after v3 widening") {
    import spark.implicits._
    val dir = TestSpark.tempDir("lake")
    val t = LakeTable.create(spark, dir, schemaId = 2, numBuckets = 1)
    // write a v2-schema data file by hand (content_len is INT in v2)
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val df = Seq(("https://a/1", ts, Array[Byte](1), "t", "en", 42, 7L, "U"))
      .toDF("url", "warc_ts", "html", "text", "lang", "content_len", "_lsn", "_op")
    val f = dir + "/data/manual"
    df.write.parquet(f)
    val part = Files.list(Paths.get(f)).toArray.map(_.toString)
      .find(_.endsWith(".parquet")).get
    t.commit(Snapshot(1, 2, 1, Seq(DataFile(part, 0, 1, 0, 2)), Map("batch-epoch" -> "0")))
    // evolve to v3 (content_len widens to LONG) — old file carried forward
    t.commit(Snapshot(2, 3, 1, Seq(DataFile(part, 0, 1, 0, 2)), Map("batch-epoch" -> "1")))
    val got = t.read()
    assert(got.schema("content_len").dataType.typeName == "long")
    assert(got.select("content_len").head().getLong(0) == 42L)
    // v1-era read (time travel) keeps the old schema
    assert(t.read(t.snapshot(1)).schema("content_len").dataType.typeName == "integer")
  }

  test("orphan data files (crash between phases) never corrupt the table") {
    val dir = TestSpark.tempDir("lake")
    val t = LakeTable.create(spark, dir, schemaId = 3, numBuckets = 2)
    // phase 1 only: data written, no manifest published
    val orphan = t.newCommitDir(epoch = 5)
    Files.writeString(Paths.get(orphan, "junk.parquet"), "not parquet")
    assert(t.currentVersion == 0)
    assert(t.read().isEmpty) // reader never looks at unreferenced files
  }
}
