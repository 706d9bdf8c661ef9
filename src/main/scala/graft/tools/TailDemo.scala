package graft.tools
import graft.cdc.CdcStream
import graft.core.ChangeGen
import graft.lake.LakeTable
object TailDemo {
  def main(args: Array[String]): Unit = {
    val spark = ProfileCdc.session(8)
    val log = java.nio.file.Files.createTempDirectory("tail-log").toString
    ChangeGen.writeLog(spark,
      ChangeGen.Config(nEvents = 60000, nDomains = 50, pagesPerDomain = 20,
        v1Frac = 0, v2Frac = 0), log, 4)
    val dir = java.nio.file.Files.createTempDirectory("tail-table").toString
    LakeTable.create(spark, dir, schemaId = 3, numBuckets = 8)
    CdcStream.tailAll(spark, log, dir,
      java.nio.file.Files.createTempDirectory("tail-ck").toString)
    val t = LakeTable.load(spark, dir)
    println(s"TAIL_DEMO version=${t.currentVersion} rows=${t.readUser().count()} " +
      s"lastEpoch=${t.lastCommittedEpoch} summary=${t.currentSnapshot.summary}")
    spark.stop()
  }
}
