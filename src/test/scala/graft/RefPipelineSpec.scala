package graft

import graft.ops.RefPipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden test of the reference's prediction pipeline (entry point B) on a
  * fixture shaped like the reference's TESLA_OUT CSVs (FIXTURES.md §2.1).
  */
class RefPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("predictionTables: union, cast registry, cleanup, dedup+conflicts, bridges") {
    // ranked rows: RANK as STRING ("1") to exercise the cast registry;
    // epitope with junk chars; duplicate key (s1, fastq, SIINFEKL, A*02:01)
    // at ranks 1 and 2 → conflict routing
    val ranked = Seq(
      ("s1", "fastq", "1", "A*02:01", "siin-fekl1", "v1:v2", "p1;p2", "9"),
      ("s1", "fastq", "2", "A*02:01", "SIINFEKL", "v3", "p3", "8"),
      ("s1", "fastq", "3", "B*07:02", "KVAELVHFL", "v1", null, "7"))
      .toDF("SUBMISSION_ID", "SOURCE", "RANK", "HLA_ALLELE", "ALT_EPI_SEQ",
        "VAR_ID", "PROT_POS", "PEP_LEN")
    // unranked rows: no RANK / PEP_LEN columns at all (bind_rows null-fill);
    // one row with null allele must be dropped
    val unranked = Seq(
      ("s1", "vcf", "GILGFVFTL", "A*01:01", "v9", "p9"),
      ("s1", "vcf", "MLDLQPETT", null, "v8", "p8"))
      .toDF("SUBMISSION_ID", "SOURCE", "ALT_EPI_SEQ", "HLA_ALLELE",
        "VAR_ID", "PROT_POS")

    val t = RefPipeline.predictionTables(ranked, unranked)

    // cast registry applied: RANK is int now
    assert(t.predictions.schema("RANK").dataType.typeName == "integer")
    // epitope cleanup: "siin-fekl1" → "SIINFEKL" — which COLLIDES with the
    // rank-2 row; rank 1 wins, rank 2 routed to Bad_Predictions
    val preds = t.predictions.orderBy("PREDICTION_ID")
      .select("PREDICTION_ID").collect().map(_.getString(0))
    assert(preds.toSeq == Seq(
      "s1_fastq_KVAELVHFL_B*07:02",
      "s1_fastq_SIINFEKL_A*02:01",
      "s1_vcf_GILGFVFTL_A*01:01")) // null-allele unranked row dropped
    assert(t.badPredictions.count() == 1)
    assert(t.badPredictions.select("RANK").head().getInt(0) == 2)

    // bridge tables: VAR_ID exploded on ':', PROT_POS on ';'
    val pv = t.predictionVariants
      .filter(col("PREDICTION_ID") === "s1_fastq_SIINFEKL_A*02:01")
      .select("VAR_ID").collect().map(_.getString(0)).sorted
    assert(pv.toSeq == Seq("v1", "v2"))
    val pp = t.proteinPositions
      .filter(col("PREDICTION_ID") === "s1_fastq_SIINFEKL_A*02:01")
      .select("PROT_POS").collect().map(_.getString(0)).sorted
    assert(pp.toSeq == Seq("p1", "p2"))
    // null PROT_POS row contributes no position rows
    assert(t.proteinPositions
      .filter(col("PREDICTION_ID") === "s1_fastq_KVAELVHFL_B*07:02")
      .count() == 0)
  }

  test("checkColumns aborts with the missing column names") {
    val df = Seq(("s1", "fastq")).toDF("SUBMISSION_ID", "SOURCE")
    val e = intercept[IllegalArgumentException] {
      RefPipeline.checkColumns(df, Seq("SUBMISSION_ID", "ALT_EPI_SEQ", "VAR_ID"))
    }
    assert(e.getMessage.contains("ALT_EPI_SEQ") && e.getMessage.contains("VAR_ID"))
  }
}
