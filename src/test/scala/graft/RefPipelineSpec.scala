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
    // ranked rows: RANK/scores as STRINGS to exercise the cast registry
    // (incl. the round-2 fidelity columns HLA_REF_BINDING, REF_ALLELE_EXP,
    // ALT_ALLELE_EXP, RANK_METRICS, RANK_DESC, ADDN_INFO, STEP_ID,
    // HLA_ALLELE_MUT); epitope with junk chars; duplicate key
    // (s1, fastq, SIINFEKL, A*02:01) at ranks 1 and 2 → conflict routing
    val ranked = Seq(
      ("s1", "fastq", "1", "A*02:01", "siin-fekl1", "v1:v2", "11;12", "9",
        "A*02:01m", "0.5", "0.75", "1.25", "2.5", "netmhc;rank", "asc", "x", "st1"),
      ("s1", "fastq", "2", "A*02:01", "SIINFEKL", "v3", "13", "8",
        null, null, null, null, null, null, null, null, null),
      ("s1", "fastq", "3", "B*07:02", "KVAELVHFL", "v1", null, "7",
        null, null, null, null, null, null, null, null, null))
      .toDF("SUBMISSION_ID", "SOURCE", "RANK", "HLA_ALLELE", "ALT_EPI_SEQ",
        "VAR_ID", "PROT_POS", "PEP_LEN", "HLA_ALLELE_MUT", "HLA_ALT_BINDING",
        "HLA_REF_BINDING", "REF_ALLELE_EXP", "ALT_ALLELE_EXP", "RANK_METRICS",
        "RANK_DESC", "ADDN_INFO", "STEP_ID")
    // unranked rows: no RANK / PEP_LEN columns at all (bind_rows null-fill);
    // one row with null allele must be dropped
    val unranked = Seq(
      ("s1", "vcf", "GILGFVFTL", "A*01:01", "v9", "21"),
      ("s1", "vcf", "MLDLQPETT", null, "v8", "22"))
      .toDF("SUBMISSION_ID", "SOURCE", "ALT_EPI_SEQ", "HLA_ALLELE",
        "VAR_ID", "PROT_POS")

    val t = RefPipeline.predictionTables(ranked, unranked)

    // cast registry applied: the reference's exact COL_FUNCS types
    val types = t.predictions.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(types("RANK") == "integer")
    assert(types("PEP_LEN") == "integer")
    assert(types("HLA_ALT_BINDING") == "double")
    assert(types("HLA_REF_BINDING") == "double")
    assert(types("REF_ALLELE_EXP") == "double")
    assert(types("ALT_ALLELE_EXP") == "double")
    assert(types("RANK_METRICS") == "string") // as.character in the ref, NOT numeric
    assert(types("HLA_ALLELE_MUT") == "string")
    assert(types("RANK_DESC") == "string")
    assert(types("ADDN_INFO") == "string")
    assert(types("STEP_ID") == "string")
    val top = t.predictions
      .filter(col("PREDICTION_ID") === "s1_fastq_SIINFEKL_A*02:01")
      .select("HLA_REF_BINDING", "ALT_ALLELE_EXP", "RANK_METRICS").head()
    assert(top.getDouble(0) == 0.75 && top.getDouble(1) == 2.5 &&
      top.getString(2) == "netmhc;rank")
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
    // PROT_POS is cast to int AFTER the explode (reference order:
    // separate_rows then as.integer)
    assert(t.proteinPositions.schema("PROT_POS").dataType.typeName == "integer")
    val pp = t.proteinPositions
      .filter(col("PREDICTION_ID") === "s1_fastq_SIINFEKL_A*02:01")
      .select("PROT_POS").collect().map(_.getInt(0)).sorted
    assert(pp.toSeq == Seq(11, 12))
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
