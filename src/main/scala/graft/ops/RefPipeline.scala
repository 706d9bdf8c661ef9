package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's biggest dataflow — entry point B (SURVEY.md §3.2),
  * /root/reference/upload_data/Submissions/round3/make_round3_prediction_files.R
  * — as one lazy Catalyst plan. A reference user feeds the same ranked /
  * unranked prediction CSV shapes in and gets the same four tables out:
  * Predictions, Bad_Predictions, Prediction_Variants, Protein_Positions.
  */
object RefPipeline {

  /** COL_FUNCS cast registry (ref :29-46): column → target type, applied
    * only to columns that exist (mutate_col_if_exists, ref :192-214).
    */
  val colFuncs: Seq[(String, String)] = Seq(
    "RANK" -> "int", "SCORE" -> "int", "PEP_LEN" -> "int",
    "HLA_ALT_BINDING" -> "double", "HLA_WT_BINDING" -> "double",
    "HLA_ALLELE" -> "string", "ALT_EPI_SEQ" -> "string",
    "REF_EPI_SEQ" -> "string", "VAR_ID" -> "string", "PROT_POS" -> "string",
    "RANK_METRIC" -> "double")

  def convertDfToTypes(df: DataFrame): DataFrame =
    df.select(df.columns.map { c =>
      colFuncs.collectFirst { case (n, t) if n == c => col(c).cast(t).as(c) }
        .getOrElse(col(c))
    }.toSeq: _*)

  /** check_columns (ref :217-223): abort with the missing names. */
  def checkColumns(df: DataFrame, required: Seq[String]): DataFrame = {
    val missing = required.filterNot(df.columns.contains)
    require(missing.isEmpty, s"df has missing columns: ${missing.mkString(", ")}")
    df
  }

  /** format_epitopes (ref :185-189): uppercase, strip non-letters. */
  private def cleanEpitope(c: Column): Column =
    upper(regexp_replace(c, "[^A-Za-z]", ""))

  final case class PredictionTables(
      predictions: DataFrame,
      badPredictions: DataFrame,
      predictionVariants: DataFrame,
      proteinPositions: DataFrame)

  /** Build the four output tables for one submission batch.
    *
    * Input shape (ref REQ_RANKED_COLS/OPT_COLS): SUBMISSION_ID, SOURCE,
    * RANK (null on unranked rows), HLA_ALLELE, ALT_EPI_SEQ,
    * VAR_ID (":"-delimited multi), PROT_POS (";"-delimited multi), plus
    * optional scoring columns.
    */
  def predictionTables(ranked: DataFrame, unranked: DataFrame): PredictionTables = {
    // bind_rows (ref :157-161) — missing columns null-filled
    val unioned = convertDfToTypes(
      ranked.unionByName(unranked, allowMissingColumns = true))
    checkColumns(unioned, Seq("SUBMISSION_ID", "SOURCE", "HLA_ALLELE",
      "ALT_EPI_SEQ", "VAR_ID", "PROT_POS"))

    // null filters + epitope cleanup (ref :160-165, :185-189)
    val cleaned = unioned
      .filter(col("HLA_ALLELE").isNotNull && col("ALT_EPI_SEQ").isNotNull)
      .withColumn("ALT_EPI_SEQ", cleanEpitope(col("ALT_EPI_SEQ")))

    // stable source-row lineage id (ref :144,153): per submission, ordered
    // by a total deterministic key — never monotonically_increasing_id
    val wRow = Window.partitionBy("SUBMISSION_ID")
      .orderBy(col("SOURCE"), col("ALT_EPI_SEQ"), col("HLA_ALLELE"))
    val numbered = cleaned
      .withColumn("SOURCE_ROW_N", row_number().over(wRow).cast("string"))

    // surrogate key (ref :176-181)
    val keyed = numbered.withColumn("PREDICTION_ID",
      concat_ws("_", col("SUBMISSION_ID"), col("SOURCE"),
        col("ALT_EPI_SEQ"), col("HLA_ALLELE")))

    // best-per-key + loser routing (W2, ref :92-103): best RANK wins,
    // losers go to Bad_Predictions
    val wBest = Window.partitionBy("SUBMISSION_ID", "SOURCE", "ALT_EPI_SEQ",
        "HLA_ALLELE")
      .orderBy(col("RANK").asc_nulls_last, col("SOURCE_ROW_N"))
    val rn = keyed.withColumn("_rn", row_number().over(wBest))
    val predictions = rn.filter(col("_rn") === 1).drop("_rn")
    val badPredictions = rn.filter(col("_rn") > 1).drop("_rn")

    // bridge tables: explode delimited multi-value cells (R1, ref :132-138)
    val predictionVariants = predictions
      .select(col("PREDICTION_ID"),
        explode(split(col("VAR_ID"), ":")).as("VAR_ID"))
      .withColumn("VARIANT_ID",
        concat_ws("_", col("PREDICTION_ID"), col("VAR_ID")))
    val proteinPositions = predictions
      .filter(col("PROT_POS").isNotNull)
      .select(col("PREDICTION_ID"),
        explode(split(col("PROT_POS"), ";")).as("PROT_POS"))

    PredictionTables(
      predictions.drop("VAR_ID", "PROT_POS"),
      badPredictions.drop("VAR_ID", "PROT_POS"),
      predictionVariants,
      proteinPositions)
  }
}
